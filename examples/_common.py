"""Shared bootstrap for the example scripts: make the in-repo package
importable and prefer CPU + float64 so printed numbers match the
double-precision reference examples."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# didactic scripts: CPU keeps startup instant (no device-tunnel handshake)
# and float64 keeps the printed numbers at reference precision
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
