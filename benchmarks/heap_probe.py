"""Probe: does mallopt(M_MMAP_THRESHOLD, huge) beat the page-fault wall?

This VM (Firecracker, on-demand memory) faults first-touch pages at
~30-160 MB/s, and glibc mmap-allocates every buffer > 32 MiB, so each
fresh large numpy temporary re-faults its pages (CLAUDE.md / BENCHMARKS
"host page-fault wall").  Forcing large allocations onto the brk heap
(which stays faulted-in after free) should make temporaries reusable-warm:

    mallopt(M_MMAP_THRESHOLD, 1<<30)   # never mmap
    mallopt(M_TRIM_THRESHOLD, 1<<30)   # never give the heap back

Run twice: ``python benchmarks/heap_probe.py`` (control) and
``python benchmarks/heap_probe.py --mallopt`` (treatment).
"""
import argparse
import ctypes
import time

import numpy as np

M_TRIM_THRESHOLD = -1
M_TOP_PAD = -2
M_MMAP_THRESHOLD = -3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mallopt", action="store_true")
    ap.add_argument("--elems", type=int, default=7_000_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.mallopt:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        r1 = libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        r2 = libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        print(f"mallopt mmap_threshold={r1} trim_threshold={r2}")

    n = args.elems
    # representative symbolic-phase work: fresh temporaries every op
    for rep in range(args.reps):
        t0 = time.perf_counter()
        a = np.arange(n, dtype=np.int64)
        b = np.repeat(a // 7, 1)  # fresh alloc
        c = np.cumsum(b)
        d = np.concatenate([a, b])
        keys = np.unique(d % (n // 3))
        s = keys[:10].sum() + c[-1]
        dt = time.perf_counter() - t0
        print(f"rep {rep}: {dt:.3f} s (checksum {int(s) % 997})")
        del a, b, c, d, keys


if __name__ == "__main__":
    main()
