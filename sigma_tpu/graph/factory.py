"""Polymorphic graph construction / conversion by format name.

Mirrors ``/root/reference/src/graph/graph_factory.f90``: ``choose_graph_type``
(:32-56, by name; :61-91, by int 1..num_graph_types) and
``convert_graph_type`` (:96-135 = allocate + copy + destroy).  Here formats
are immutable, so conversion is just re-freezing the edge set.
"""

from __future__ import annotations

from typing import Type, Union

from sigma_tpu.graph.builder import GraphBuilder
from sigma_tpu.graph.graph import (
    BSRGraph,
    COOGraph,
    CSCGraph,
    CSRGraph,
    DIAGraph,
    ELLGraph,
    Graph,
)

__all__ = [
    "GRAPH_FORMATS",
    "num_graph_types",
    "choose_graph_type",
    "convert_graph",
    "build_graph",
]

# Order mirrors the reference's int codes (graph_factory.f90:61-91) with the
# new formats appended: 1=ll/builder-like ⇒ coo here, reference had
# ll/coo/cs/ellpack; we expose coo/csr/csc/ell/bsr.
GRAPH_FORMATS: dict[str, Type[Graph]] = {
    "coo": COOGraph,
    "csr": CSRGraph,
    "csc": CSCGraph,
    "ell": ELLGraph,
    "ellpack": ELLGraph,
    "cs": CSRGraph,
    "bsr": BSRGraph,
    "dia": DIAGraph,
}

# dia is deliberately NAME-ONLY (not in the int-code sweep): DIAGraph is
# a dense-DIAGONAL topology — freezing an arbitrary edge set stores the
# WHOLE band diagonals, so it cannot pattern-round-trip random graphs
# the way the five pattern-exact formats can (verified: adding it to the
# sweep fails every round-trip test by design, not by bug)
num_graph_types = 5  # coo, csr, csc, ell, bsr (test sweeps iterate this)
_BY_INT = ["coo", "csr", "csc", "ell", "bsr"]


def choose_graph_type(frmt: Union[str, int]) -> Type[Graph]:
    if isinstance(frmt, int):
        if not 1 <= frmt <= num_graph_types:
            raise ValueError(f"graph format code {frmt} not in 1..{num_graph_types}")
        frmt = _BY_INT[frmt - 1]
    cls = GRAPH_FORMATS.get(str(frmt).lower())
    if cls is None:
        # list EVERY accepted name, not just the int-code subset —
        # steering users away from valid aliases ('dia' is the
        # flagship format) was a review finding
        raise ValueError(
            f"unknown graph format {frmt!r}; choose from "
            f"{sorted(GRAPH_FORMATS)}"
        )
    return cls


def build_graph(
    source: Union[GraphBuilder, Graph], frmt: Union[str, int] = "csr", **kwargs
) -> Graph:
    """Freeze a builder (or re-freeze a graph) into the named format."""
    cls = choose_graph_type(frmt)
    if isinstance(source, GraphBuilder):
        rows, cols = source.edges()
        return cls.from_coo(source.n, source.m, rows, cols, **kwargs)
    rows, cols = source.edges_numpy()
    return cls.from_coo(source.shape[0], source.shape[1], rows, cols, **kwargs)


def convert_graph(g: Graph, frmt: Union[str, int], **kwargs) -> Graph:
    """Format conversion (``convert_graph_type``, graph_factory.f90:96-135)."""
    return build_graph(g, frmt, **kwargs)
