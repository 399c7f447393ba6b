from sigma_tpu.graph.builder import GraphBuilder
from sigma_tpu.graph.graph import (
    BSRGraph,
    DIAGraph,
    COOGraph,
    CSCGraph,
    CSRGraph,
    ELLGraph,
    Graph,
    compress_coo,
)
from sigma_tpu.graph.factory import (
    GRAPH_FORMATS,
    build_graph,
    choose_graph_type,
    convert_graph,
    num_graph_types,
)
from sigma_tpu.graph.permutations import (
    breadth_first_search,
    greedy_color_ordering,
    greedy_coloring,
    reverse_cuthill_mckee,
)

__all__ = [
    "GraphBuilder",
    "Graph",
    "CSRGraph",
    "DIAGraph",
    "CSCGraph",
    "COOGraph",
    "ELLGraph",
    "BSRGraph",
    "compress_coo",
    "GRAPH_FORMATS",
    "num_graph_types",
    "choose_graph_type",
    "convert_graph",
    "build_graph",
    "breadth_first_search",
    "reverse_cuthill_mckee",
    "greedy_coloring",
    "greedy_color_ordering",
]
