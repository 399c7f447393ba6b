from sigma_tpu.apps.generators import (
    barabasi_albert,
    erdos_renyi,
    irregular_mesh_laplacian,
    irregular_mesh_laplacian_coo,
    flower_snark,
    hypercube,
    named_graph,
    petersen,
    torus,
    watts_strogatz,
)
from sigma_tpu.apps.ising import ising_metropolis
from sigma_tpu.apps.saw import self_avoiding_walks

__all__ = [
    "torus",
    "petersen",
    "flower_snark",
    "hypercube",
    "erdos_renyi",
    "watts_strogatz",
    "barabasi_albert",
    "irregular_mesh_laplacian",
    "irregular_mesh_laplacian_coo",
    "named_graph",
    "ising_metropolis",
    "self_avoiding_walks",
]
