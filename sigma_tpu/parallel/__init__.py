from sigma_tpu.parallel.dist import (
    DistributedMatrix,
    distribute_matrix,
    distribute_vector,
    make_mesh,
    undistribute_vector,
)

__all__ = [
    "DistributedMatrix",
    "distribute_matrix",
    "distribute_vector",
    "undistribute_vector",
    "make_mesh",
]
