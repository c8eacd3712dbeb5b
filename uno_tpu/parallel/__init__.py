from uno_tpu.parallel.sharding import (make_mesh, build_sharded_batch_ipm,
                                       solve_batch_sharded)
from uno_tpu.parallel.dist_ldlt import make_dist_ldlt, cyclic_permutation

__all__ = ["make_mesh", "build_sharded_batch_ipm", "solve_batch_sharded",
           "make_dist_ldlt", "cyclic_permutation"]
