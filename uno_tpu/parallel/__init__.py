from uno_tpu.parallel.sharding import (make_mesh, build_sharded_batch_ipm,
                                       solve_batch_sharded)

__all__ = ["make_mesh", "build_sharded_batch_ipm", "solve_batch_sharded"]
