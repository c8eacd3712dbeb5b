from uno_tpu.solvers import ipm

__all__ = ["ipm"]
