from uno_tpu.io.nl import read_nl

__all__ = ["read_nl"]
