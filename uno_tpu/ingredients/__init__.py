from uno_tpu.ingredients import barrier, filters, regularization

__all__ = ["barrier", "filters", "regularization"]
