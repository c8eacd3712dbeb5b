from uno_tpu.model.nlp import NLP, nlp_from_functions, vector_norm, INF
from uno_tpu.model import transforms, library

__all__ = ["NLP", "nlp_from_functions", "vector_norm", "INF", "transforms", "library"]
