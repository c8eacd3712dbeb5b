"""uno_tpu — a TPU-native nonlinearly-constrained NLP solver.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
Uno 2.0.0 solver (reference: /root/reference, see SURVEY.md): smooth nonconvex
NLPs  min f(x)  s.t.  cL <= c(x) <= cU,  xL <= x <= xU, solved by mixable
"ingredients" (constraint relaxation x inequality handling x Hessian model x
regularization x globalization strategy x globalization mechanism), with
presets `ipopt`, `filtersqp`, `byrd`, `funnelsqp`, `filterslp`.

TPU-first design (NOT a port):
  * the entire solver is a pure-functional state machine under `jax.jit`
    (`lax.while_loop` outer iterations, status codes instead of exceptions),
  * the KKT system is dense with static shapes; the symmetric-indefinite
    factorization is an unpivoted blocked LDL^T whose pivot signs expose the
    inertia, stabilized by Uno-style primal-dual inertia correction,
  * the feasibility-restoration phase condenses the l1 elastic variables out
    of the KKT analytically, so both phases share one static matrix shape,
  * batching = `jax.vmap` over instances with per-instance convergence masks;
    scale-out = instance sharding over a `jax.sharding.Mesh`.

Double precision is required for 1e-8 tolerances; importing this package
enables jax_enable_x64 (f32 compute paths are selectable via options.dtype).
"""

import jax

jax.config.update("jax_enable_x64", True)

from uno_tpu.options import Options, preset  # noqa: E402
from uno_tpu.model.nlp import NLP, NLPStructure, nlp_from_functions  # noqa: E402
from uno_tpu.api import solve  # noqa: E402

__version__ = "0.1.0"

__all__ = ["Options", "preset", "NLP", "NLPStructure",
           "nlp_from_functions", "solve", "__version__"]
