"""Top-level solve API (the reference's Uno::solve equivalent, Uno.cpp:44-98)."""

from __future__ import annotations

from typing import Optional

from uno_tpu.options import Options, preset as _preset
from uno_tpu.model.nlp import NLP


def solve(nlp: NLP, options: Optional[Options] = None, preset: Optional[str] = None,
          callbacks=None, history=False, **overrides):
    """Solve an NLP. Returns a Result.

    Either pass `options`, or a `preset` name ("ipopt", "filtersqp", "byrd",
    "funnelsqp", "filterslp") with optional keyword overrides.
    """
    if options is None:
        options = _preset(preset or "ipopt", **overrides)
    elif overrides:
        options = options.replace(**overrides)

    if options.inequality_handling_method == "primal_dual_interior_point":
        if options.globalization_mechanism == "TR":
            # reference: PrimalDualInteriorPointMethod.cpp:117-119
            raise NotImplementedError(
                "The interior-point subproblem does not support a trust "
                "region; use globalization_mechanism='LS'")
        from uno_tpu.solvers.ipm import solve_ipm
        return solve_ipm(nlp, options, callbacks=callbacks, history=history)
    else:
        from uno_tpu.solvers.sqp import solve_sqp
        return solve_sqp(nlp, options, callbacks=callbacks, history=history)
