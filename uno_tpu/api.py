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
        driver = options.sqp_driver
        if driver == "auto":
            # the fused lax.while_loop driver covers the TR +
            # feasibility-restoration family (filtersqp/funnelsqp/filterslp);
            # LS mechanisms and l1-relaxation steering (byrd) run on the
            # host driver
            driver = ("fused" if options.globalization_mechanism == "TR"
                      and options.constraint_relaxation_strategy
                      == "feasibility_restoration" else "host")
        if driver == "fused":
            from uno_tpu.solvers.sqp_fused import solve_sqp_fused
            return solve_sqp_fused(nlp, options, callbacks=callbacks,
                                   history=history)
        from uno_tpu.solvers.sqp import solve_sqp
        return solve_sqp(nlp, options, callbacks=callbacks, history=history)
