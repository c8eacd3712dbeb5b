"""Top-level solve API (the reference's Uno::solve equivalent, Uno.cpp:44-98)."""

from __future__ import annotations

from typing import Optional

from uno_tpu.options import Options, preset as _preset
from uno_tpu.model.nlp import NLP


def is_byrd_family(options: Options) -> bool:
    """True iff this config routes to the l1-merit-hardwired fused byrd
    driver (LS + l1 relaxation + l1 merit).  Shared by solve() and
    solve_batch() so both route identically (advisor round-2 finding)."""
    return (options.globalization_mechanism == "LS"
            and options.constraint_relaxation_strategy == "l1_relaxation"
            and options.globalization_strategy == "l1_merit")


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

    if options.auto_permute and nlp.structure is None:
        # RCM structure detection (round-4): probe sparsity, permute for
        # bandwidth, declare NLPStructure so 'auto' KKT routing can take
        # the banded backend; results are mapped back to the original
        # variable order below
        from uno_tpu.model import transforms as _tf
        import numpy as _np
        permuted, perm = _tf.detect_structure(nlp)
        if perm is not None:
            res = solve(permuted, options=options.replace(auto_permute=False),
                        callbacks=callbacks, history=history)
            pos = _np.empty(nlp.n, dtype=_np.int64)
            pos[perm] = _np.arange(nlp.n)
            import dataclasses as _dc
            return _dc.replace(res, x=_np.asarray(res.x)[pos],
                               zl=_np.asarray(res.zl)[pos],
                               zu=_np.asarray(res.zu)[pos])

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
        byrd_family = is_byrd_family(options)
        if driver == "auto":
            # the fused lax.while_loop drivers cover the TR +
            # feasibility-restoration family (filtersqp/funnelsqp/filterslp)
            # and the LS + l1-relaxation steering family (byrd); other
            # mechanism/relaxation mixes run on the host driver
            if (options.globalization_mechanism == "TR"
                    and options.constraint_relaxation_strategy
                    == "feasibility_restoration"):
                driver = "fused"
            elif byrd_family:
                driver = "fused"
            else:
                driver = "host"
        if driver == "fused" and byrd_family:
            from uno_tpu.solvers.sqp_fused import solve_byrd_fused
            return solve_byrd_fused(nlp, options, callbacks=callbacks,
                                    history=history)
        if driver == "fused":
            from uno_tpu.solvers.sqp_fused import solve_sqp_fused
            return solve_sqp_fused(nlp, options, callbacks=callbacks,
                                   history=history)
        from uno_tpu.solvers.sqp import solve_sqp
        return solve_sqp(nlp, options, callbacks=callbacks, history=history)
