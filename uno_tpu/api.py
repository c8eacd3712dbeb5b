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


def _preflight(nlp: NLP):
    """Initial-iterate screening, the analogue of the reference driver's
    outermost try/catch (Uno.cpp:91-94: any error at the initial iterate ->
    OptimizationStatus::EVALUATION_ERROR) plus trivial-infeasibility
    detection for empty bound boxes (l > u admits no point at all, so no
    restoration phase is needed to certify infeasibility).

    Returns a Result to short-circuit with, or None to proceed."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from uno_tpu.solvers.ipm import Result

    t0 = _time.perf_counter()
    x_lb, x_ub = np.asarray(nlp.x_lb), np.asarray(nlp.x_ub)
    c_lb, c_ub = np.asarray(nlp.c_lb), np.asarray(nlp.c_ub)

    def result(status, x, f, c):
        viol = 0.0
        if nlp.m:
            c = np.asarray(c, dtype=np.float64)
            # non-finite constraint values (evaluation_error path) must not
            # poison the reported violation — measure only the finite rows
            cv = np.where(np.isfinite(c),
                          np.maximum(np.maximum(c_lb - c, c - c_ub), 0.0), 0.0)
            viol = float(np.max(cv, initial=0.0))
        # an empty variable box counts as primal infeasibility too
        viol = max(viol, float(np.max(x_lb - x_ub, initial=0.0)),
                   float(np.max(c_lb - c_ub, initial=0.0)))
        return Result(
            status=status, x=np.asarray(x, dtype=np.float64),
            y=np.zeros(nlp.m), zl=np.zeros(nlp.n), zu=np.zeros(nlp.n),
            objective=float(f), iterations=0,
            primal_feasibility=viol, stationarity=np.inf,
            complementarity=0.0, cpu_time=_time.perf_counter() - t0,
            num_subproblems_solved=0, num_factorizations=0,
            num_objective_evaluations=1, num_constraint_evaluations=1)

    def evaluate(x):
        xj = jnp.asarray(x)
        f = float(nlp.f(xj, nlp.params))
        c = (np.asarray(nlp.c(xj, nlp.params), dtype=np.float64)
             if nlp.m else np.zeros(0))
        return f, c

    # 1. empty feasible box: some l > u (no point can ever satisfy it)
    if (x_lb > x_ub).any() or (c_lb > c_ub).any():
        x = np.clip(nlp.x0, np.minimum(x_lb, x_ub), np.maximum(x_lb, x_ub))
        try:
            f, c = evaluate(x)
        except Exception:  # noqa: BLE001 — still certify the empty box
            f, c = np.nan, np.full(nlp.m, np.nan)
        return result("infeasible_stationary_point", x, f, c)

    # 2. evaluation error at the initial iterate: non-finite f/c both at the
    # bound-projected x0 AND at an IPOPT-style strictly-interior push (the
    # push can rescue domain errors, e.g. log(x) with x0 below a zero lower
    # bound, so failing only the projected point is not conclusive)
    x_proj = np.clip(np.asarray(nlp.x0, dtype=np.float64), x_lb, x_ub)
    try:
        f, c = evaluate(x_proj)
    except Exception:  # noqa: BLE001
        f, c = np.nan, np.full(nlp.m, np.nan)
    if not (np.isfinite(f) and np.all(np.isfinite(c))):
        with np.errstate(invalid="ignore"):
            # per-side push magnitudes (IPOPT's rule): the lower push scales
            # with |x_lb|, the upper push with |x_ub|, each capped by the box
            # width only when that width is finite — so a half-infinite box
            # (x_lb = -inf, finite x_ub) still gets a sane finite upper push
            width = x_ub - x_lb
            pl = 1e-2 * np.maximum(1.0, np.abs(np.where(np.isfinite(x_lb),
                                                        x_lb, 0.0)))
            pu = 1e-2 * np.maximum(1.0, np.abs(np.where(np.isfinite(x_ub),
                                                        x_ub, 0.0)))
            cap = np.where(np.isfinite(width), 1e-2 * np.maximum(width, 0.0),
                           np.inf)
            lo = np.where(np.isfinite(x_lb), x_lb + np.minimum(pl, cap),
                          -np.inf)
            hi = np.where(np.isfinite(x_ub), x_ub - np.minimum(pu, cap),
                          np.inf)
        x_push = np.clip(x_proj, lo, hi)
        try:
            f2, c2 = evaluate(x_push)
        except Exception:  # noqa: BLE001
            f2, c2 = np.nan, np.full(nlp.m, np.nan)
        if not (np.isfinite(f2) and np.all(np.isfinite(c2))):
            return result("evaluation_error", x_proj, f, c)
    return None


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

    early = _preflight(nlp)
    if early is not None:
        return early

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
        res = solve_ipm(nlp, options, callbacks=callbacks, history=history)
        if (res.status == "algorithmic_error"
                and options.kkt_formulation == "auto"
                and nlp.structure is not None):
            # the condensed banded/lifted formulations square the KKT
            # conditioning; under heavy inertia correction (e.g. the
            # catena chain family: delta ~ 1e4 at the flat start) the
            # condensed solve loses enough accuracy to wreck the
            # trajectory while the augmented LDL^T — the formulation the
            # reference's MA57 always factors (MA57Solver.cpp:155-179) —
            # solves cleanly.  'auto' retries the robust formulation on
            # breakdown; an explicit kkt_formulation choice is honored
            # as asked.
            res2 = solve_ipm(nlp, options.replace(kkt_formulation="augmented"),
                             callbacks=callbacks, history=history)
            if res2.success or res2.status != "algorithmic_error":
                return res2
        return res
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
