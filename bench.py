"""Benchmark: batched IPM solve throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "batched_ipm_solves_per_sec", "value": N, "unit": "solves/s",
   "vs_baseline": R}

Workload: B independent instances of an 8-variable, 2-constraint nonconvex
NLP family (random quadratic objectives, one linear + one quadratic
constraint, variable bounds), solved to the ipopt preset's 1e-8 KKT tolerance
by the fully-jitted vmapped IPM (per-instance convergence masks).

Baseline: MEASURED in-container — the reference Uno 2.0.0 was built from
/root/reference and run through its own driver on the SAME flagship family
(tools/baseline/: hand-coded analytic models + LAPACK dense LDL^T behind the
DirectSymmetricIndefiniteLinearSolver seam, ipopt preset):
  BENCH instances=2000 solved=2000 solves_per_sec=3241 mean_iterations=9.57
vs_baseline = value / 3241.  BASELINE.md's target is >= 50x single-core
throughput.  See tools/baseline/TRACE_DIFF.md for the trace-level parity
evidence (hs015: 17 iterations in both solvers).

The detail section also reports per-iteration KKT latency (assemble-free
factorize+solve ms at n in {32,128,512,1024}) for BASELINE.md row 2.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import uno_tpu  # noqa: F401  (enables x64)
    from uno_tpu.options import preset
    from uno_tpu.solvers.batch import build_batch_ipm
    from __graft_entry__ import _flagship

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    kkt_dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    mode = sys.argv[3] if len(sys.argv) > 3 else "plain"
    # round-2 measured configuration (all verified lossless on this family —
    # identical per-instance iteration counts and 100% solved at 1e-8):
    #   filter_capacity=8: the vectorized Waechter filter RESETS at every mu
    #     change, so live entries stay tiny; capacity 50 (reference default)
    #     pays an O(cap^2) one-hot contraction per iteration (+16% wall)
    #   LS_batch_candidates=1: the 4-candidate vectorized backtracking costs
    #     more in per-iteration bandwidth than the rare extra loop trip saves
    #     (+13% wall) on this family where alpha=1 usually accepts
    opts = preset("ipopt", scale_functions=False, kkt_dtype=kkt_dtype,
                  LS_batch_candidates=1, filter_capacity=8)
    nlp, x0, params = _flagship(B)

    if mode == "bucketed":
        from uno_tpu.solvers.batch import build_bucketed_batch_ipm
        prob, run = build_bucketed_batch_ipm(
            nlp, opts, params_example=jnp.asarray(params[0]),
            segment=6, min_bucket=max(256, B // 16))
    else:
        prob, run = build_batch_ipm(nlp, opts, params_example=jnp.asarray(params[0]))
    x0j, pj = jnp.asarray(x0), jnp.asarray(params)

    # compile (excluded from the measurement)
    t0 = time.time()
    final = jax.block_until_ready(run(x0j, pj))
    compile_and_first = time.time() - t0

    # timed: steady-state throughput over pipelined batches (blocking after
    # every single run would charge the host->remote-chip dispatch latency
    # (~40 ms through the tunnel) to each batch; in production, batches are
    # enqueued back-to-back and XLA overlaps dispatch with compute)
    reps = 5
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            final = run(x0j, pj)
        jax.block_until_ready(final)
        times.append((time.time() - t0) / reps)
    best = min(times)

    # ------------------------------------------------------------------
    # BASELINE.md row 2: KKT factorize+solve ms/iter vs speed-of-light.
    # Barrier-KKT-like SPD-shifted indefinite test matrices (diag spread
    # 1e-6..1e6), single instance (latency, the reference's regime) at the
    # bench kkt_dtype, via the same pick_factorizer path the IPM uses.
    # ------------------------------------------------------------------
    from uno_tpu.ingredients.regularization import pick_factorizer
    from uno_tpu.linalg.ldlt import ldlt_solve

    kkt_stats = {}
    rng = np.random.default_rng(1)
    dt = jnp.float32 if kkt_dtype == "float32" else jnp.float64
    for n in (32, 128, 512, 1024):
        m = n // 4
        dim = n + m
        Q = rng.standard_normal((dim, dim))
        A = (Q + Q.T) / 2
        A[np.diag_indices(dim)] = np.concatenate([
            10.0 ** rng.uniform(-6, 6, n), -(10.0 ** rng.uniform(-6, 0, m))])
        Aj = jnp.asarray(A, dtype=dt)
        rhs = jnp.asarray(rng.standard_normal(dim), dtype=dt)
        fac_fn = pick_factorizer(dim, opts.ldlt_block_size)

        # chain K cycles on-device (solution feeds the next rhs) so the
        # host->chip dispatch latency amortizes away, as it does inside the
        # IPM's fused while_loop
        K = 50 if dim <= 256 else 20

        @jax.jit
        def cycles(Ax, b):
            def body(_, carry):
                bk, acc = carry
                fac = fac_fn(Ax)
                sol = ldlt_solve(fac, bk)
                nrm = jnp.linalg.norm(sol)
                acc = acc + jnp.asarray(fac.num_neg, acc.dtype)
                return sol / jnp.maximum(nrm, 1e-30), acc
            return jax.lax.fori_loop(0, K, body, (b, jnp.zeros((), jnp.int64)))

        jax.block_until_ready(cycles(Aj, rhs))  # compile
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = cycles(Aj, rhs)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / (reps * K) * 1e3
        flops = dim ** 3 / 3 + 2 * dim ** 2
        kkt_stats[f"n{n}"] = {"dim": dim, "ms": round(ms, 3),
                              "gflops": round(flops / (ms * 1e-3) / 1e9, 1)}

    status = np.asarray(final.status)
    solved = int(np.sum((status == 1) | (status == 2)))
    iters = np.asarray(final.iteration)
    throughput = solved / best

    result = {
        "metric": "batched_ipm_solves_per_sec",
        "value": round(throughput, 2),
        "unit": "solves/s",
        # measured single-core reference throughput on this family
        # (tools/baseline/TRACE_DIFF.md): 3241 solves/s
        "vs_baseline": round(throughput / 3241.0, 3),
        "detail": {
            "batch": B,
            "solved": solved,
            "wall_s": round(best, 4),
            "compile_and_first_s": round(compile_and_first, 1),
            "mean_iterations": round(float(iters.mean()), 2),
            "max_iterations": int(iters.max()),
            "tolerance": 1e-8,
            "kkt_dtype": kkt_dtype,
            "mode": mode,
            "device": str(jax.devices()[0]),
            "baseline_solves_per_sec": 3241.0,
            "baseline_provenance": "measured: reference Uno built+run in-container, tools/baseline",
            "kkt_ms_per_iter": kkt_stats,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
