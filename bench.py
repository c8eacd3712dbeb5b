"""Benchmark: batched IPM solve throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "batched_ipm_solves_per_sec", "value": N, "unit": "solves/s",
   "vs_baseline": R}

Workload: B independent instances of an 8-variable, 2-constraint nonconvex
NLP family (random quadratic objectives, one linear + one quadratic
constraint, variable bounds), solved to the ipopt preset's 1e-8 KKT tolerance
by the fully-jitted vmapped IPM (per-instance convergence masks).

Baseline: the reference (Uno @ /root/reference) is single-instance,
single-core; it has no published numeric tables (BASELINE.md), so the
baseline used here is an estimated 1000 solves/s for single-core Uno-ipopt on
problems of this size (sub-ms per solve: ~10 iterations of ASL evals + MA57
on a 10x10 KKT).  vs_baseline = value / 1000.  BASELINE.md's target is
>= 50x single-core throughput.
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    kkt_dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    mode = sys.argv[3] if len(sys.argv) > 3 else "plain"
    opts = preset("ipopt", scale_functions=False, kkt_dtype=kkt_dtype,
                  LS_batch_candidates=4)
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

    status = np.asarray(final.status)
    solved = int(np.sum((status == 1) | (status == 2)))
    iters = np.asarray(final.iteration)
    throughput = solved / best

    result = {
        "metric": "batched_ipm_solves_per_sec",
        "value": round(throughput, 2),
        "unit": "solves/s",
        "vs_baseline": round(throughput / 1000.0, 3),
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
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
