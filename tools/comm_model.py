#!/usr/bin/env python
"""Communication-volume model for the multi-chip programs (BASELINE.md
multi-host row; round-2 VERDICT 'weak' item 5).

The 2-core container cannot measure multi-chip *efficiency* (8 virtual
devices share fixed host compute), but the COMMUNICATION of the SPMD
programs IS measurable here: this tool compiles the sharded programs on
the virtual mesh and inventories every cross-device collective in the
optimized HLO (op, dtype, shape, bytes).  From the measured per-iteration
collective bytes and the per-device compute FLOPs it derives a model-based
scaling bound for real v5e hardware:

    t_comm(P) = n_collectives * ici_latency + bytes / ici_bandwidth
    t_comp(P) = flops / (P * chip_flops)
    efficiency_bound(P) = t_comp / (t_comp + t_comm)

(LogP-style, no overlap assumed — a lower bound; XLA typically overlaps.)

Usage:  JAX_PLATFORMS=cpu python tools/comm_model.py [--out SCALING.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

# v5e single-chip parameters (public: jax-ml.github.io/scaling-book)
CHIP_FLOPS_F32 = 98e12 / 2        # ~49 TF/s f32 MXU (bf16 ~197/2)
ICI_BW = 45e9                     # ~45 GB/s per direction per link, 1 axis
ICI_LAT = 1e-6                    # ~1 us per collective hop
# measured-effective per-chip rates: tiny-instance batched IPM iterations
# are HBM-bandwidth/dispatch bound far below MXU peak, so the efficiency
# bound must use the MEASURED single-chip iteration time, not peak FLOPs.
# BENCH_r03 (value-fetch differencing): ~7.1 ms per batched outer
# iteration at B=8192..32768 on one v5e chip.
MEASURED_BATCH_ITER_S = 7.1e-3
# sub-128 block operations run at measured-class ~100-200 GF/s, not peak
EFFECTIVE_SMALLBLOCK_FLOPS = 150e9

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def collective_inventory(hlo_text: str):
    """Parse cross-device collectives (op kind, dtype, element count,
    bytes) out of optimized HLO.  Handles scalar- and tuple-typed ops
    (XLA groups simultaneous psums into one tuple all-reduce)."""
    out = []
    line_pat = re.compile(
        r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s*"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)(?:-start)?\(", re.I)
    part_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in line_pat.finditer(hlo_text):
        type_s, op = m.group(1), m.group(2).lower()
        parts = part_pat.findall(type_s)
        nbytes = 0
        shapes = []
        for dtype, shape_s in parts:
            dims = [int(d) for d in shape_s.split(",") if d] if shape_s else []
            elems = int(np.prod(dims)) if dims else 1
            nbytes += elems * _DTYPE_BYTES.get(dtype, 4)
            shapes.append([dtype, dims])
        out.append({"op": op, "parts": shapes, "bytes": nbytes})
    return out


def model_efficiency(t_comp_1chip, collectives, P):
    """t_comp_1chip: measured/effective single-device compute seconds for
    the whole workload (divided by P when sharded)."""
    bytes_total = sum(c["bytes"] for c in collectives)
    t_comm = len(collectives) * ICI_LAT + bytes_total / ICI_BW
    t_comp = t_comp_1chip / P
    return t_comp / (t_comp + t_comm), bytes_total, t_comm, t_comp


def analyze_batch_sharded(B=32768, n=8):
    """One outer iteration of the batch-sharded vmapped IPM."""
    from uno_tpu.options import preset
    from uno_tpu.solvers.batch import build_batch_ipm
    from bench import _flagship_n

    opts = preset("ipopt", scale_functions=False, kkt_dtype="float32",
                  LS_batch_candidates=1, filter_capacity=8)
    nlp, x0, params = _flagship_n(B, n)
    prob, run = build_batch_ipm(nlp, opts,
                                params_example=jnp.asarray(params[0]))
    nd = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("batch",))
    shard2 = NamedSharding(mesh, P("batch", None))
    x0_s = jax.device_put(jnp.asarray(x0), shard2)
    p_s = jax.device_put(jnp.asarray(params), shard2)
    # lower the full solve; the while-loop body repeats per iteration, so
    # collectives found in the HLO are per-iteration (plus one-off setup)
    lowered = jax.jit(run.__wrapped__ if hasattr(run, "__wrapped__") else run
                      ).lower(x0_s, p_s)
    hlo = lowered.compile().as_text()
    coll = collective_inventory(hlo)
    # per-instance per-iteration flops: dim = n+m+... KKT factorize+solve
    dim = prob.n + 2
    flops_instance_iter = dim ** 3 / 3 * 3 + 10 * dim ** 2  # ~3 reg attempts
    flops_iter = flops_instance_iter * B
    return coll, flops_iter


def analyze_schur(S=256, nb=48, n0=16):
    """One distributed Schur factor+solve (the per-IPM-iteration kernel)."""
    from uno_tpu.parallel.schur import (make_sharded_schur_solver,
                                        random_block_arrow_system)
    nd = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("s",))
    solver = make_sharded_schur_solver(mesh, nb, n0, axis="s")
    Ks, Bs, K0 = random_block_arrow_system(S, nb, n0)
    rng = np.random.default_rng(1)
    rhs_s = rng.standard_normal((S, nb))
    rhs0 = rng.standard_normal(n0)
    shard = NamedSharding(mesh, P("s"))
    rep = NamedSharding(mesh, P())
    Ks = jax.device_put(jnp.asarray(Ks), shard)
    Bs = jax.device_put(jnp.asarray(Bs), shard)
    rhs_s = jax.device_put(jnp.asarray(rhs_s), shard)
    K0 = jax.device_put(jnp.asarray(K0), rep)
    rhs0 = jax.device_put(jnp.asarray(rhs0), rep)
    lowered = jax.jit(solver).lower(Ks, Bs, K0, rhs_s, rhs0)
    hlo = lowered.compile().as_text()
    coll = collective_inventory(hlo)
    flops = S * (nb ** 3 / 3 + 2 * nb ** 2 * n0 + nb * n0 ** 2) + n0 ** 3 / 3
    return coll, flops


def _unused():
    pass


def main():
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]
    results = []

    coll, flops = analyze_batch_sharded()
    points = {}
    for Pn in (2, 4, 8, 16):
        eff, nbytes, t_comm, t_comp = model_efficiency(
            MEASURED_BATCH_ITER_S, coll, Pn)
        points[str(Pn)] = round(eff, 4)
    r = {"metric": "batch_sharded_comm_model",
         "collectives_per_iteration": coll,
         "bytes_per_iteration": sum(c["bytes"] for c in coll),
         "flops_per_iteration": flops,
         "measured_1chip_iter_s": MEASURED_BATCH_ITER_S,
         "modeled_efficiency_bound_v5e": points,
         "note": "collectives measured from the optimized sharded HLO on "
                 "the 8-virtual-device mesh; the only cross-device traffic "
                 "per outer iteration is the while-loop convergence "
                 "reduction (a 4-byte all-reduce) — batch sharding is "
                 "embarrassingly parallel; bound is LogP-style (no "
                 "overlap) against the MEASURED per-iteration wall"}
    print(json.dumps(r))
    results.append(r)

    coll, flops = analyze_schur()
    points = {}
    for Pn in (2, 4, 8, 16):
        eff, nbytes, t_comm, t_comp = model_efficiency(
            flops / EFFECTIVE_SMALLBLOCK_FLOPS, coll, Pn)
        points[str(Pn)] = round(eff, 4)
    r = {"metric": "schur_kkt_comm_model",
         "collectives_per_solve": coll,
         "bytes_per_solve": sum(c["bytes"] for c in coll),
         "flops_per_solve": flops,
         "modeled_efficiency_bound_v5e": points,
         "note": "S=256 scenarios, nb=48, n0=16 border; the psum'ed Schur "
                 "complement (n0 x n0) and border rhs dominate the bytes"}
    print(json.dumps(r))
    results.append(r)

    if out_file:
        with open(out_file, "w") as fh:
            for r in results:
                fh.write(json.dumps(r) + "\n")
        print(f"wrote {out_file}")


if __name__ == "__main__":
    main()
