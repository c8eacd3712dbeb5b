"""Model reformulations as pure NLP -> NLP transforms.

TPU-native equivalents of the reference's decorator models
(/root/reference/uno/model/ModelFactory.cpp:12-24):
  fixed_bounds_to_constraints  <-  FixedBoundsConstraintsModel.cpp:8-49
  homogenize                   <-  HomogeneousEqualityConstrainedModel.cpp:17-105
  relax_bounds                 <-  BoundRelaxedModel.cpp:16-24
  scale_model                  <-  ScaledModel.cpp:10-35 + preprocessing/Scaling.cpp

Each transform returns a brand-new NLP whose callables close over the original
ones; JAX AD then differentiates through the composition, so no per-transform
derivative plumbing is needed (unlike the reference's virtual-dispatch chain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from uno_tpu.model.nlp import NLP, INF, NLPStructure


def fixed_bounds_to_constraints(nlp: NLP) -> NLP:
    """Move fixed variables (lb == ub) into general equality constraints."""
    fixed = nlp.fixed_variables
    idx = np.nonzero(fixed)[0]
    if idx.size == 0:
        return nlp
    f0, c0, m0 = nlp.f, nlp.c, nlp.m
    idx_j = jnp.asarray(idx)

    def c_new(x, p):
        base = c0(x, p) if m0 > 0 else jnp.zeros((0,), dtype=x.dtype)
        return jnp.concatenate([base, x[idx_j]])

    x_lb = nlp.x_lb.copy()
    x_ub = nlp.x_ub.copy()
    vals = x_lb[idx].copy()
    x_lb[idx] = -INF
    x_ub[idx] = INF
    st = nlp.structure
    if st is not None:
        # new rows x_idx = val touch exactly one column each
        old_starts = st.jac_starts if st.jac_starts is not None \
            else np.zeros(0, dtype=np.int64)
        w = max(st.jac_width, 1)
        starts = np.concatenate([old_starts, idx]).astype(np.int64)
        # n - w can go negative when the declared window is wider than a
        # tiny model; clamp to [0, max(n-w, 0)] so window columns stay in
        # range (the window then simply covers the whole variable vector)
        st = NLPStructure(hess_bandwidth=st.hess_bandwidth,
                          jac_starts=np.clip(starts, 0, max(nlp.n - w, 0)),
                          jac_width=w, jac_col_limit=st.jac_col_limit)
    return NLP(
        name=nlp.name + "->no_fixed_bounds",
        n=nlp.n, m=m0 + idx.size, f=f0, c=c_new,
        x_lb=x_lb, x_ub=x_ub,
        c_lb=np.concatenate([nlp.c_lb, vals]),
        c_ub=np.concatenate([nlp.c_ub, vals]),
        x0=nlp.x0,
        y0=np.concatenate([nlp.y0 if nlp.y0 is not None else np.zeros(m0), np.zeros(idx.size)]),
        params=nlp.params, n_orig=nlp.num_original_variables,
        f_scale=nlp.f_scale, c_scale=None if nlp.c_scale is None else np.concatenate([nlp.c_scale, np.ones(idx.size)]),
        structure=st,
    )


def homogenize(nlp: NLP) -> NLP:
    """Equality-constrained reformulation: every inequality constraint gets a
    slack (c_i(x) - s_i = 0, s_i in [c_lb, c_ub]); equalities are shifted to 0.
    Slacks do not enter the objective, hence not the Hessian."""
    is_eq = nlp.is_equality
    ineq_idx = np.nonzero(~is_eq)[0]
    n_slacks = ineq_idx.size
    n_new = nlp.n + n_slacks
    f0, c0, m = nlp.f, nlp.c, nlp.m

    # rhs shift: equalities move to 0; inequalities use slack
    shift = np.where(is_eq, np.where(np.isfinite(nlp.c_lb), nlp.c_lb, 0.0), 0.0)
    shift_j = jnp.asarray(shift)
    ineq_j = jnp.asarray(ineq_idx, dtype=jnp.int32)

    def f_new(z, p):
        return f0(z[: nlp.n], p)

    def c_new(z, p):
        x, s = z[: nlp.n], z[nlp.n :]
        cx = c0(x, p) - shift_j
        if n_slacks > 0:
            cx = cx.at[ineq_j].add(-s)
        return cx

    slack_lb = nlp.c_lb[ineq_idx]
    slack_ub = nlp.c_ub[ineq_idx]
    slack_of_constraint = np.full(m, -1, dtype=np.int64)
    slack_of_constraint[ineq_idx] = nlp.n + np.arange(n_slacks)

    # initial slack value set later by the interior push (reference
    # PrimalDualInteriorPointMethod.cpp:78-93); start from c(x0) clipped
    x0 = np.concatenate([nlp.x0, np.zeros(n_slacks)])

    st = nlp.structure
    if st is not None:
        st = NLPStructure(hess_bandwidth=st.hess_bandwidth,
                          jac_starts=st.jac_starts, jac_width=st.jac_width,
                          jac_col_limit=nlp.n if st.jac_col_limit is None
                          else st.jac_col_limit)
    return NLP(
        name=nlp.name + "->homogeneous",
        n=n_new, m=m, f=f_new, c=c_new,
        x_lb=np.concatenate([nlp.x_lb, slack_lb]),
        x_ub=np.concatenate([nlp.x_ub, slack_ub]),
        c_lb=np.zeros(m), c_ub=np.zeros(m),
        x0=x0, y0=nlp.y0, params=nlp.params,
        n_orig=nlp.num_original_variables,
        slack_of_constraint=slack_of_constraint,
        f_scale=nlp.f_scale, c_scale=nlp.c_scale,
        structure=st,
    )


def relax_bounds(nlp: NLP, factor: float) -> NLP:
    """Relax finite variable bounds by factor*max(1,|bound|) (IPOPT trick)."""
    lb = np.where(nlp.has_x_lb, nlp.x_lb - factor * np.maximum(1.0, np.abs(nlp.x_lb)), nlp.x_lb)
    ub = np.where(nlp.has_x_ub, nlp.x_ub + factor * np.maximum(1.0, np.abs(nlp.x_ub)), nlp.x_ub)
    return NLP(
        name=nlp.name + "->bounds_relaxed",
        n=nlp.n, m=nlp.m, f=nlp.f, c=nlp.c,
        x_lb=lb, x_ub=ub, c_lb=nlp.c_lb, c_ub=nlp.c_ub,
        x0=nlp.x0, y0=nlp.y0, params=nlp.params, n_orig=nlp.num_original_variables,
        slack_of_constraint=nlp.slack_of_constraint,
        f_scale=nlp.f_scale, c_scale=nlp.c_scale,
        structure=nlp.structure,
    )


def scale_model(nlp: NLP, threshold: float = 100.0) -> NLP:
    """Gradient-based scaling at x0: s_f = min(1, thr/||grad f||inf),
    s_j = min(1, thr/||grad c_j||inf) (reference preprocessing/Scaling.cpp:16-27).
    Scaled bounds on constraints scale accordingly."""
    x0 = jnp.asarray(nlp.x0)
    g = np.asarray(nlp.objective_gradient(x0))
    gnorm = np.max(np.abs(g)) if g.size else 0.0
    s_f = min(1.0, threshold / gnorm) if gnorm > 0 else 1.0
    # scaling floor (round-4, PARITY deviation 11): an extreme initial
    # gradient (||grad f|| ~ 1e11 on vardim/dqrtic/zakharov at n >= 100)
    # would scale the objective by ~1e-9 and let the SCALED KKT test fire
    # orders of magnitude away from the optimum.  The reference snapshot
    # dodges this accidentally: Presets.cpp:61 sets scale_functions=yes but
    # ModelFactory::reformulate never wires ScaledModel in, so its shipped
    # behavior is UNSCALED.  We keep scaling wired (the documented intent)
    # and floor s_f so the test never loosens by more than 4 orders.
    s_f = max(s_f, 1e-4)
    if nlp.m > 0:
        J = np.asarray(nlp.constraint_jacobian(x0))
        jn = np.max(np.abs(J), axis=1)
        s_c = np.where(jn > 0, np.minimum(1.0, threshold / np.maximum(jn, 1e-300)), 1.0)
    else:
        s_c = np.zeros(0)
    f0, c0 = nlp.f, nlp.c
    s_c_j = jnp.asarray(s_c)

    def f_new(x, p):
        return s_f * f0(x, p)

    def c_new(x, p):
        return s_c_j * c0(x, p)

    return NLP(
        name=nlp.name + "->scaled",
        n=nlp.n, m=nlp.m, f=f_new, c=c_new,
        x_lb=nlp.x_lb, x_ub=nlp.x_ub,
        c_lb=s_c * nlp.c_lb, c_ub=s_c * nlp.c_ub,
        x0=nlp.x0, y0=nlp.y0, params=nlp.params, n_orig=nlp.num_original_variables,
        slack_of_constraint=nlp.slack_of_constraint,
        f_scale=s_f * nlp.f_scale,
        c_scale=s_c if nlp.c_scale is None else s_c * nlp.c_scale,
        structure=nlp.structure,
    )


def permute_variables(nlp: NLP, perm) -> NLP:
    """Reorder the variable vector: new_x[i] = old_x[perm[i]].  The TPU
    analogue of the fill-reducing orderings the reference's sparse solvers
    compute internally (MA57/MUMPS symbolic analysis): control families
    declared in block layout [t..., x..., u...] become banded after
    interleaving stages.  Objective values are invariant; `solve` callers
    receive x in the PERMUTED order (apply inverse_permutation to recover),
    so this is meant to be applied at model-construction time."""
    perm = np.asarray(perm, dtype=np.int64)
    assert perm.shape == (nlp.n,)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(nlp.n)
    perm_j = jnp.asarray(perm)
    inv_j = jnp.asarray(inv)
    f0, c0 = nlp.f, nlp.c

    def f_new(x, p):
        return f0(x[inv_j], p)

    def c_new(x, p):
        return c0(x[inv_j], p)

    return NLP(
        name=nlp.name + "->permuted",
        n=nlp.n, m=nlp.m, f=f_new, c=c_new,
        x_lb=nlp.x_lb[perm], x_ub=nlp.x_ub[perm],
        c_lb=nlp.c_lb, c_ub=nlp.c_ub,
        x0=nlp.x0[perm], y0=nlp.y0, params=nlp.params,
        n_orig=nlp.num_original_variables,
        slack_of_constraint=nlp.slack_of_constraint,
        f_scale=nlp.f_scale, c_scale=nlp.c_scale,
        # a band/window declaration is in PRE-permutation coordinates;
        # carrying it over would silently corrupt the banded extraction —
        # callers declare fresh structure for the permuted ordering
        structure=None,
    )


def reformulate_for_interior_point(nlp: NLP, tolerance: float) -> NLP:
    """The reference's IPM chain (ModelFactory.cpp:12-24):
    fixed bounds -> slacks/homogenize -> bound relax."""
    out = fixed_bounds_to_constraints(nlp)
    out = homogenize(out)
    out = relax_bounds(out, tolerance)
    return out


# ---------------------------------------------------------------------------
# automatic structure detection (round-4: RCM-class bandwidth reduction)
# ---------------------------------------------------------------------------

def rcm_order(n, edges_i, edges_j):
    """Reverse Cuthill-McKee ordering of the undirected graph on n nodes.
    Returns perm with new_x[k] = old_x[perm[k]] (the permute_variables
    convention).  The TPU-native stand-in for the fill-reducing orderings
    MA57/MUMPS compute in their symbolic analysis (MA57Solver.cpp:40-90):
    here the target is BANDWIDTH (the banded backend's cost driver), for
    which (R)CM is the classic heuristic."""
    adj = [[] for _ in range(n)]
    for a, b in zip(edges_i, edges_j):
        a, b = int(a), int(b)
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    deg = np.array([len(set(a)) for a in adj])
    adj = [sorted(set(a), key=lambda v: deg[v]) for a in adj]
    visited = np.zeros(n, dtype=bool)
    order = []
    # BFS from the lowest-degree node of each component
    for start in np.argsort(deg, kind="stable"):
        if visited[start]:
            continue
        queue = [int(start)]
        visited[start] = True
        while queue:
            v = queue.pop(0)
            order.append(v)
            for w in adj[v]:
                if not visited[w]:
                    visited[w] = True
                    queue.append(w)
    return np.asarray(order[::-1], dtype=np.int64)


def detect_structure(nlp: NLP, max_n: int = 1536, samples: int = 2,
                     seed: int = 0):
    """Probe the Lagrangian-Hessian / Jacobian sparsity at random points,
    compute an RCM bandwidth-reducing permutation, and — when the permuted
    pattern is genuinely banded/windowed — return
    (permuted NLP with declared NLPStructure, inverse permutation).

    Returns (nlp, None) unchanged when: the model already declares
    structure, n exceeds max_n (dense probing is O(n^2) at build time), the
    pattern stays wide after RCM (bandwidth > n/4), or constraint rows do
    not compress to uniform windows.  Residual uncovered class: IRREGULAR
    coupling — e.g. all-pairs objectives (elec, chandheq) or random
    sparsity with long-range edges — stays on the dense path by design;
    a general fill-minimizing sparse factorization (vs bandwidth
    reduction) is the remaining gap vs MA57's symbolic analysis.

    Sparsity probed at `samples` random points is structural with
    probability 1; coincidental cancellation at every sample point would
    be required for a false zero."""
    if nlp.structure is not None or nlp.n > max_n or nlp.n < 8:
        return nlp, None
    rng = np.random.default_rng(seed)
    x0 = np.asarray(nlp.x0, dtype=np.float64)
    hpat = np.zeros((nlp.n, nlp.n), dtype=bool)
    jpat = np.zeros((nlp.m, nlp.n), dtype=bool) if nlp.m else None
    for _ in range(samples):
        x = jnp.asarray(x0 + 0.37 * rng.standard_normal(nlp.n))
        y = jnp.asarray(rng.standard_normal(nlp.m)) if nlp.m else jnp.zeros(0)
        H = np.asarray(nlp.lagrangian_hessian(x, y, 1.0))
        hpat |= (H != 0.0) & np.isfinite(H)
        if nlp.m:
            J = np.asarray(nlp.constraint_jacobian(x))
            jpat |= (J != 0.0) & np.isfinite(J)
    hpat |= hpat.T
    # graph: Hessian edges + constraint-row cliques (so a row's support
    # lands contiguously after the ordering)
    ei, ej = np.nonzero(np.triu(hpat, 1))
    edges_i = [ei]
    edges_j = [ej]
    if nlp.m:
        for r in range(nlp.m):
            sup = np.nonzero(jpat[r])[0]
            if sup.size > 1:
                edges_i.append(sup[:-1])
                edges_j.append(sup[1:])
                # chain + anchor first-to-last keeps cliques cheap while
                # still pulling the row support together
                edges_i.append(sup[:1])
                edges_j.append(sup[-1:])
    perm = rcm_order(nlp.n, np.concatenate(edges_i), np.concatenate(edges_j))
    pos = np.empty(nlp.n, dtype=np.int64)
    pos[perm] = np.arange(nlp.n)
    if ei.size:
        bandwidth = int(np.max(np.abs(pos[ei] - pos[ej])))
    else:
        bandwidth = 0
    if bandwidth > nlp.n // 4:
        return nlp, None     # stays wide: dense is the right backend
    jac_starts = None
    jac_width = 0
    if nlp.m:
        starts = np.zeros(nlp.m, dtype=np.int64)
        width = 1
        for r in range(nlp.m):
            sup = pos[np.nonzero(jpat[r])[0]]
            if sup.size == 0:
                starts[r] = 0
                continue
            starts[r] = int(sup.min())
            width = max(width, int(sup.max() - sup.min() + 1))
        if width > max(2 * bandwidth + 2, nlp.n // 4):
            return nlp, None  # rows do not window: dense path
        jac_width = width
        jac_starts = np.clip(starts, 0, max(nlp.n - jac_width, 0))
    import dataclasses
    out = permute_variables(nlp, perm)
    out = dataclasses.replace(out, structure=NLPStructure(
        hess_bandwidth=bandwidth, jac_starts=jac_starts,
        jac_width=jac_width, jac_col_limit=None))
    inv = np.empty(nlp.n, dtype=np.int64)
    inv[np.arange(nlp.n)] = perm   # new index k holds old variable perm[k]
    return out, perm
