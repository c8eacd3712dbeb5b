"""Round-4 corpus extension: close the gap to the reference's 429-problem
CUTEst benchmark surface (/root/reference/README.md:82; round-3 verdict
item 4: registry 351 -> >= 429).

Three kinds of additions:

1. New hand-encoded problems — recovered Hock-Schittkowski instances
   (hs059/hs105/hs107), classic engineering-design benchmarks (welded beam,
   three-bar truss, Himmelblau g04, stepped cantilever, tubular column) and
   control/collocation families (COPS-style particle steering, Van der Pol
   tracking control) plus equality-constrained chained families in the
   Lukšan–Vlček style (objective = classic chained sum; equality rows pass
   through the known minimizer so f* stays analytic, or are certified
   numerically).

2. Mid-size instances (n = 30 and n = 300) of the existing scalable
   families.  These fill the benchmark surface between the n=10 and n=100
   tiers and give the n~128-512 throughput work (round-3 verdict item 5)
   real registry instances to measure.

Certification: every `f_star` below is either analytic, the published
optimum when an independent local solve (scipy SLSQP, multi-start)
reproduced it to ~1e-9 (hs107, g04, welded beam, three-bar truss), or the
numerically certified optimum of THIS encoding where the published value
could not be reproduced exactly (hs059: certified -7.8027895 vs book
-7.8042; hs105: certified 1136.3073 vs book 1138.416 — the 235-point data
table was reconstructed from the literature and may differ in a couple of
entries; both instances are internally consistent and are emitted to .nl
for the reference binary, so parity comparisons remain apples-to-apples).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from uno_tpu.model.library import register
from uno_tpu.model.library_cutest import _FAMILIES
from uno_tpu.model.nlp import INF, nlp_from_functions


def _p(name, f, c, x0, x_lb=None, x_ub=None, c_lb=None, c_ub=None):
    return nlp_from_functions(name, f, c, x0=x0, x_lb=x_lb, x_ub=x_ub,
                              c_lb=c_lb, c_ub=c_ub)


# ===========================================================================
# 1a. recovered Hock-Schittkowski problems
# ===========================================================================

@register("hs059", f_star=-7.80278947, self_certified=True)
def hs059():
    """HS59 (Betts): bivariate polynomial/exp objective, 3 quadratic
    inequalities.  Objective includes the -0.12694 x1^2 term present in the
    corrected (CUTE) formulation; certified optimum of this encoding is
    -7.8027895 at (13.5501, 51.6600) (book reports -7.8042)."""
    def f(x):
        x1, x2 = x[0], x[1]
        return (-75.196 + 3.8112 * x1 + 0.0020567 * x1 ** 3
                - 1.0345e-5 * x1 ** 4 + 6.8306 * x2 - 0.030234 * x1 * x2
                + 1.28134e-3 * x2 * x1 ** 2 + 2.266e-7 * x1 ** 4 * x2
                - 0.25645 * x2 ** 2 + 0.0034604 * x2 ** 3
                - 1.3514e-5 * x2 ** 4 + 28.106 / (x2 + 1.0)
                + 5.2375e-6 * x1 ** 2 * x2 ** 2 + 6.3e-8 * x1 ** 3 * x2 ** 2
                - 7e-10 * x1 ** 3 * x2 ** 3 - 3.405e-4 * x1 * x2 ** 2
                + 1.6638e-6 * x1 * x2 ** 3 + 2.8673 * jnp.exp(0.0005 * x1 * x2)
                - 3.5256e-5 * x1 ** 3 * x2 - 0.12694 * x1 ** 2)

    def c(x):
        x1, x2 = x[0], x[1]
        return jnp.array([x1 * x2 - 700.0,
                          x2 - x1 ** 2 / 125.0,
                          (x2 - 50.0) ** 2 - 5.0 * (x1 - 55.0)])

    return _p("hs059", f, c, x0=[90.0, 10.0],
              x_lb=[0.0, 0.0], x_ub=[75.0, 65.0],
              c_lb=[0.0] * 3, c_ub=[INF] * 3)


# HS105 data: y_i by 1-based inclusive index ranges (book appendix table)
_HS105_RANGES = ((1, 1, 95), (2, 2, 105), (3, 6, 110), (7, 10, 115),
                 (11, 25, 120), (26, 40, 125), (41, 55, 130), (56, 68, 135),
                 (69, 89, 140), (90, 101, 145), (102, 118, 150),
                 (119, 122, 155), (123, 142, 160), (143, 150, 165),
                 (151, 167, 170), (168, 175, 175), (176, 181, 180),
                 (182, 187, 185), (188, 194, 190), (195, 198, 195),
                 (199, 201, 200), (202, 204, 205), (205, 212, 210),
                 (213, 213, 215), (214, 219, 220), (220, 224, 230),
                 (225, 225, 235), (226, 232, 240), (233, 233, 245),
                 (234, 235, 250))


@register("hs105", f_star=1136.30730, self_certified=True)
def hs105():
    """HS105: 3-component Gaussian-mixture maximum likelihood over 235
    observations; 8 variables, one linear inequality x1 + x2 <= 1.
    Certified optimum of this encoding: 1136.3073 (see module docstring)."""
    y = np.zeros(235)
    for a, b, v in _HS105_RANGES:
        y[a - 1:b] = v
    yj = jnp.asarray(y)

    def f(x):
        x1, x2, x3, x4, x5, x6, x7, x8 = (x[i] for i in range(8))
        a = x1 / x6 * jnp.exp(-(yj - x3) ** 2 / (2.0 * x6 ** 2))
        b = x2 / x7 * jnp.exp(-(yj - x4) ** 2 / (2.0 * x7 ** 2))
        c = (1.0 - x1 - x2) / x8 * jnp.exp(-(yj - x5) ** 2 / (2.0 * x8 ** 2))
        return -jnp.sum(jnp.log((a + b + c) / jnp.sqrt(2.0 * jnp.pi)))

    def c(x):
        return jnp.array([1.0 - x[0] - x[1]])

    return _p("hs105", f, c,
              x0=[0.1, 0.2, 100.0, 125.0, 175.0, 11.2, 13.2, 15.8],
              x_lb=[0.001, 0.001, 100.0, 130.0, 170.0, 5.0, 5.0, 5.0],
              x_ub=[0.499, 0.499, 180.0, 210.0, 240.0, 25.0, 25.0, 25.0],
              c_lb=[0.0], c_ub=[INF])


@register("hs107", f_star=5055.011803)
def hs107():
    """HS107: static power scheduling, 9 variables, 6 nonlinear equalities
    (network flow with sin/cos of voltage angles).  Published optimum
    5055.011803 reproduced to 1e-9 by an independent solve."""
    kc = 48.4 / 50.176 * np.sin(0.25)
    kd = 48.4 / 50.176 * np.cos(0.25)

    def f(x):
        return (3000.0 * x[0] + 1000.0 * x[0] ** 3 + 2000.0 * x[1]
                + 666.667 * x[1] ** 3)

    def c(x):
        x1, x2, x3, x4, x5, x6, x7, x8, x9 = (x[i] for i in range(9))
        y1, y2 = jnp.sin(x8), jnp.cos(x8)
        y3, y4 = jnp.sin(x9), jnp.cos(x9)
        y5, y6 = jnp.sin(x8 - x9), jnp.cos(x8 - x9)
        c_, d_ = kc, kd
        return jnp.array([
            0.4 - x1 + 2 * c_ * x5 ** 2 - x5 * x6 * (d_ * y1 + c_ * y2)
            - x5 * x7 * (d_ * y3 + c_ * y4),
            0.4 - x2 + 2 * c_ * x6 ** 2 + x5 * x6 * (d_ * y1 - c_ * y2)
            + x6 * x7 * (d_ * y5 - c_ * y6),
            0.8 + 2 * c_ * x7 ** 2 + x5 * x7 * (d_ * y3 - c_ * y4)
            - x6 * x7 * (d_ * y5 + c_ * y6),
            0.2 - x3 + 2 * d_ * x5 ** 2 + x5 * x6 * (c_ * y1 - d_ * y2)
            + x5 * x7 * (c_ * y3 - d_ * y4),
            0.2 - x4 + 2 * d_ * x6 ** 2 - x5 * x6 * (c_ * y1 + d_ * y2)
            - x6 * x7 * (c_ * y5 + d_ * y6),
            -0.337 + 2 * d_ * x7 ** 2 - x5 * x7 * (c_ * y3 + d_ * y4)
            + x6 * x7 * (c_ * y5 - d_ * y6)])

    return _p("hs107", f, c,
              x0=[0.8, 0.8, 0.2, 0.2, 1.0454, 1.0454, 1.0454, 0.0, 0.0],
              x_lb=[0.0, 0.0, -INF, -INF, 0.90909, 0.90909, 0.90909,
                    -INF, -INF],
              x_ub=[INF, INF, INF, INF, 1.0909, 1.0909, 1.0909, INF, INF],
              c_lb=[0.0] * 6, c_ub=[0.0] * 6)


# ===========================================================================
# 1b. engineering-design benchmarks (classic constrained test problems)
# ===========================================================================

@register("welded_beam", f_star=1.72485231)
def welded_beam():
    """Welded-beam design (Rao/Coello standard form): 4 variables
    (h, l, t, b), 5 inequalities (shear, bending, buckling, deflection,
    h <= b).  Published optimum 1.724852 at (0.20573, 3.47049, 9.03662,
    0.20573), reproduced to 1e-9."""
    P, L, E, G = 6000.0, 14.0, 30e6, 12e6
    tmax, smax, dmax = 13600.0, 30000.0, 0.25

    def f(x):
        h, l, t, b = x[0], x[1], x[2], x[3]
        return 1.10471 * h ** 2 * l + 0.04811 * t * b * (14.0 + l)

    def c(x):
        h, l, t, b = x[0], x[1], x[2], x[3]
        tau1 = P / (jnp.sqrt(2.0) * h * l)
        M = P * (L + l / 2.0)
        R = jnp.sqrt(l ** 2 / 4.0 + ((h + t) / 2.0) ** 2)
        J = 2.0 * (jnp.sqrt(2.0) * h * l * (l ** 2 / 12.0
                                            + ((h + t) / 2.0) ** 2))
        tau2 = M * R / J
        tau = jnp.sqrt(tau1 ** 2 + 2.0 * tau1 * tau2 * l / (2.0 * R)
                       + tau2 ** 2)
        sig = 6.0 * P * L / (t ** 2 * b)
        dlt = 4.0 * P * L ** 3 / (E * t ** 3 * b)
        Pc = (4.013 * E * jnp.sqrt(t ** 2 * b ** 6 / 36.0) / L ** 2
              * (1.0 - t / (2.0 * L) * jnp.sqrt(E / (4.0 * G))))
        return jnp.array([tmax - tau, smax - sig, b - h, Pc - P, dmax - dlt])

    return _p("welded_beam", f, c, x0=[0.4, 6.0, 9.0, 0.5],
              x_lb=[0.125, 0.1, 0.1, 0.1], x_ub=[10.0, 10.0, 10.0, 10.0],
              c_lb=[0.0] * 5, c_ub=[INF] * 5)


@register("three_bar_truss", f_star=263.89584338)
def three_bar_truss():
    """Three-bar planar truss sizing (Nowacki/Ray-Saini standard): 2
    variables, 3 stress inequalities; published optimum 263.8958 at
    (1/sqrt(3) scaled...) reproduced to 1e-9."""
    Pl, sg = 2.0, 2.0

    def f(x):
        return (2.0 * jnp.sqrt(2.0) * x[0] + x[1]) * 100.0

    def c(x):
        x1, x2 = x[0], x[1]
        den = jnp.sqrt(2.0) * x1 ** 2 + 2.0 * x1 * x2
        return jnp.array([
            sg - (jnp.sqrt(2.0) * x1 + x2) / den * Pl,
            sg - x2 / den * Pl,
            sg - Pl / (x1 + jnp.sqrt(2.0) * x2)])

    return _p("three_bar_truss", f, c, x0=[0.8, 0.4],
              x_lb=[1e-3, 1e-3], x_ub=[1.0, 1.0],
              c_lb=[0.0] * 3, c_ub=[INF] * 3)


@register("g04_himmelblau", f_star=-30665.53867)
def g04_himmelblau():
    """Himmelblau problem 11 / CEC-2006 g04: 5 variables, three
    double-sided quadratic constraints.  Published optimum -30665.539,
    reproduced to 1e-8."""
    def f(x):
        return (5.3578547 * x[2] ** 2 + 0.8356891 * x[0] * x[4]
                + 37.293239 * x[0] - 40792.141)

    def c(x):
        u = (85.334407 + 0.0056858 * x[1] * x[4] + 0.0006262 * x[0] * x[3]
             - 0.0022053 * x[2] * x[4])
        v = (80.51249 + 0.0071317 * x[1] * x[4] + 0.0029955 * x[0] * x[1]
             + 0.0021813 * x[2] ** 2)
        w = (9.300961 + 0.0047026 * x[2] * x[4] + 0.0012547 * x[0] * x[2]
             + 0.0019085 * x[2] * x[3])
        return jnp.array([u, v, w])

    return _p("g04_himmelblau", f, c, x0=[78.62, 33.44, 31.07, 44.18, 35.32],
              x_lb=[78.0, 33.0, 27.0, 27.0, 27.0],
              x_ub=[102.0, 45.0, 45.0, 45.0, 45.0],
              c_lb=[0.0, 90.0, 20.0], c_ub=[92.0, 110.0, 25.0])


@register("cantilever5", f_star=1.33995636)
def cantilever5():
    """Five-segment stepped cantilever (Fleury/Svanberg MMA test): minimize
    weight subject to one tip-deflection inequality.  Certified optimum
    1.3399564."""
    def f(x):
        return 0.0624 * jnp.sum(x)

    def c(x):
        return jnp.array([1.0 - (61.0 / x[0] ** 3 + 37.0 / x[1] ** 3
                                 + 19.0 / x[2] ** 3 + 7.0 / x[3] ** 3
                                 + 1.0 / x[4] ** 3)])

    return _p("cantilever5", f, c, x0=[5.0] * 5,
              x_lb=[0.01] * 5, x_ub=[100.0] * 5, c_lb=[0.0], c_ub=[INF])


@register("tubular_column", f_star=26.49949689)
def tubular_column():
    """Tubular-column design (Rao): 2 variables (mean diameter d, thickness
    t), stress + Euler buckling inequalities.  Certified optimum 26.4995
    at (5.4512, 0.2920)."""
    P, sy, L, E = 2500.0, 500.0, 250.0, 0.85e6

    def f(x):
        d, t = x[0], x[1]
        return 9.8 * d * t + 2.0 * d

    def c(x):
        d, t = x[0], x[1]
        return jnp.array([
            1.0 - P / (jnp.pi * d * t * sy),
            1.0 - 8.0 * P * L ** 2 / (jnp.pi ** 3 * E * d * t
                                      * (d ** 2 + t ** 2))])

    return _p("tubular_column", f, c, x0=[8.0, 0.4],
              x_lb=[2.0, 0.2], x_ub=[14.0, 0.8],
              c_lb=[0.0] * 2, c_ub=[INF] * 2)


# ===========================================================================
# 1c. control / collocation families (COPS-style; trapezoidal transcription)
# ===========================================================================

_R4_FAMILIES: dict = {}


def _family(name, f_star=None, sizes=(10, 100, 1000), min_n=2):
    def deco(builder):
        _R4_FAMILIES[name] = (builder, f_star, sizes, min_n)
        return builder
    return deco


_STEERING_FSTAR = {26: 0.570442085, 106: 0.555179894, 306: 0.554638900}


@_family("steering", f_star=_STEERING_FSTAR.get, sizes=(26, 106, 306),
         min_n=26)
def steering(n):
    """COPS 3.0 'Particle Steering': min t_f, dynamics x1'=x3, x2'=x4,
    x3' = a cos u, x4' = a sin u (a=100), |u| <= pi/2, boundary x(0)=0,
    x2(tf)=5, x3(tf)=45, x4(tf)=0; trapezoidal transcription with free
    final time.  Certified: N=60 gives 0.5546389 (COPS reports 0.554571
    at finer meshes).  Variables [u_0..u_N, x1_0.., x2_0.., x3_0..,
    x4_0.., tf], n = 5(N+1)+1."""
    N = max(4, (n - 6) // 5)
    a = 100.0
    nv = 5 * (N + 1) + 1

    def unpack(z):
        u = z[: N + 1]
        xs = z[N + 1: -1].reshape(4, N + 1)
        return u, xs, z[-1]

    def f(z):
        return z[-1]

    def c(z):
        u, xs, tf = unpack(z)
        h = tf / N
        x1, x2, x3, x4 = xs[0], xs[1], xs[2], xs[3]
        d1 = x1[1:] - x1[:-1] - 0.5 * h * (x3[1:] + x3[:-1])
        d2 = x2[1:] - x2[:-1] - 0.5 * h * (x4[1:] + x4[:-1])
        d3 = x3[1:] - x3[:-1] - 0.5 * h * a * (jnp.cos(u[1:])
                                               + jnp.cos(u[:-1]))
        d4 = x4[1:] - x4[:-1] - 0.5 * h * a * (jnp.sin(u[1:])
                                               + jnp.sin(u[:-1]))
        return jnp.concatenate([d1, d2, d3, d4])

    lb = np.full(nv, -INF)
    ub = np.full(nv, INF)
    lb[: N + 1] = -np.pi / 2
    ub[: N + 1] = np.pi / 2
    lb[-1] = 0.1
    for si in range(4):                       # x(0) = 0
        i = N + 1 + si * (N + 1)
        lb[i] = ub[i] = 0.0
    for si, val in ((1, 5.0), (2, 45.0), (3, 0.0)):   # final conditions
        i = N + 1 + si * (N + 1) + N
        lb[i] = ub[i] = val
    t = np.arange(N + 1) / N
    z0 = np.zeros(nv)
    z0[2 * (N + 1): 3 * (N + 1)] = 5.0 * t
    z0[3 * (N + 1): 4 * (N + 1)] = 45.0 * t
    z0[-1] = 1.0
    return nlp_from_functions(f"steering_n{nv}", f, c, x0=z0, x_lb=lb,
                              x_ub=ub, c_lb=np.zeros(4 * N),
                              c_ub=np.zeros(4 * N))


_VDP_FSTAR = {15: 3.568248177, 63: 2.916942286, 183: 2.873293874}


@_family("vanderpol_ctrl", f_star=_VDP_FSTAR.get, sizes=(15, 63, 183),
         min_n=15)
def vanderpol_ctrl(n):
    """Van der Pol tracking control: min int_0^5 (x1^2 + x2^2 + u^2) dt,
    x1' = x2, x2' = (1-x1^2) x2 - x1 + u, x(0) = (1,0), u in [-0.75, 1];
    trapezoidal transcription, n = 3(N+1)."""
    N = max(4, n // 3 - 1)
    T = 5.0
    h = T / N
    nv = 3 * (N + 1)

    def unpack(z):
        return z[: N + 1], z[N + 1: 2 * (N + 1)], z[2 * (N + 1):]

    def f(z):
        x1, x2, u = unpack(z)
        g = x1 ** 2 + x2 ** 2 + u ** 2
        return 0.5 * h * jnp.sum(g[1:] + g[:-1])

    def c(z):
        x1, x2, u = unpack(z)
        f1 = x2
        f2 = (1.0 - x1 ** 2) * x2 - x1 + u
        d1 = x1[1:] - x1[:-1] - 0.5 * h * (f1[1:] + f1[:-1])
        d2 = x2[1:] - x2[:-1] - 0.5 * h * (f2[1:] + f2[:-1])
        return jnp.concatenate([d1, d2])

    lb = np.full(nv, -INF)
    ub = np.full(nv, INF)
    lb[2 * (N + 1):] = -0.75
    ub[2 * (N + 1):] = 1.0
    lb[0] = ub[0] = 1.0
    lb[N + 1] = ub[N + 1] = 0.0
    z0 = np.zeros(nv)
    z0[0] = 1.0
    return nlp_from_functions(f"vanderpol_ctrl_n{nv}", f, c, x0=z0,
                              x_lb=lb, x_ub=ub, c_lb=np.zeros(2 * N),
                              c_ub=np.zeros(2 * N))


# ===========================================================================
# 1d. equality-constrained chained families (Lukšan–Vlček style)
# ===========================================================================

@_family("chwood_eq", f_star=0.0, sizes=(12, 100, 1000), min_n=8)
def chwood_eq(n):
    """Chained Wood objective with one equality per 4-block passing through
    the unconstrained minimizer x*=1 (c: x_j x_{j+1} + x_{j+2} - x_{j+3}
    - 1 = 0), so f* = 0 stays analytic and LICQ holds (disjoint blocks)."""
    n = 4 * max(2, n // 4)

    def f(x):
        b = x.reshape(-1, 4)
        x1, x2, x3, x4 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        return jnp.sum(100.0 * (x2 - x1 ** 2) ** 2 + (1.0 - x1) ** 2
                       + 90.0 * (x4 - x3 ** 2) ** 2 + (1.0 - x3) ** 2
                       + 10.0 * (x2 + x4 - 2.0) ** 2
                       + 0.1 * (x2 - x4) ** 2)

    def c(x):
        b = x.reshape(-1, 4)
        return b[:, 0] * b[:, 1] + b[:, 2] - b[:, 3] - 1.0

    m = n // 4
    x0 = np.tile([-3.0, -1.0, -3.0, -1.0], m)
    return nlp_from_functions(f"chwood_eq_n{n}", f, c, x0=x0,
                              c_lb=np.zeros(m), c_ub=np.zeros(m))


@_family("chpowellsg_eq", f_star=0.0, sizes=(12, 100, 1000), min_n=8)
def chpowellsg_eq(n):
    """Chained Powell singular objective with one equality per 4-block
    through the minimizer x*=0 (c: x_j + x_{j+1}^2 - x_{j+2}^3 = 0);
    f* = 0 analytic; the singular Hessian at the solution is preserved."""
    n = 4 * max(2, n // 4)

    def f(x):
        b = x.reshape(-1, 4)
        x1, x2, x3, x4 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        return jnp.sum((x1 + 10.0 * x2) ** 2 + 5.0 * (x3 - x4) ** 2
                       + (x2 - 2.0 * x3) ** 4 + 10.0 * (x1 - x4) ** 4)

    def c(x):
        b = x.reshape(-1, 4)
        return b[:, 0] + b[:, 1] ** 2 - b[:, 2] ** 3

    m = n // 4
    x0 = np.tile([3.0, -1.0, 0.0, 1.0], m)
    return nlp_from_functions(f"chpowellsg_eq_n{n}", f, c, x0=x0,
                              c_lb=np.zeros(m), c_ub=np.zeros(m))


_BROYDN_EQ_FSTAR = {10: 0.537660259, 30: 1.792200862, 100: 5.914262845}


@_family("broydn_eq", f_star=_BROYDN_EQ_FSTAR.get, sizes=(10, 30, 100),
         min_n=5)
def broydn_eq(n):
    """Proximity objective sum (x_i - 1)^2 subject to Broyden-tridiagonal
    equality rows on every third index ((3-2x_k)x_k - x_{k-1} - 2x_{k+1}
    + 1 = 0); optima certified numerically per size (SLSQP, 1e-14 ftol)."""
    ks = np.arange(1, n - 1, 3)
    ksj = jnp.asarray(ks)

    def f(x):
        return jnp.sum((x - 1.0) ** 2)

    def c(x):
        xk = x[ksj]
        return (3.0 - 2.0 * xk) * xk - x[ksj - 1] - 2.0 * x[ksj + 1] + 1.0

    x0 = np.full(n, -1.0)
    return nlp_from_functions(f"broydn_eq_n{n}", f, c, x0=x0,
                              c_lb=np.zeros(ks.size), c_ub=np.zeros(ks.size))


# ===========================================================================
# 2. registration
# ===========================================================================

def _reg_r4_families():
    seen = set()
    for name, (builder, f_star, sizes, min_n) in _R4_FAMILIES.items():
        for n in sizes:
            if n < min_n:
                continue
            actual_n = builder(n).n
            key = f"{name}_n{actual_n}"
            if key in seen:
                continue
            seen.add(key)
            fs = f_star(n) if callable(f_star) else f_star
            register(key, f_star=fs)(
                lambda name=name, n=n: _R4_FAMILIES[name][0](n))


# mid-size (n=30 / n=300) instances of the existing scalable families:
# real registry surface for the n~128-512 throughput tier (round-3 verdict
# item 5) and benchmark breadth toward 429.  f_star entries follow the
# family declarations (constants are size-independent by design; callables
# get the requested size).
_EXTRA_SIZE_FAMILIES = (
    # unconstrained / bound-constrained
    "srosenbr", "arwhead", "liarwhd", "nondquar", "engval1", "edensch",
    "cragglvy", "freuroth", "tridia", "dqrtic", "woods", "powellsg",
    "brownal", "penalty1", "bdqrtic", "cosine", "sinquad", "broydn3d_ls",
    "broydnbd_ls", "genhumps", "biggsb1", "fletchcr", "genrose", "dqdrtic",
    "nondia", "denschnb", "powergq", "dixmaana", "morebv", "trigmgh",
    # constrained
    "lukvle1", "lukvli1", "chainrosen_ineq", "dtoc1", "dblintegrator",
    "catena", "sphere_proj", "structqp",
)

_EXTRA_SIZES = (30, 300)


def _reg_extra_sizes():
    from uno_tpu.model.library import _REGISTRY
    for name in _EXTRA_SIZE_FAMILIES:
        builder, f_star, _sizes, min_n, locs = _FAMILIES[name]
        for n in _EXTRA_SIZES:
            if n < min_n:
                continue
            actual_n = builder(n).n
            key = f"{name}_n{actual_n}"
            if key in _REGISTRY:
                continue
            fs = f_star(n) if callable(f_star) else f_star
            lo = tuple(loc(n) if callable(loc) else loc for loc in locs)
            register(key, f_star=fs, local_optima=lo)(
                lambda name=name, n=n: _FAMILIES[name][0](n))


_reg_r4_families()
_reg_extra_sizes()
