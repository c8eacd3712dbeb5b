"""Built-in test problems.

hs015 / polak5 mirror the reference's example fixtures
(/root/reference/examples/hs015.mod, polak5.mod); the rest are classic
Hock-Schittkowski problems used as an end-to-end correctness suite (the
reference relies on MINLPTests/CUTEst externally, SURVEY.md §4).

Known optimal objective values are from the Hock-Schittkowski collection.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from uno_tpu.model.nlp import NLP, nlp_from_functions, INF

_REGISTRY: dict = {}


def register(name, f_star=None, local_optima=(), self_certified=False):
    """self_certified=True marks an f_star that is the numerically certified
    optimum of THIS encoding rather than the published book value (e.g. a
    reconstructed data table differs slightly) — solved counts quoted "at
    reference CI tolerance" must not be read as matched against book optima
    for these rows (round-4 verdict, weak item 5)."""
    def deco(builder):
        _REGISTRY[name] = (builder, f_star, tuple(local_optima),
                           bool(self_certified))
        return builder
    return deco


def get_problem(name: str) -> NLP:
    return _REGISTRY[name][0]()


def known_optimum(name: str):
    return _REGISTRY[name][1]


def acceptable_optima(name: str):
    """Global optimum plus known alternate local optima (nonconvex problems
    may legitimately converge to any first-order point)."""
    _, f_star, locals_ = _REGISTRY[name][:3]
    out = [] if f_star is None else [f_star]
    return out + list(locals_)


def is_self_certified(name: str) -> bool:
    """True when f_star is certified against this repo's own encoding rather
    than the published literature value (see register())."""
    entry = _REGISTRY[name]
    return bool(entry[3]) if len(entry) > 3 else False


def problem_names():
    return sorted(_REGISTRY)


@register("hs015", f_star=306.5)
def hs015():
    # min 100(x2-x1^2)^2 + (1-x1)^2
    # s.t. x1*x2 >= 1; x1 + x2^2 >= 0; x1 <= 1/2  (examples/hs015.mod)
    def f(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def c(x):
        return jnp.array([x[0] * x[1], x[0] + x[1] ** 2])

    return nlp_from_functions(
        "hs015", f, c,
        x0=[-2.0, 1.0],
        x_lb=[-INF, -INF], x_ub=[0.5, INF],
        c_lb=[1.0, 0.0], c_ub=[INF, INF],
    )


@register("polak5", f_star=50.0)
def polak5():
    # min u  s.t. -u+3x1^2+50(x1-x2^4-1)^2 <= 0 ; -u+3x1^2+50(x1-x2^4+1)^2 <= 0
    # variables (x1, x2, u), start (0.1, 0.1, 0)  (examples/polak5.mod)
    def f(x):
        return x[2]

    def c(x):
        t = 3.0 * x[0] ** 2
        return jnp.array([
            -x[2] + t + 50.0 * (x[0] - x[1] ** 4 - 1.0) ** 2,
            -x[2] + t + 50.0 * (x[0] - x[1] ** 4 + 1.0) ** 2,
        ])

    return nlp_from_functions(
        "polak5", f, c,
        x0=[0.1, 0.1, 0.0],
        c_lb=[-INF, -INF], c_ub=[0.0, 0.0],
    )


@register("hs001", f_star=0.0)
def hs001():
    def f(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    return nlp_from_functions("hs001", f, None, x0=[-2.0, 1.0],
                              x_lb=[-INF, -1.5], x_ub=[INF, INF])


@register("hs006", f_star=0.0)
def hs006():
    def f(x):
        return (1.0 - x[0]) ** 2

    def c(x):
        return jnp.array([10.0 * (x[1] - x[0] ** 2)])

    return nlp_from_functions("hs006", f, c, x0=[-1.2, 1.0],
                              c_lb=[0.0], c_ub=[0.0])


@register("hs007", f_star=-np.sqrt(3.0))
def hs007():
    def f(x):
        return jnp.log(1.0 + x[0] ** 2) - x[1]

    def c(x):
        return jnp.array([(1.0 + x[0] ** 2) ** 2 + x[1] ** 2])

    return nlp_from_functions("hs007", f, c, x0=[2.0, 2.0],
                              c_lb=[4.0], c_ub=[4.0])


@register("hs010", f_star=-1.0)
def hs010():
    def f(x):
        return x[0] - x[1]

    def c(x):
        return jnp.array([-3.0 * x[0] ** 2 + 2.0 * x[0] * x[1] - x[1] ** 2 + 1.0])

    return nlp_from_functions("hs010", f, c, x0=[-10.0, 10.0],
                              c_lb=[0.0], c_ub=[INF])


@register("hs014", f_star=9.0 - 2.875 * np.sqrt(7.0))
def hs014():
    def f(x):
        return (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2

    def c(x):
        return jnp.array([
            x[0] - 2.0 * x[1],                       # == -1
            -0.25 * x[0] ** 2 - x[1] ** 2 + 1.0,     # >= 0
        ])

    return nlp_from_functions("hs014", f, c, x0=[2.0, 2.0],
                              c_lb=[-1.0, 0.0], c_ub=[-1.0, INF])


@register("hs016", f_star=0.25, local_optima=(3.9820604541,))
def hs016():
    def f(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def c(x):
        return jnp.array([x[0] + x[1] ** 2, x[0] ** 2 + x[1]])

    return nlp_from_functions(
        "hs016", f, c, x0=[-2.0, 1.0],
        x_lb=[-2.0, -INF], x_ub=[0.5, 1.0],
        c_lb=[0.0, 0.0], c_ub=[INF, INF],
    )


@register("hs021", f_star=-99.96)
def hs021():
    def f(x):
        return 0.01 * x[0] ** 2 + x[1] ** 2 - 100.0

    def c(x):
        return jnp.array([10.0 * x[0] - x[1]])

    return nlp_from_functions(
        "hs021", f, c, x0=[-1.0, -1.0],
        x_lb=[2.0, -50.0], x_ub=[50.0, 50.0],
        c_lb=[10.0], c_ub=[INF],
    )


@register("hs035", f_star=1.0 / 9.0)
def hs035():
    def f(x):
        return (9.0 - 8.0 * x[0] - 6.0 * x[1] - 4.0 * x[2]
                + 2.0 * x[0] ** 2 + 2.0 * x[1] ** 2 + x[2] ** 2
                + 2.0 * x[0] * x[1] + 2.0 * x[0] * x[2])

    def c(x):
        return jnp.array([3.0 - x[0] - x[1] - 2.0 * x[2]])

    return nlp_from_functions(
        "hs035", f, c, x0=[0.5, 0.5, 0.5],
        x_lb=[0.0, 0.0, 0.0], x_ub=[INF, INF, INF],
        c_lb=[0.0], c_ub=[INF],
    )


@register("hs038", f_star=0.0)
def hs038():
    def f(x):
        return (100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2
                + 90.0 * (x[3] - x[2] ** 2) ** 2 + (1.0 - x[2]) ** 2
                + 10.1 * ((x[1] - 1.0) ** 2 + (x[3] - 1.0) ** 2)
                + 19.8 * (x[1] - 1.0) * (x[3] - 1.0))

    return nlp_from_functions(
        "hs038", f, None, x0=[-3.0, -1.0, -3.0, -1.0],
        x_lb=[-10.0] * 4, x_ub=[10.0] * 4,
    )


@register("hs048", f_star=0.0)
def hs048():
    def f(x):
        return (x[0] - 1.0) ** 2 + (x[1] - x[2]) ** 2 + (x[3] - x[4]) ** 2

    def c(x):
        return jnp.array([
            x[0] + x[1] + x[2] + x[3] + x[4],
            x[2] - 2.0 * (x[3] + x[4]),
        ])

    return nlp_from_functions(
        "hs048", f, c, x0=[3.0, 5.0, -3.0, 2.0, -2.0],
        c_lb=[5.0, -3.0], c_ub=[5.0, -3.0],
    )


@register("hs071", f_star=17.0140173)
def hs071():
    def f(x):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]

    def c(x):
        return jnp.array([
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2,
        ])

    return nlp_from_functions(
        "hs071", f, c, x0=[1.0, 5.0, 5.0, 1.0],
        x_lb=[1.0] * 4, x_ub=[5.0] * 4,
        c_lb=[25.0, 40.0], c_ub=[INF, 40.0],
    )


@register("hs100", f_star=680.6300573)
def hs100():
    def f(x):
        return ((x[0] - 10.0) ** 2 + 5.0 * (x[1] - 12.0) ** 2 + x[2] ** 4
                + 3.0 * (x[3] - 11.0) ** 2 + 10.0 * x[4] ** 6 + 7.0 * x[5] ** 2
                + x[6] ** 4 - 4.0 * x[5] * x[6] - 10.0 * x[5] - 8.0 * x[6])

    def c(x):
        return jnp.array([
            127.0 - 2.0 * x[0] ** 2 - 3.0 * x[1] ** 4 - x[2] - 4.0 * x[3] ** 2 - 5.0 * x[4],
            282.0 - 7.0 * x[0] - 3.0 * x[1] - 10.0 * x[2] ** 2 - x[3] + x[4],
            196.0 - 23.0 * x[0] - x[1] ** 2 - 6.0 * x[5] ** 2 + 8.0 * x[6],
            -4.0 * x[0] ** 2 - x[1] ** 2 + 3.0 * x[0] * x[1] - 2.0 * x[2] ** 2 - 5.0 * x[5] + 11.0 * x[6],
        ])

    return nlp_from_functions(
        "hs100", f, c, x0=[1.0, 2.0, 0.0, 4.0, 0.0, 1.0, 1.0],
        c_lb=[0.0] * 4, c_ub=[INF] * 4,
    )


@register("rosenbrock_eq", f_star=0.0)
def rosenbrock_eq():
    # an infeasible-start equality-constrained Rosenbrock variant
    def f(x):
        return 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2

    def c(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2])

    return nlp_from_functions("rosenbrock_eq", f, c, x0=[2.0, 2.0],
                              c_lb=[2.0], c_ub=[2.0])


@register("hs011", f_star=-8.498464223)
def hs011():
    return nlp_from_functions(
        "hs011", lambda x: (x[0] - 5.0) ** 2 + x[1] ** 2 - 25.0,
        lambda x: jnp.array([-x[0] ** 2 + x[1]]),
        x0=[4.9, 0.1], c_lb=[0.0], c_ub=[INF])


@register("hs012", f_star=-30.0)
def hs012():
    return nlp_from_functions(
        "hs012", lambda x: 0.5 * x[0] ** 2 + x[1] ** 2 - x[0] * x[1] - 7.0 * x[0] - 7.0 * x[1],
        lambda x: jnp.array([25.0 - 4.0 * x[0] ** 2 - x[1] ** 2]),
        x0=[0.0, 0.0], c_lb=[0.0], c_ub=[INF])


@register("hs022", f_star=1.0)
def hs022():
    return nlp_from_functions(
        "hs022", lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
        lambda x: jnp.array([-x[0] - x[1] + 2.0, -x[0] ** 2 + x[1]]),
        x0=[2.0, 2.0], c_lb=[0.0, 0.0], c_ub=[INF, INF])


@register("hs024", f_star=-1.0)
def hs024():
    s3 = np.sqrt(3.0)
    return nlp_from_functions(
        "hs024", lambda x: ((x[0] - 3.0) ** 2 - 9.0) * x[1] ** 3 / (27.0 * s3),
        lambda x: jnp.array([x[0] / s3 - x[1], x[0] + s3 * x[1],
                             -x[0] - s3 * x[1] + 6.0]),
        x0=[1.0, 0.5], x_lb=[0.0, 0.0], x_ub=[INF, INF],
        c_lb=[0.0] * 3, c_ub=[INF] * 3)


@register("hs028", f_star=0.0)
def hs028():
    return nlp_from_functions(
        "hs028", lambda x: (x[0] + x[1]) ** 2 + (x[1] + x[2]) ** 2,
        lambda x: jnp.array([x[0] + 2.0 * x[1] + 3.0 * x[2]]),
        x0=[-4.0, 1.0, 1.0], c_lb=[1.0], c_ub=[1.0])


@register("hs029", f_star=-16.0 * np.sqrt(2.0))
def hs029():
    return nlp_from_functions(
        "hs029", lambda x: -x[0] * x[1] * x[2],
        lambda x: jnp.array([-x[0] ** 2 - 2.0 * x[1] ** 2 - 4.0 * x[2] ** 2 + 48.0]),
        x0=[1.0, 1.0, 1.0], c_lb=[0.0], c_ub=[INF])


@register("hs030", f_star=1.0)
def hs030():
    return nlp_from_functions(
        "hs030", lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2,
        lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
        x0=[1.0, 1.0, 1.0], x_lb=[1.0, -10.0, -10.0], x_ub=[10.0] * 3,
        c_lb=[0.0], c_ub=[INF])


@register("hs033", f_star=np.sqrt(2.0) - 6.0, local_optima=(-4.0,))
def hs033():
    return nlp_from_functions(
        "hs033", lambda x: (x[0] - 1.0) * (x[0] - 2.0) * (x[0] - 3.0) + x[2],
        lambda x: jnp.array([x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
                             x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0]),
        x0=[0.0, 0.0, 3.0], x_lb=[0.0] * 3, x_ub=[INF, INF, 5.0],
        c_lb=[0.0, 0.0], c_ub=[INF, INF])


@register("hs036", f_star=-3300.0)
def hs036():
    return nlp_from_functions(
        "hs036", lambda x: -x[0] * x[1] * x[2],
        lambda x: jnp.array([72.0 - x[0] - 2.0 * x[1] - 2.0 * x[2]]),
        x0=[10.0, 10.0, 10.0], x_lb=[0.0] * 3, x_ub=[20.0, 11.0, 42.0],
        c_lb=[0.0], c_ub=[INF])


@register("hs037", f_star=-3456.0)
def hs037():
    return nlp_from_functions(
        "hs037", lambda x: -x[0] * x[1] * x[2],
        lambda x: jnp.array([72.0 - x[0] - 2.0 * x[1] - 2.0 * x[2],
                             x[0] + 2.0 * x[1] + 2.0 * x[2]]),
        x0=[10.0, 10.0, 10.0], x_lb=[0.0] * 3, x_ub=[42.0] * 3,
        c_lb=[0.0, 0.0], c_ub=[INF, INF])


@register("hs043", f_star=-44.0)
def hs043():
    # Rosen-Suzuki
    def f(x):
        return (x[0] ** 2 + x[1] ** 2 + 2.0 * x[2] ** 2 + x[3] ** 2
                - 5.0 * x[0] - 5.0 * x[1] - 21.0 * x[2] + 7.0 * x[3])

    def c(x):
        return jnp.array([
            8.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2 - x[3] ** 2 - x[0] + x[1] - x[2] + x[3],
            10.0 - x[0] ** 2 - 2.0 * x[1] ** 2 - x[2] ** 2 - 2.0 * x[3] ** 2 + x[0] + x[3],
            5.0 - 2.0 * x[0] ** 2 - x[1] ** 2 - x[2] ** 2 - 2.0 * x[0] + x[1] + x[3],
        ])

    return nlp_from_functions("hs043", f, c, x0=[0.0] * 4,
                              c_lb=[0.0] * 3, c_ub=[INF] * 3)


@register("hs045", f_star=1.0)
def hs045():
    return nlp_from_functions(
        "hs045", lambda x: 2.0 - x[0] * x[1] * x[2] * x[3] * x[4] / 120.0,
        None, x0=[2.0] * 5, x_lb=[0.0] * 5, x_ub=[1.0, 2.0, 3.0, 4.0, 5.0])


def chained_rosenbrock(n: int) -> NLP:
    """Scalable chained-Rosenbrock with spherical equality + bound
    constraints (CUTEst-style scalable family)."""
    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    def c(x):
        return jnp.array([jnp.dot(x, x) - float(n)])

    return nlp_from_functions(
        f"chained_rosenbrock_{n}", f, c,
        x0=np.full(n, 0.5),
        x_lb=np.full(n, -5.0), x_ub=np.full(n, 5.0),
        c_lb=[0.0], c_ub=[INF],
    )


def scalable_quadratic(n: int, m: int, seed: int = 0) -> NLP:
    """Random strictly-convex QP-like NLP with m linear inequalities and
    bounds; solution checkable against scipy."""
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    Q = Q @ Q.T / n + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    b = rng.uniform(-0.5, 0.5, m)
    Qj, qj, Aj, bj = map(jnp.asarray, (Q, q, A, b))

    def f(x):
        return 0.5 * x @ (Qj @ x) + qj @ x

    def c(x):
        return Aj @ x - bj

    return nlp_from_functions(
        f"scalable_quadratic_{n}x{m}", f, c,
        x0=np.zeros(n), x_lb=np.full(n, -2.0), x_ub=np.full(n, 2.0),
        c_lb=np.full(m, -INF), c_ub=np.zeros(m),
    )


# Extended Hock-Schittkowski sets (register into the same registry).
from uno_tpu.model import library_hs  # noqa: E402,F401  (isort: skip)
from uno_tpu.model import library_hs2  # noqa: E402,F401  (isort: skip)
from uno_tpu.model import library_cutest  # noqa: E402,F401  (isort: skip)
from uno_tpu.model import library_mgh  # noqa: E402,F401  (isort: skip)
from uno_tpu.model import library_nl  # noqa: E402,F401  (isort: skip)
from uno_tpu.model import library_r4  # noqa: E402,F401  (isort: skip)
