"""Driver-side statistical-test math for the t_test aggregation.

The ES `t_test` agg (delegated by the reference to Elasticsearch like
the rest of the agg family behind backend/search_api/main.py:162-189)
returns the two-tailed p-value of a Student's t-test.  The engine
computes the t statistic and degrees of freedom in ONE single-row
Spark aggregate; converting (t, dof) to a p-value is O(1) scalar math
that belongs on the driver — the same place ES's coordinating node
does it.  scipy is not available in this environment, so the
regularized incomplete beta function is implemented here with the
standard continued-fraction expansion (Lentz's algorithm, as published
in Numerical Recipes §6.4 and the DLMF 8.17.22 — public textbook
material).
"""

import math

_MAX_ITER = 300
_EPS = 3e-12
_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            return h
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    # symmetry pick for continued-fraction convergence
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_two_tailed_p(t: float, dof: float) -> float:
    """Two-tailed p-value of Student's t with `dof` degrees of freedom.

    P(|T| >= |t|) = I_{dof/(dof+t^2)}(dof/2, 1/2).
    """
    if dof <= 0 or math.isnan(t) or math.isnan(dof):
        return float("nan")
    if math.isinf(t):
        return 0.0
    x = dof / (dof + t * t)
    return min(1.0, max(0.0, betainc_reg(dof / 2.0, 0.5, x)))
