#!/usr/bin/env python3
"""Independent exact-Kalman ARMA log-likelihood goldens for ArimaSpec.

statsmodels is not installable in this environment (zero egress), so
bit-parity goldens against the reference's optimizer are unattainable
(SURVEY §7.4 risk 8). What IS checkable is the CORE numeric kernel the
whole MLE ladder rests on: the exact Gaussian log-likelihood of an
ARMA model in Harvey state-space form with concentrated sigma^2 —
standard textbook math (Harvey 1993, §3.3; the same quantity
statsmodels' SARIMAX maximizes with enforce_stationarity and exact
diffuse-free initialization). This script is a from-scratch PURE
PYTHON implementation — its own Gaussian elimination, its own
Kronecker stationary initialization, its own filter recursion, no
shared code with ArimaLite.scala — evaluated at fixed parameters on
three deterministic series. ArimaSpec regenerates the identical
series (same LCG, same IEEE operation order) and pins
ArimaLite.kalmanLogLik against the printed values.

Run:  python3 tools/arima_kalman_golden.py
Then paste the printed block into ArimaSpec's goldens table.
"""
import json
import math


def lcg_series(seed, n):
    """Deterministic uniforms in [-0.5, 0.5): x' = (1103515245 x +
    12345) mod 2^31 — exact int math, reproducible in Scala."""
    x = seed
    out = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x / float(1 << 31) - 0.5)
    return out


def gen_ar1(n=120):
    u = lcg_series(42, n)
    y, prev = [], 0.0
    for t in range(n):
        prev = 5.0 + 0.7 * prev + u[t]
        y.append(prev)
    return y


def gen_arma11(n=150):
    u = lcg_series(7, n)
    y, prev, eprev = [], 0.0, 0.0
    for t in range(n):
        e = u[t]
        prev = 2.0 + 0.5 * prev + e + 0.4 * eprev
        eprev = e
        y.append(prev)
    return y


def gen_weekly(n=140):
    u = lcg_series(99, n)
    y = []
    for t in range(n):
        y.append(10.0 + 3.0 * (1.0 if t % 7 == 0 else 0.0) + u[t])
    return y


def solve(a, b):
    """Gaussian elimination with partial pivoting (own implementation)."""
    n = len(b)
    a = [row[:] for row in a]
    b = b[:]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(a[r][col]))
        if abs(a[piv][col]) < 1e-12:
            return None
        a[col], a[piv] = a[piv], a[col]
        b[col], b[piv] = b[piv], b[col]
        for r in range(col + 1, n):
            f = a[r][col] / a[col][col]
            for c in range(col, n):
                a[r][c] -= f * a[col][c]
            b[r] -= f * b[col]
    x = [0.0] * n
    for r in range(n - 1, -1, -1):
        s = b[r] - sum(a[r][c] * x[c] for c in range(r + 1, n))
        x[r] = s / a[r][r]
    return x


def kalman_loglik(w, ar_lags, ma_lags, params):
    """Exact concentrated-sigma^2 ARMA log-likelihood, Harvey form."""
    p_max = max(ar_lags) if ar_lags else 0
    q_max = max(ma_lags) if ma_lags else 0
    m = max(p_max, q_max + 1)
    phi = [0.0] * m
    for i, lag in enumerate(ar_lags):
        phi[lag - 1] = params[1 + i]
    theta = [0.0] * m
    for j, lag in enumerate(ma_lags):
        if lag < m:
            theta[lag] = params[1 + len(ar_lags) + j]
    r = [1.0] + theta[1:]
    mu = params[0] / (1.0 - sum(phi))

    def T(i, k):
        if k == 0:
            return phi[i]
        return 1.0 if k == i + 1 else 0.0

    dim = m * m
    a0 = [[(1.0 if row == colix else 0.0)
           - T(row // m, colix // m) * T(row % m, colix % m)
           for colix in range(dim)] for row in range(dim)]
    b0 = [r[x // m] * r[x % m] for x in range(dim)]
    pv = solve(a0, b0)
    P = [[pv[i * m + j] for j in range(m)] for i in range(m)]
    a = [0.0] * m
    sum_log_f, ssq = 0.0, 0.0
    for wt in w:
        f = P[0][0]
        v = wt - mu - a[0]
        sum_log_f += math.log(f)
        ssq += v * v / f
        tp = [[phi[i] * P[0][j] + (P[i + 1][j] if i < m - 1 else 0.0)
               for j in range(m)] for i in range(m)]
        k = [tp[i][0] / f for i in range(m)]
        ta = [phi[i] * a[0] + (a[i + 1] if i < m - 1 else 0.0)
              for i in range(m)]
        a = [ta[i] + k[i] * v for i in range(m)]
        tpt = [[phi[j] * tp[i][0] + (tp[i][j + 1] if j < m - 1 else 0.0)
                for j in range(m)] for i in range(m)]
        P = [[tpt[i][j] + r[i] * r[j] - k[i] * f * k[j]
              for j in range(m)] for i in range(m)]
    n = len(w)
    sigma2 = ssq / n
    return (-0.5 * n * (math.log(2 * math.pi) + 1.0 + math.log(sigma2))
            - 0.5 * sum_log_f)


CASES = [
    ("ar1_at_truth", gen_ar1(), [1], [], [5.0, 0.7]),
    ("ar1_off_truth", gen_ar1(), [1], [], [1.0, 0.5]),
    ("arma11_at_truth", gen_arma11(), [1], [1], [2.0, 0.5, 0.4]),
    ("arma21", gen_arma11(), [1, 2], [1], [1.0, 0.3, 0.1, 0.2]),
    ("weekly_sparse_ar7", gen_weekly(), [1, 7], [], [3.0, 0.1, 0.4]),
]

if __name__ == "__main__":
    out = {}
    for name, series, ar, ma, params in CASES:
        out[name] = kalman_loglik(series, ar, ma, params)
    print(json.dumps(out, indent=2))
