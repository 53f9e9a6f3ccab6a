#!/usr/bin/env python3
"""Independent ARIMA grid ORDER-SELECTION goldens for ArimaSpec.

tools/arima_kalman_golden.py pins the exact-Kalman likelihood kernel;
what stayed unpinned (round-7 verdict, "What's missing" item 4) is
ORDER SELECTION: which (p,d,q)(P,D,Q) the Hannan-Rissanen/OLS grid
picks on a fixed series, and at what AIC. This script re-implements
the selection pipeline from its mathematical definition in pure
Python — own differencing, own lag-polynomial expansion, own
normal-equation accumulation, own Gauss solver, no shared code with
ArimaLite.scala — and prints, per fixed LCG series:

  * the non-seasonal grid winner (p, q, d) + AIC        [select]
  * the seasonal grid winner (d, sD, arLags, maLags) + AIC
                                              [selectSeasonal s=7]
  * the AIC margin to the runner-up (a selection golden is only
    trustworthy when the winner is clear of FP noise)

Estimator definition being pinned (also the scaladoc contract of
fitAr/fitArma/fitLags): OLS on the normal equations with partial-
pivot Gaussian elimination (pivot < 1e-12 -> combo skipped); MA terms
enter via Hannan-Rissanen stage-1 residuals from a long AR of order
max(pMax, qMax) + 3; regression rows start at the full lag cover
(max(pMax, stage1_order + qMax) when MA lags are present, else pMax);
sigma2 = max(SSE/n, 1e-12); AIC = n*ln(sigma2) + 2*(k+1) with
k = 1 + |arLags| + |maLags|; n <= k + 2 -> combo skipped; seasonal
lag sets {1..p} union {i + j*s : 1 <= j <= P, 0 <= i <= p}.

Run:  python3 tools/arima_order_golden.py
Then paste the printed block into ArimaSpec's selection goldens.
"""
import math


def lcg_series(seed, n):
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
    return [10.0 + (3.0 if t % 7 == 0 else 0.0) + u[t]
            for t in range(n)]


def gauss_solve(a, b):
    """Partial-pivot Gaussian elimination; None if pivot < 1e-12."""
    n = len(b)
    m = [list(a[i]) + [b[i]] for i in range(n)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        if abs(m[piv][col]) < 1e-12:
            return None
        m[col], m[piv] = m[piv], m[col]
        for r in range(col + 1, n):
            f = m[r][col] / m[col][col]
            for c in range(col, n + 1):
                m[r][c] -= f * m[col][c]
    x = [0.0] * n
    for r in range(n - 1, -1, -1):
        s = m[r][n]
        for c in range(r + 1, n):
            s -= m[r][c] * x[c]
        x[r] = s / m[r][r]
    return x


def ols(rows, ys):
    """OLS via normal equations over pre-built design rows."""
    if not rows:
        return None
    k = len(rows[0])
    xtx = [[0.0] * k for _ in range(k)]
    xty = [0.0] * k
    for r, yv in zip(rows, ys):
        for i in range(k):
            xty[i] += r[i] * yv
            for j in range(k):
                xtx[i][j] += r[i] * r[j]
    return gauss_solve(xtx, xty)


def fit_ar(y, p):
    """Long/plain AR: returns (beta, sigma2, aic, resid) or None."""
    n = len(y) - p
    if n <= p + 2:
        return None
    rows = [[1.0] + [y[t - 1 - i] for i in range(p)]
            for t in range(p, len(y))]
    beta = ols(rows, y[p:])
    if beta is None:
        return None
    sse = sum((y[t] - sum(b * v for b, v in
                          zip(beta, [1.0] + [y[t - 1 - i]
                                             for i in range(p)]))) ** 2
              for t in range(p, len(y)))
    sigma2 = max(sse / n, 1e-12)
    if math.isnan(sigma2):
        return None
    resid = [0.0] * len(y)
    for t in range(p, len(y)):
        pred = beta[0] + sum(beta[1 + i] * y[t - 1 - i]
                             for i in range(p))
        resid[t] = y[t] - pred
    aic = n * math.log(sigma2) + 2.0 * (p + 2)
    return beta, sigma2, aic, resid


def fit_arma(y, p, q):
    """Hannan-Rissanen ARMA(p, q): returns (aic,) or None."""
    if q == 0:
        f = fit_ar(y, p)
        return None if f is None else (f[2],)
    m = max(p, q) + 3
    f1 = fit_ar(y, m)
    if f1 is None:
        return None
    e = f1[3]
    start = max(p, m + q)
    n = len(y) - start
    if n <= p + q + 2:
        return None
    k = 1 + p + q

    def row(t):
        return [1.0] + [y[t - 1 - i] for i in range(p)] + \
            [e[t - 1 - j] for j in range(q)]

    beta = ols([row(t) for t in range(start, len(y))], y[start:])
    if beta is None:
        return None
    sse = sum((y[t] - sum(b * v for b, v in zip(beta, row(t)))) ** 2
              for t in range(start, len(y)))
    sigma2 = max(sse / n, 1e-12)
    if math.isnan(sigma2):
        return None
    return (n * math.log(sigma2) + 2.0 * (k + 1),)


def select_nonseasonal(y, max_p=2, max_q=2):
    """(aic, d, p, q) winners, best first."""
    outs = []
    for d in (0, 1):
        yd = y if d == 0 else [y[i + 1] - y[i] for i in range(len(y) - 1)]
        for p in range(max_p + 1):
            for q in range(max_q + 1):
                if p + q == 0:
                    continue
                f = fit_arma(yd, p, q)
                if f is not None:
                    outs.append((f[0], d, p, q))
    return sorted(outs)


def lag_set(p, sp, s):
    ls = set(range(1, p + 1))
    for j in range(1, sp + 1):
        for i in range(p + 1):
            ls.add(i + j * s)
    return sorted(ls)


def fit_lags(w, ar_lags, ma_lags):
    """Subset-lag HR/OLS fit; returns aic or None."""
    p_max = max(ar_lags) if ar_lags else 0
    q_max = max(ma_lags) if ma_lags else 0
    if ma_lags:
        m = max(p_max, q_max) + 3
        f1 = fit_ar(w, m)
        if f1 is None:
            return None
        e = f1[3]
        start = max(p_max, m + q_max)
    else:
        e = [0.0] * len(w)
        start = p_max
    n = len(w) - start
    k = 1 + len(ar_lags) + len(ma_lags)
    if n <= k + 2:
        return None

    def row(t):
        return [1.0] + [w[t - l] for l in ar_lags] + \
            [e[t - l] for l in ma_lags]

    beta = ols([row(t) for t in range(start, len(w))], w[start:])
    if beta is None:
        return None
    sse = sum((w[t] - sum(b * v for b, v in zip(beta, row(t)))) ** 2
              for t in range(start, len(w)))
    sigma2 = max(sse / n, 1e-12)
    if math.isnan(sigma2):
        return None
    return n * math.log(sigma2) + 2.0 * (k + 1)


def diff_chain(y, d, sD, s):
    cur = list(y)
    for _ in range(d):
        cur = [cur[i + 1] - cur[i] for i in range(len(cur) - 1)]
    for _ in range(sD):
        if len(cur) <= s:
            return []
        cur = [cur[i + s] - cur[i] for i in range(len(cur) - s)]
    return cur


def select_seasonal(y, s=7, max_p=2, max_q=2, max_sp=1, max_sq=1):
    """(aic, d, sD, p, q, sp, sq, ar_lags, ma_lags), best first."""
    outs = []
    for d in (0, 1):
        for sD in (0, 1):
            w = diff_chain(y, d, sD, s)
            if not w:
                continue
            for p in range(max_p + 1):
                for q in range(max_q + 1):
                    for sp in range(max_sp + 1):
                        for sq in range(max_sq + 1):
                            if p + q + sp + sq == 0:
                                continue
                            ar = lag_set(p, sp, s)
                            ma = lag_set(q, sq, s)
                            aic = fit_lags(w, ar, ma)
                            if aic is not None:
                                outs.append((aic, d, sD, p, q, sp, sq,
                                             tuple(ar), tuple(ma)))
    return sorted(outs)


def main():
    series = [("ar1", gen_ar1()), ("arma11", gen_arma11()),
              ("weekly", gen_weekly())]
    print("// ---- non-seasonal select(y) goldens "
          "(name, d, p, q, aic, runner-up margin)")
    for name, y in series:
        outs = select_nonseasonal(y)
        (aic, d, p, q), (aic2, _, _, _) = outs[0], outs[1]
        print(f'//   ("{name}", d={d}, p={p}, q={q}, '
              f'aic={aic!r}, margin={aic2 - aic:.6f})')
    print("// ---- seasonal selectSeasonal(y, s=7) goldens")
    for name, y in series:
        outs = select_seasonal(y)
        top, second = outs[0], outs[1]
        aic, d, sD, p, q, sp, sq, ar, ma = top
        print(f'//   ("{name}", d={d}, sD={sD}, (p,q,P,Q)=({p},{q},{sp},{sq}), '
              f'arLags={list(ar)}, maLags={list(ma)},')
        print(f'//    aic={aic!r}, margin={second[0] - aic:.6f})')


if __name__ == "__main__":
    main()
