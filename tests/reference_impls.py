"""Single-node numpy reference implementations used only by the test suite.

These re-derive each statistic from its published formula with a *different*
algorithm than the distributed engine (dense ranks via argsort instead of
pre-aggregated window midranks; matrix OLS instead of closed-form group means),
so agreement is a real cross-check, not a tautology.
"""

from __future__ import annotations

import math

import numpy as np

from switchback_test_dag_spark.stats.special import t_two_sided_p


def rankdata_average(values: np.ndarray) -> np.ndarray:
    """Average (mid) ranks, 1-based — scipy.stats.rankdata(method='average')."""
    order = np.argsort(values, kind="mergesort")
    ranks = np.empty(len(values), dtype=float)
    sv = values[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def mwu_two_sided(x: np.ndarray, y: np.ndarray):
    """MWU asymptotic two-sided p with tie correction + continuity correction
    (the scipy method='asymptotic', use_continuity=True formula)."""
    x = x[~np.isnan(x)]
    y = y[~np.isnan(y)]
    n1, n2 = len(x), len(y)
    pooled = np.concatenate([x, y])
    ranks = rankdata_average(pooled)
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u2 = n1 * n2 - u1
    n = n1 + n2
    _, counts = np.unique(pooled, return_counts=True)
    tie_term = float((counts.astype(float) ** 3 - counts).sum())
    mu = n1 * n2 / 2.0
    sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1))))
    z = (max(u1, u2) - mu - 0.5) / sigma
    p = min(1.0, math.erfc(z / math.sqrt(2.0)))
    return u1, z, p


def ttest_ind(x, y, equal_var=True):
    """scipy.stats.ttest_ind re-derivation (nan-dropped)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    x, y = x[~np.isnan(x)], y[~np.isnan(y)]
    n1, n2 = len(x), len(y)
    v1, v2 = x.var(ddof=1), y.var(ddof=1)
    if equal_var:
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
        se = math.sqrt(sp2 * (1 / n1 + 1 / n2))
        dof = n1 + n2 - 2
    else:
        se = math.sqrt(v1 / n1 + v2 / n2)
        dof = (v1 / n1 + v2 / n2) ** 2 / (
            (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
        )
    t = (x.mean() - y.mean()) / se
    return t, float(t_two_sided_p(t, dof))


def crse_matrix(y: np.ndarray, x: np.ndarray, groups: np.ndarray):
    """Matrix-form OLS y ~ 1 + x with CR1 cluster-robust covariance
    (statsmodels cov_type='cluster' default: CR1 correction, t dof = G−1)."""
    X = np.column_stack([np.ones_like(x), x])
    XtX_inv = np.linalg.inv(X.T @ X)
    beta = XtX_inv @ X.T @ y
    e = y - X @ beta
    meat = np.zeros((2, 2))
    for g in np.unique(groups):
        m = groups == g
        s = X[m].T @ e[m]
        meat += np.outer(s, s)
    n, k = X.shape
    n_g = len(np.unique(groups))
    c = (n_g / (n_g - 1)) * ((n - 1) / (n - k))
    V = c * XtX_inv @ meat @ XtX_inv
    se = math.sqrt(V[1, 1])
    t = beta[1] / se
    p = float(t_two_sided_p(t, n_g - 1))
    return beta[1], se, t, p
