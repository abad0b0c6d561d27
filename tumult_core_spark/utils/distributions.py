"""Analytic PMFs/CMFs for the discrete noise distributions.

Used by privacy math (partition-selection delta) and by the
statistical test suite (chi-squared goodness of fit).  Exact variants
return :class:`ExactNumber` (sympy symbolic, no rounding); float
variants are NumPy-vectorized.

Distribution conventions match the reference
(``tmlt/core/utils/distributions.py:33-560``): the two-sided geometric
with scale :math:`\\alpha` has :math:`P[X=k] \\propto e^{-|k|/\\alpha}`.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import sympy as sp

from ..exact_number import ExactNumber, ExactNumberInput


def double_sided_geometric_pmf(k: Union[int, np.ndarray], alpha: float) -> Union[float, np.ndarray]:
    q = np.exp(-1.0 / alpha)
    return (1 - q) / (1 + q) * q ** np.abs(k)


def double_sided_geometric_cmf(k: Union[int, np.ndarray], alpha: float) -> Union[float, np.ndarray]:
    q = np.exp(-1.0 / alpha)
    k = np.asarray(k)
    neg = q ** (-k) / (1 + q)
    pos = 1 - q ** (k + 1) / (1 + q)
    out = np.where(k < 0, neg, pos)
    return out if out.shape else float(out)


def double_sided_geometric_cmf_exact(k: ExactNumberInput, alpha: ExactNumberInput) -> ExactNumber:
    """Exact P[X <= k] for the two-sided geometric with scale alpha."""
    k_e = ExactNumber(k)
    a = ExactNumber(alpha)
    if not k_e.is_integer:
        raise ValueError(f"k must be integral, got {k}")
    if a == 0:
        return ExactNumber(1) if k_e >= 0 else ExactNumber(0)
    q = sp.exp(-1 / a.expr)
    k_i = int(k_e.expr)
    if k_i < 0:
        return ExactNumber(q ** (-k_i) / (1 + q))
    return ExactNumber(1 - q ** (k_i + 1) / (1 + q))


def double_sided_geometric_inverse_cmf_exact(
    p: ExactNumberInput, alpha: ExactNumberInput
) -> int:
    """Smallest integer k with CMF(k) >= p (exact arithmetic)."""
    target = ExactNumber(p)
    a = ExactNumber(alpha)
    if target <= 0 or target > 1:
        raise ValueError("p must be in (0, 1]")
    if target == 1 and a != 0:
        # CMF(k) < 1 strictly at every finite k for alpha > 0, so the
        # doubling search below would never terminate (r17 guard; the
        # only in-package caller keeps p < 1 by construction — the
        # partition-selection factory's infinite-budget branch returns
        # before this solve)
        raise ValueError(
            "p = 1 has no finite inverse for alpha > 0 (CMF < 1 everywhere)"
        )
    # exponential then binary search
    lo, hi = -1, 1
    while double_sided_geometric_cmf_exact(lo, a) >= target:
        lo *= 2
    while double_sided_geometric_cmf_exact(hi, a) < target:
        hi *= 2
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if double_sided_geometric_cmf_exact(mid, a) >= target:
            hi = mid
        else:
            lo = mid
    return hi


def discrete_gaussian_pmf(k: Union[int, np.ndarray], sigma_squared: float) -> Union[float, np.ndarray]:
    radius = int(np.ceil(10 * np.sqrt(sigma_squared))) + 1
    support = np.arange(-radius, radius + 1)
    weights = np.exp(-(support.astype(float) ** 2) / (2 * sigma_squared))
    z = weights.sum()
    return np.exp(-(np.asarray(k, dtype=float) ** 2) / (2 * sigma_squared)) / z


def discrete_gaussian_cmf(k: Union[int, np.ndarray], sigma_squared: float) -> Union[float, np.ndarray]:
    radius = int(np.ceil(10 * np.sqrt(sigma_squared))) + 1
    support = np.arange(-radius, radius + 1)
    weights = np.exp(-(support.astype(float) ** 2) / (2 * sigma_squared))
    cdf = np.cumsum(weights) / weights.sum()
    idx = np.clip(np.asarray(k) + radius, 0, len(cdf) - 1)
    out = cdf[idx]
    return out if np.asarray(k).shape else float(out)
