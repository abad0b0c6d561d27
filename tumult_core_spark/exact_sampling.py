"""Floating-point-safe continuous samplers and exponential-mechanism
selection.

Port of the reference's Arb-based design (``random/laplace.py:12-49``,
``random/continuous_gaussian.py:13-97``, ``random/uniform.py:34``,
``random/inverse_cdf.py``, ``pandas_measurements/series.py:374-484``)
onto ``mpmath.iv`` interval arithmetic (mpmath ships with sympy, which
is already a dependency) instead of vendored GMP/MPFR/Arb ctypes.

The common pattern — inverse transform sampling with progressively
refined randomness:

1. draw ``step`` more random bits, defining the dyadic probability
   interval ``p in [bits/2^n, (bits+1)/2^n]``;
2. evaluate the (monotone) inverse CDF at both endpoints in rigorous
   interval arithmetic at ~n bits of working precision;
3. if every real in the image interval rounds to the same IEEE double,
   return it; otherwise draw more bits and repeat.

Because the returned double is determined by the true real-valued
sample, the result carries none of the float-artifact structure that
naive ``scale * log(u)``-style samplers leak (the vulnerability class
in the reference's ``doc/topic-guides/known-vulnerabilities.rst``).

Uniform needs no transcendental functions, so it runs entirely in
exact ``Fraction`` arithmetic.  Laplace uses ``iv.log``.  Gaussian
needs ``erfinv``, which ``mpmath.iv`` lacks: the candidate comes from
scalar ``mpmath.erfinv`` and is then *verified* (and widened if
needed) through the rigorous ``iv.erf`` enclosure, using monotonicity
of ``erf`` — so the final interval is certified, not trusted.

``select_noisy_argmax`` is the exponential-mechanism selection: a
vectorized NumPy pass brackets every candidate's Gumbel-noised score
between its p-interval endpoints (plus a float-rounding slack) and
eliminates dominated candidates; the few survivors are re-scored in
interval arithmetic with progressively more Gumbel bits until exactly
one remains — the same elimination loop as the reference's
``_select_quantile_interval``, with a vectorized shortlist in front.
"""

from __future__ import annotations

from fractions import Fraction
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import samplers


def _randbits(n: int) -> int:
    """n uniform random bits from the process CSPRNG-seeded generator."""
    g = samplers.rng()
    out = 0
    while n > 0:
        take = min(n, 63)
        out = (out << take) | int(g.integers(0, 1 << take))
        n -= take
    return out


# ---------------------------------------------------------------------------
# Uniform: exact Fraction arithmetic, no transcendentals
# ---------------------------------------------------------------------------


def sample_uniform(lower: float, upper: float, step_size: int = 63) -> float:
    """Uniform draw from [lower, upper], exact.

    The inverse CDF ``l + p (u - l)`` is rational, so the image of the
    dyadic p-interval is computed exactly with ``Fraction`` and the
    loop stops as soon as both endpoints round to the same double
    (``float(Fraction)`` rounds correctly).  Reference:
    ``random/uniform.py:34``.
    """
    if not lower <= upper:
        raise ValueError(f"need lower <= upper, got {lower} > {upper}")
    if lower == upper:
        return float(lower)
    lo_f, span = Fraction(lower), Fraction(upper) - Fraction(lower)
    n = 0
    bits = 0
    while True:
        bits = (bits << step_size) | _randbits(step_size)
        n += step_size
        denom = 1 << n
        a = float(lo_f + span * Fraction(bits, denom))
        b = float(lo_f + span * Fraction(bits + 1, denom))
        if a == b:
            return a


# ---------------------------------------------------------------------------
# Interval-arithmetic inverse-CDF samplers (Laplace, Gaussian)
# ---------------------------------------------------------------------------


def _iv_dyadic(iv, num: int, log2_den: int):
    """Exact iv.mpf for num / 2**log2_den (binary scaling is lossless
    as long as iv.prec >= bit_length(num))."""
    return iv.mpf(num) / iv.mpf(1 << log2_den)


def _laplace_icdf_enclosure(mu: float, b: float, num: int, n: int, iv):
    """Rigorous enclosure of the Laplace(mu, b) inverse CDF at the
    exact dyadic point num/2^n:  mu - b sgn(p-1/2) log(1-2|p-1/2|)."""
    if num * 2 == (1 << n):
        return iv.mpf(mu)
    p = _iv_dyadic(iv, num, n)
    d = p - iv.mpf("0.5")
    sign = 1.0 if num * 2 > (1 << n) else -1.0
    inner = iv.mpf(1) - iv.mpf(2) * abs(d)
    return iv.mpf(mu) - iv.mpf(b) * iv.mpf(sign) * iv.log(inner)


def sample_laplace(mu: float, b: float, step_size: int = 63) -> float:
    """Laplace(mu, b) draw via rigorous interval inverse-CDF
    (reference ``random/laplace.py:12-49``)."""
    import mpmath

    if not b >= 0:
        raise ValueError("scale must be >= 0")
    if b == 0:
        return float(mu)
    iv = mpmath.iv
    n = 0
    bits = 0
    while True:
        bits = (bits << step_size) | _randbits(step_size)
        n += step_size
        if bits == 0 or bits + 1 == (1 << n):
            continue  # p touching {0,1}: icdf unbounded, refine first
        iv.prec = n + 20
        lo = _laplace_icdf_enclosure(mu, b, bits, n, iv)
        hi = _laplace_icdf_enclosure(mu, b, bits + 1, n, iv)
        a, c = float(lo.a), float(hi.b)
        if a == c:
            return a


def _iv_erf(y, iv):
    """Rigorous interval enclosure of erf(y).

    ``mpmath.iv.erf`` (hypergeometric 1F1) fails to converge for
    moderate arguments, so this uses the cancellation-free series

        erf(y) = (2/sqrt(pi)) y e^{-y^2} sum_k (2y^2)^k / (1*3*...*(2k+1))

    whose terms are all positive; the truncation error is enclosed by
    a geometric tail bound once the term ratio 2y^2/(2k+3) < 1/2.
    Everything runs in iv arithmetic, so the result is certified.
    """
    two_y2 = iv.mpf(2) * y * y
    term = iv.mpf(1)
    total = iv.mpf(1)
    k = 0
    tiny = iv.mpf(1) / iv.mpf(1 << (iv.prec + 5))
    while True:
        k += 1
        term = term * two_y2 / iv.mpf(2 * k + 1)
        total = total + term
        ratio = two_y2 / iv.mpf(2 * k + 3)
        if ratio.b < 0.5 and term.b < tiny.a:
            # tail <= term * ratio / (1 - ratio) <= term (since ratio < 1/2)
            total = total + iv.mpf([0, term.b])
            break
        if k > 10000:
            raise RuntimeError("erf series failed to converge")
    return (iv.mpf(2) / iv.sqrt(iv.pi)) * y * iv.exp(-y * y) * total


def _erfinv_enclosure(x_num: int, x_den_log2: int, prec: int, iv, mpmath):
    """Certified enclosure of erfinv(x) for the exact dyadic
    x = x_num/2^x_den_log2 in (-1, 1).

    Candidate from scalar mpmath.erfinv at working precision, then
    verified through the rigorous series erf enclosure: by
    monotonicity, erfinv(x) ∈ [ylo, yhi] iff erf(ylo) <= x <=
    erf(yhi).  The margin doubles until both one-sided checks certify.
    """
    x = _iv_dyadic(iv, x_num, x_den_log2)
    # all candidate arithmetic at full working precision — at default
    # (53-bit) precision y±eps collapses onto y for eps < ulp(y) and
    # the certification can never move past y's own rounding error
    with mpmath.workprec(prec + 30):
        y = mpmath.erfinv(mpmath.mpf(x_num) / mpmath.mpf(1 << x_den_log2))
        eps = mpmath.ldexp(1, -prec - 5) * (abs(y) + 1)
        for _ in range(64):
            ylo, yhi = y - eps, y + eps
            lo_ok = _iv_erf(iv.mpf(ylo), iv).b <= x.a
            hi_ok = _iv_erf(iv.mpf(yhi), iv).a >= x.b
            if lo_ok and hi_ok:
                return iv.mpf([ylo, yhi])
            eps = eps * 2
    raise RuntimeError("erfinv enclosure failed to certify")


def sample_gaussian(
    sigma_squared: float, mu: float = 0.0, step_size: int = 63
) -> float:
    """N(mu, sigma^2) draw via certified interval inverse-CDF
    (reference ``random/continuous_gaussian.py:13-97``):
    ``mu + sqrt(sigma^2) sqrt(2) erfinv(2p - 1)``."""
    import mpmath

    if not sigma_squared >= 0:
        raise ValueError("sigma_squared must be >= 0")
    if sigma_squared == 0:
        return float(mu)
    iv = mpmath.iv
    n = 0
    bits = 0
    while True:
        bits = (bits << step_size) | _randbits(step_size)
        n += step_size
        if bits == 0 or bits + 1 == (1 << n):
            continue
        iv.prec = n + 20
        scale = iv.sqrt(iv.mpf(sigma_squared)) * iv.sqrt(iv.mpf(2))
        # 2p - 1 at p = bits/2^n is the exact dyadic (2*bits - 2^n)/2^n
        lo = _erfinv_enclosure(2 * bits - (1 << n), n, n + 20, iv, mpmath)
        hi = _erfinv_enclosure(2 * (bits + 1) - (1 << n), n, n + 20, iv, mpmath)
        out = iv.mpf(mu) + scale * iv.mpf([lo.a, hi.b])
        a, c = float(out.a), float(out.b)
        if a == c:
            return a


# ---------------------------------------------------------------------------
# Exact exponential-mechanism selection (Gumbel-max with refinement)
# ---------------------------------------------------------------------------


def select_noisy_argmax(
    widths: np.ndarray,
    penalties: np.ndarray,
    exact_width=None,
    exact_penalty=None,
    step_size: int = 63,
    refine_step: int = 15,
    float_slack: Optional[float] = None,
) -> int:
    """Index of argmax_i of ``log(w_i) - c_i + G_i`` with iid standard
    Gumbel noise, decided exactly.

    ``widths`` / ``penalties`` are float arrays for the vectorized
    shortlist; ``exact_width(i)`` / ``exact_penalty(i)`` return the
    exact ``Fraction`` values for the interval-arithmetic refinement
    (defaulting to exact conversion of the float entries, which is
    correct when the floats are themselves the exact inputs).  Mirrors
    the reference's precision-doubling elimination loop
    (``series.py:409-484``) with a vectorized float shortlist in
    front: each candidate's score is bracketed between its Gumbel
    p-interval endpoints (widened by ``float_slack``), dominated
    candidates are dropped vectorized, and only the survivors enter
    the exact mpmath loop — so the per-group cost stays O(m) NumPy
    plus O(survivors) arbitrary precision.
    """
    m = len(widths)
    if m == 0:
        raise ValueError("no candidates")
    if m == 1:
        return 0
    if exact_width is None:
        exact_width = lambda i: Fraction(float(widths[i]))  # noqa: E731
    if exact_penalty is None:
        exact_penalty = lambda i: Fraction(float(penalties[i]))  # noqa: E731
    g = samplers.rng()
    n = step_size
    bits = g.integers(0, 1 << step_size, size=m, dtype=np.uint64)

    # --- vectorized float shortlist ---
    # The shortlist must never eliminate the true argmax, so every
    # float bound is directed: the 63-bit ``bits`` round when cast to
    # float64 (>2^53), so the dyadic p-interval is widened by that
    # rounding error first; a p-interval touching 0 or 1 keeps its TRUE
    # infinite Gumbel endpoint (a clipped finite stand-in could
    # eliminate the real winner — the derivative of -log(-log p) blows
    # up at both ends, where no finite slack is sound); and the
    # residual slack is the propagated log-chain rounding bound
    # ~2*eps*(1+|value|) per log, widened 64x, not a fixed heuristic.
    with np.errstate(divide="ignore", invalid="ignore"):
        log_w = np.log(np.asarray(widths, dtype=float))
        pen = np.asarray(penalties, dtype=float)
        base = log_w - pen
        bits_f = bits.astype(np.float64)
        err_b = bits_f * 2.0**-52 + 2.0
        den = float(1 << n)
        p_lo = (bits_f - err_b) / den
        p_hi = (bits_f + 1.0 + err_b) / den
        # clipping p downward only lowers a lower bound (monotone), and
        # upward only raises an upper bound — both directions stay sound
        g_lo = np.where(
            p_lo > 0.0,
            -np.log(-np.log(np.minimum(p_lo, 1.0 - 1e-17))),
            -np.inf,
        )
        g_hi = np.where(
            p_hi < 1.0,
            -np.log(-np.log(np.maximum(p_hi, 1e-300))),
            np.inf,
        )
    mult = 64.0 * float(np.finfo(float).eps) if float_slack is None else float_slack
    # scale with |log w| and |penalty| separately, not |base|: their
    # rounding errors survive even when the subtraction cancels
    with np.errstate(invalid="ignore"):
        slack = mult * (
            1.0
            + np.abs(np.where(np.isfinite(log_w), log_w, 0.0))
            + np.abs(pen)
            + np.abs(g_lo)
            + np.abs(g_hi)
        )
    with np.errstate(invalid="ignore"):
        score_lo = base + g_lo - slack
        score_hi = base + g_hi + slack
    # an infinite endpoint makes its own slack infinite and can NaN the
    # sum; a zero-width candidate (base = -inf) truly scores -inf, any
    # other NaN resolves conservatively to +inf
    score_lo = np.where(np.isnan(score_lo), -np.inf, score_lo)
    score_hi = np.where(
        np.isnan(score_hi), np.where(np.isneginf(base), -np.inf, np.inf), score_hi
    )
    best_lo = float(np.nanmax(score_lo))
    survivors: List[int] = [int(i) for i in np.flatnonzero(score_hi >= best_lo)]
    if len(survivors) == 1:
        return survivors[0]

    # --- exact refinement on the survivors ---
    import mpmath

    iv = mpmath.iv
    big_bits = {i: int(bits[i]) for i in survivors}
    while True:
        extra = _randbits_array(g, len(survivors), refine_step)
        for k, i in enumerate(survivors):
            big_bits[i] = (big_bits[i] << refine_step) + extra[k]
        n += refine_step
        iv.prec = n + 20
        intervals = []
        for i in survivors:
            b_i = big_bits[i]
            base_iv = iv.log(_exact_to_iv(iv, exact_width(i))) - _exact_to_iv(
                iv, exact_penalty(i)
            )
            glo = _gumbel_at(iv, b_i, n, lower=True)
            ghi = _gumbel_at(iv, b_i + 1, n, lower=False)
            intervals.append(base_iv + iv.mpf([glo, ghi]))
        best = max(intervals, key=lambda s: s.a)
        keep = [i for i, s in zip(survivors, intervals) if not (s.b < best.a)]
        if len(keep) == 1:
            return keep[0]
        survivors = keep


def _randbits_array(g, count: int, width: int) -> List[int]:
    return [int(x) for x in g.integers(0, 1 << width, size=count, dtype=np.uint64)]


def _exact_to_iv(iv, x: Fraction):
    x = Fraction(x)
    return iv.mpf(x.numerator) / iv.mpf(x.denominator)


def _gumbel_at(iv, num: int, log2_den: int, lower: bool):
    """One endpoint of -log(-log(p)) at the exact dyadic p=num/2^den.

    p=0 maps to -inf, p=1 to +inf (valid one-sided bounds)."""
    import mpmath

    if num <= 0:
        return mpmath.mpf("-inf")
    if num >= (1 << log2_den):
        return mpmath.mpf("+inf")
    p = _iv_dyadic(iv, num, log2_den)
    val = -iv.log(-iv.log(p))
    return val.a if lower else val.b
