"""Noise samplers.

Two tiers, same distributions:

* **Vectorized float samplers** (NumPy) — the executor hot path inside
  Arrow-batched pandas UDFs.  These replace the reference's per-value
  ``Series.apply`` loops (``pandas_measurements/series.py:305-309``)
  with whole-batch array sampling, which is the main single-node
  throughput win of the rebuild.
* **Exact integer samplers** (``fractions.Fraction`` arithmetic, no
  floats anywhere) for the two-sided geometric and discrete Gaussian,
  following the published rejection samplers of Canonne, Kapralov &
  Steinke, "The Discrete Gaussian for Differential Privacy"
  (arXiv:2004.00010).  Used on the scalar driver path where
  floating-point attacks matter most (cf. reference
  ``tmlt/core/random/discrete_gaussian.py``).

Continuous Laplace/Gaussian sampling here is float-based (NumPy) and
feeds the *vectorized column* path only; the scalar measurement paths
use the floating-point-safe interval inverse-CDF samplers in
:mod:`tumult_core_spark.exact_sampling` (the analogue of the
reference's MPFR/Arb samplers).  The vectorized float path remains a
documented, upgradeable weakening for column noise (reference
``doc/topic-guides/known-vulnerabilities.rst``).

Every sampler treats ``scale == 0`` as "no noise" and returns the
input unchanged — the deterministic mode used by correctness oracles.

RNG: one ``numpy.random.Generator`` per process, seeded from
``os.urandom`` so executor workers never share a seed.
"""

from __future__ import annotations

import os
from fractions import Fraction
from typing import Optional, Union

import numpy as np

_GENERATOR: Optional[np.random.Generator] = None
_GENERATOR_PID: Optional[int] = None


def rng() -> np.random.Generator:
    """Process-local CSPRNG-seeded generator (fork-safe)."""
    global _GENERATOR, _GENERATOR_PID
    pid = os.getpid()
    if _GENERATOR is None or _GENERATOR_PID != pid:
        _GENERATOR = np.random.default_rng(
            np.frombuffer(os.urandom(32), dtype=np.uint64)
        )
        _GENERATOR_PID = pid
    return _GENERATOR


# ---------------------------------------------------------------------------
# Vectorized float samplers (executor hot path)
# ---------------------------------------------------------------------------


def laplace(scale: float, size: int) -> np.ndarray:
    """Inverse-CDF from one uniform batch: ~10x faster than the
    generic generator method at 10M draws."""
    if scale == 0:
        return np.zeros(size)
    u = rng().random(size) - 0.5
    return -scale * np.sign(u) * np.log1p(-2.0 * np.abs(u))


def gaussian(sigma_squared: float, size: int) -> np.ndarray:
    if sigma_squared == 0:
        return np.zeros(size)
    return rng().normal(0.0, float(np.sqrt(sigma_squared)), size)


def _geometric_failures(q: float, size: int, g: np.random.Generator) -> np.ndarray:
    """Geometric number-of-failures (support {0,1,...}), P[k] = (1-q) q^k,
    by inversion: floor(log(u) / log(q))."""
    u = g.random(size)  # (0, 1); zero probability of exactly 0
    np.clip(u, np.finfo(float).tiny, None, out=u)
    return np.floor(np.log(u) / np.log(q)).astype(np.int64)


def two_sided_geometric(scale: float, size: int) -> np.ndarray:
    """Discrete Laplace: difference of two iid geometric(p=1-e^{-1/s}) vars.

    P[X=k] ∝ e^{-|k|/scale}; integer-valued.
    """
    if scale == 0:
        return np.zeros(size, dtype=np.int64)
    q = float(np.exp(-1.0 / scale))
    g = rng()
    return _geometric_failures(q, size, g) - _geometric_failures(q, size, g)


def discrete_gaussian(sigma_squared: float, size: int) -> np.ndarray:
    """Vectorized discrete Gaussian N_Z(0, sigma^2) via rejection from
    the discrete Laplace proposal (CKS'20, Algorithm 3), batched with
    an empirically-tuned overdraw so most calls finish in one round."""
    if sigma_squared == 0:
        return np.zeros(size, dtype=np.int64)
    sigma = float(np.sqrt(sigma_squared))
    t = int(np.floor(sigma)) + 1
    out = np.empty(size, dtype=np.int64)
    filled = 0
    g = rng()
    overdraw = 2.2  # ~1/acceptance for small sigma; refined per round
    while filled < size:
        n = max(1024, int((size - filled) * overdraw))
        y = two_sided_geometric(float(t), n)
        # in-place acceptance computation (few temporaries)
        z = np.abs(y).astype(np.float64)
        z -= sigma_squared / t
        z *= z
        z /= -2.0 * sigma_squared
        np.exp(z, out=z)
        keep = y[g.random(n) < z]
        if len(keep):
            acc = len(keep) / n
            overdraw = min(20.0, 1.2 / max(acc, 0.05))
        take = min(len(keep), size - filled)
        out[filled : filled + take] = keep[:take]
        filled += take
    return out


# ---------------------------------------------------------------------------
# Exact integer samplers (driver scalar path) — Fraction arithmetic only
# ---------------------------------------------------------------------------


def _randbelow(d: int) -> int:
    """Uniform integer in [0, d) for arbitrary-precision ``d``.

    NumPy's ``integers`` is capped at int64; denominators of
    ``Fraction``-exact parameters routinely exceed that (e.g. a
    ``Fraction(float)`` sigma^2 has denominator ~2^52, squared to
    ~2^104 inside the discrete-Gaussian acceptance gamma).  Assemble
    the draw from 63-bit chunks and reject values >= d.
    """
    bits = d.bit_length()
    g = rng()
    if bits <= 63:
        return int(g.integers(0, d))
    while True:
        r = 0
        remaining = bits
        while remaining > 0:
            take = min(remaining, 63)
            r = (r << take) | int(g.integers(0, 1 << take))
            remaining -= take
        if r < d:
            return r


def _bernoulli(p: Fraction) -> bool:
    """Exact Bernoulli(p) using rejection-free integer comparison."""
    assert 0 <= p <= 1
    # draw a uniform integer in [0, denominator) and compare to numerator
    return _randbelow(p.denominator) < p.numerator


def _bernoulli_exp_frac(gamma: Fraction) -> bool:
    """Exact Bernoulli(exp(-gamma)) for 0 <= gamma <= 1 (CKS'20 Alg. 1)."""
    k = 1
    while True:
        if not _bernoulli(gamma / k):
            return k % 2 == 1
        k += 1


def bernoulli_exp(gamma: Fraction) -> bool:
    """Exact Bernoulli(exp(-gamma)) for any gamma >= 0."""
    if gamma < 0:
        raise ValueError("gamma must be >= 0")
    while gamma > 1:
        if not _bernoulli_exp_frac(Fraction(1)):
            return False
        gamma -= 1
    return _bernoulli_exp_frac(gamma)


def geometric_exact(scale: Union[int, Fraction]) -> int:
    """Exact two-sided geometric with P[X=k] ∝ exp(-|k|/scale).

    Pure integer/Fraction arithmetic; no float ever touches the sample.
    """
    scale = Fraction(scale)
    if scale == 0:
        return 0
    if scale < 0:
        raise ValueError("scale must be >= 0")
    t = Fraction(1) / scale
    while True:
        # sample one-sided geometric: successes of Bernoulli(exp(-t))
        magnitude = 0
        while bernoulli_exp(t):
            magnitude += 1
            if magnitude > 10_000_000:  # safety against pathological scales
                raise RuntimeError("geometric sampler diverged")
        sign_positive = _bernoulli(Fraction(1, 2))
        if magnitude == 0 and not sign_positive:
            continue  # reject duplicate zero so zero isn't double-weighted
        return magnitude if sign_positive else -magnitude


def discrete_gaussian_exact(sigma_squared: Union[int, Fraction]) -> int:
    """Exact discrete Gaussian N_Z(0, sigma^2) (CKS'20 Algorithm 3)."""
    s2 = Fraction(sigma_squared)
    if s2 == 0:
        return 0
    if s2 < 0:
        raise ValueError("sigma_squared must be >= 0")
    # t = floor(sigma) + 1 computed exactly via integer sqrt of floor(s2)
    import math

    t = math.isqrt(int(s2)) + 1
    while True:
        y = _discrete_laplace_exact(Fraction(t))
        gamma = (abs(y) - s2 / t) ** 2 / (2 * s2)
        if bernoulli_exp(gamma):
            return y


def _discrete_laplace_exact(scale: Fraction) -> int:
    """Exact discrete Laplace over Z with P[Y=y] ∝ exp(-|y|/scale)."""
    inv = Fraction(1) / scale
    while True:
        magnitude = 0
        while bernoulli_exp(inv):
            magnitude += 1
        positive = _bernoulli(Fraction(1, 2))
        if magnitude == 0 and not positive:
            continue
        return magnitude if positive else -magnitude


def uniform(lower: float, upper: float) -> float:
    """Uniform sample in [lower, upper] (float path)."""
    return float(rng().uniform(lower, upper))
