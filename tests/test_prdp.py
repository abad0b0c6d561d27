"""Distributional and contract tests for the per-record DP mechanisms
(reference ``utils/prdp.py`` parity).  No Spark needed — these are
scalar certified samplers."""

import math

import numpy as np
import pytest

from tumult_core_spark import prdp

# distributional KS sweeps (same family as test_noise_distributions):
# full lane only; fast lane = -m "not slow"
pytestmark = pytest.mark.slow

N = 500
P_THRESHOLD = 1e-4


def ks_pvalue(samples, cdf):
    x = np.sort(np.asarray(samples, dtype=float))
    n = len(x)
    c = np.array([cdf(v) for v in x])
    d = max(np.max(np.arange(1, n + 1) / n - c), np.max(c - np.arange(0, n) / n))
    t = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    s = sum((-1) ** (k - 1) * math.exp(-2 * k * k * t * t) for k in range(1, 101))
    return max(0.0, min(1.0, 2 * s))


def phi(z):
    return 0.5 * (1 + math.erf(z / math.sqrt(2)))


class TestTransformationMechanisms:
    def test_square_root_ks(self):
        x, off, sig = 100.0, 1.0, 2.0
        u = math.sqrt(x + off)
        s = [prdp.square_root_transformation_mechanism(x, off, sig) for _ in range(N)]

        def cdf(y):
            t = y + off
            if t <= 0:
                return 0.0
            r = math.sqrt(t)
            return phi((r - u) / sig) - phi((-r - u) / sig)

        p = ks_pvalue(s, cdf)
        assert p > P_THRESHOLD, f"KS p={p}"

    def test_fourth_root_ks(self):
        x, off, sig = 50.0, 1.0, 0.5
        u = (x + off) ** 0.25
        s = [prdp.fourth_root_transformation_mechanism(x, off, sig) for _ in range(N)]

        def cdf(y):
            t = y + off
            if t <= 0:
                return 0.0
            r = t ** 0.25
            return phi((r - u) / sig) - phi((-r - u) / sig)

        p = ks_pvalue(s, cdf)
        assert p > P_THRESHOLD, f"KS p={p}"

    def test_log_ks(self):
        x, off, sig = 100.0, 1.0, 0.4
        u = math.log(x + off)
        s = [prdp.log_transformation_mechanism(x, off, sig) for _ in range(N)]

        def cdf(y):
            t = y + off
            if t <= 0:
                return 0.0
            return phi((math.log(t) - u) / sig)

        p = ks_pvalue(s, cdf)
        assert p > P_THRESHOLD, f"KS p={p}"

    def test_domain_validation(self):
        with pytest.raises(ValueError):
            prdp.square_root_transformation_mechanism(-2.0, 1.0, 1.0)
        with pytest.raises(ValueError):
            prdp.log_transformation_mechanism(-1.0, 1.0, 1.0)
        with pytest.raises(ValueError):
            prdp.square_root_gaussian_mechanism(0.0)


class TestSquareRootGaussian:
    def test_ks(self):
        sigma = 3.0
        s = [prdp.square_root_gaussian_mechanism(sigma) for _ in range(N)]

        def cdf(y):
            # CDF(y) = 1 - (1+t) e^{-t} / 2 for y >= 0, t = sqrt(y/sigma);
            # symmetric: CDF(-y) = (1+t) e^{-t} / 2  (from inverting the
            # branch -1 Lambert-W inverse CDF)
            t = math.sqrt(abs(y) / sigma)
            tail = (1 + t) * math.exp(-t) / 2
            return 1 - tail if y >= 0 else tail

        p = ks_pvalue(s, cdf)
        assert p > P_THRESHOLD, f"KS p={p}"

    def test_symmetric_median(self):
        s = np.array([prdp.square_root_gaussian_mechanism(1.0) for _ in range(300)])
        assert abs((s > 0).mean() - 0.5) < 0.15


class TestExponentialPolylogarithmic:
    def test_ks(self):
        d, a, sigma = 2.0, 0.5, 1.5
        s = [prdp.exponential_polylogarithmic_mechanism(d, a, sigma) for _ in range(N)]
        c = 1 / math.sqrt(2 * d)
        phi_t = phi((math.log(a) - 1 / (2 * d)) / c)

        def cdf(y):
            # invert |Y| = sigma exp(c q + 1/(2d)) - sigma a, q = Phi^-1[...]
            mag = abs(y)
            q = (math.log((mag + sigma * a) / sigma) - 1 / (2 * d)) / c
            half_span = (phi(q) - phi_t) / (1 - phi_t)
            return 0.5 + half_span / 2 if y >= 0 else 0.5 - half_span / 2

        p = ks_pvalue(s, cdf)
        assert p > P_THRESHOLD, f"KS p={p}"
