"""Stdlib-backed shim for the few scipy.stats entry points tmlt.core touches."""
import math
from statistics import NormalDist

_ND = NormalDist()


class norm:  # noqa: N801
    @staticmethod
    def ppf(q, loc=0.0, scale=1.0):
        return loc + scale * _ND.inv_cdf(q)

    @staticmethod
    def cdf(x, loc=0.0, scale=1.0):
        return _ND.cdf((x - loc) / scale)


class laplace:  # noqa: N801
    @staticmethod
    def ppf(q, loc=0.0, scale=1.0):
        if q < 0.5:
            return loc + scale * math.log(2.0 * q)
        return loc - scale * math.log(2.0 * (1.0 - q))


def chisquare(*args, **kwargs):
    raise NotImplementedError("scipy shim: chisquare unavailable")


def kstest(*args, **kwargs):
    raise NotImplementedError("scipy shim: kstest unavailable")
