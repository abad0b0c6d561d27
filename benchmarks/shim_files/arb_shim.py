"""Float-backed Arb shim (exact ctypes Arb unavailable: no compiled
libarb in this environment).  Midpoints only, radius ignored; to_float
always succeeds, so precision-doubling sampler loops terminate on the
first iteration.  This makes the reference FASTER than its real
Arb-backed implementation — benchmark ratios derived from it are an
upper bound on the rebuild/reference ratio.
"""
import math
from statistics import NormalDist

_ND = NormalDist()


class Arb:
    __slots__ = ("_mid",)

    def __init__(self, mid: float):
        self._mid = float(mid)

    @staticmethod
    def from_float(x) -> "Arb":
        return Arb(x)

    @staticmethod
    def from_int(x) -> "Arb":
        return Arb(float(x))

    @staticmethod
    def from_man_exp(man, exp) -> "Arb":
        try:
            return Arb(math.ldexp(float(man), int(exp)))
        except OverflowError:
            return Arb(float(man) * (2.0 ** int(exp)))

    @staticmethod
    def from_midpoint_radius(mid, rad) -> "Arb":
        m = mid._mid if isinstance(mid, Arb) else float(mid)
        return Arb(m)

    def to_float(self, prec=None) -> float:
        return self._mid

    def is_nan(self) -> bool:
        return math.isnan(self._mid)

    def is_finite(self) -> bool:
        return math.isfinite(self._mid)

    def is_exact(self) -> bool:
        return True

    def midpoint(self) -> "Arb":
        return self

    def radius(self) -> "Arb":
        return Arb(0.0)

    def __lt__(self, other):
        return self._mid < other._mid

    def __le__(self, other):
        return self._mid <= other._mid

    def __gt__(self, other):
        return self._mid > other._mid

    def __ge__(self, other):
        return self._mid >= other._mid

    def __eq__(self, other):
        if not isinstance(other, Arb):
            return NotImplemented
        return self._mid == other._mid

    def __hash__(self):
        return hash(self._mid)

    def __neg__(self):
        return Arb(-self._mid)

    def __repr__(self):
        return f"Arb({self._mid})"


def _f(x):
    return x._mid if isinstance(x, Arb) else float(x)


def arb_add(a, b, prec=None):
    return Arb(_f(a) + _f(b))


def arb_sub(a, b, prec=None):
    return Arb(_f(a) - _f(b))


def arb_mul(a, b, prec=None):
    return Arb(_f(a) * _f(b))


def arb_div(a, b, prec=None):
    return Arb(_f(a) / _f(b))


def arb_neg(a, prec=None):
    return Arb(-_f(a))


def arb_abs(a, prec=None):
    return Arb(abs(_f(a)))


def arb_log(a, prec=None):
    v = _f(a)
    return Arb(math.log(v) if v > 0 else float("-inf"))


def arb_exp(a, prec=None):
    return Arb(math.exp(_f(a)))


def arb_sqrt(a, prec=None):
    return Arb(math.sqrt(_f(a)))


def arb_pow(a, b, prec=None):
    return Arb(_f(a) ** _f(b))


def arb_max(a, b, prec=None):
    return Arb(max(_f(a), _f(b)))


def arb_min(a, b, prec=None):
    return Arb(min(_f(a), _f(b)))


def arb_sgn(a, prec=None):
    v = _f(a)
    return Arb((v > 0) - (v < 0))


def arb_sum(items, prec=None):
    return Arb(sum(_f(x) for x in items))


def arb_product(items, prec=None):
    out = 1.0
    for x in items:
        out *= _f(x)
    return Arb(out)


def arb_union(a, b, prec=None):
    return Arb((_f(a) + _f(b)) / 2.0)


def arb_erf(a, prec=None):
    return Arb(math.erf(_f(a)))


def arb_erfc(a, prec=None):
    return Arb(math.erfc(_f(a)))


def arb_erfinv(a, prec=None):
    # erfinv(x) = inv_cdf((x+1)/2) / sqrt(2)
    return Arb(_ND.inv_cdf((_f(a) + 1.0) / 2.0) / math.sqrt(2.0))


def arb_const_pi(prec=None):
    return Arb(math.pi)


def arb_lambertw(a, prec=None):
    # Newton iteration on w * e^w = x (principal branch)
    x = _f(a)
    w = math.log1p(x) if x > -0.3 else 0.0
    for _ in range(64):
        ew = math.exp(w)
        f = w * ew - x
        w -= f / (ew * (w + 1) - (w + 2) * f / (2 * w + 2))
    return Arb(w)
