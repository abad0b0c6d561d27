"""Exact symbolic numbers for stability / privacy arithmetic.

Distances between datasets and privacy budgets must never suffer float
rounding: ``1/3 + 1/3 + 1/3`` has to equal exactly ``1``.  This module
wraps sympy expressions (rationals, radicals, infinity) in a small
immutable numeric type used by every metric / measure computation on the
driver.  It never touches Spark executors.

Semantics follow the reference implementation's ExactNumber
(``tmlt/core/utils/exact_number.py:251``): construction from int /
Fraction / str / sympy expression, floats admitted only for ±inf,
conservative directed rounding in ``to_float`` / ``from_float``.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Any, Union

import sympy as sp

ExactNumberInput = Union[int, Fraction, str, float, sp.Expr, "ExactNumber"]


class ExactNumber:
    """An immutable exact real number backed by a sympy expression.

    Supports exact rationals (``ExactNumber("2/3")``), radicals
    (``ExactNumber("sqrt(2)")``) and infinities (``ExactNumber(float("inf"))``).
    """

    __slots__ = ("_expr",)

    def __init__(self, value: ExactNumberInput = 0):
        self._expr = _to_sympy(value)

    @property
    def expr(self) -> sp.Expr:
        """The underlying sympy expression."""
        return self._expr

    @property
    def is_finite(self) -> bool:
        return bool(self._expr.is_finite)

    @property
    def is_integer(self) -> bool:
        return bool(self._expr.is_integer)

    @property
    def is_rational(self) -> bool:
        return bool(self._expr.is_rational)

    @staticmethod
    def from_float(value: float, round_up: bool) -> "ExactNumber":
        """Convert a float to an exact number with directed rounding.

        Floats are binary rationals, so the conversion itself is exact;
        ``round_up`` only matters for NaN rejection symmetry with
        :meth:`to_float`.
        """
        if value != value:  # NaN
            raise ValueError("Cannot convert NaN to ExactNumber")
        if value == float("inf"):
            return ExactNumber(sp.oo)
        if value == float("-inf"):
            return ExactNumber(-sp.oo)
        return ExactNumber(sp.Rational(Fraction(value)))

    def to_float(self, round_up: bool) -> float:
        """Convert to float, rounding in the conservative direction.

        ``round_up=True`` never under-estimates; ``round_up=False``
        never over-estimates.  Used when exact noise scales are handed
        to float-based samplers.
        """
        if self._expr == sp.oo:
            return float("inf")
        if self._expr == -sp.oo:
            return float("-inf")
        # 30 significant digits, then nudge one ulp in the safe direction.
        approx = float(self._expr.evalf(30))
        if approx in (float("inf"), float("-inf")):
            # a FINITE value beyond double range (e.g. 10**500):
            # Fraction(inf) below would raise OverflowError.  The
            # conservative double rounds away from zero to the
            # infinity, toward zero to +-DBL_MAX (r17).
            import sys

            toward_inf = (approx > 0) == round_up
            if toward_inf:
                return approx
            return sys.float_info.max if approx > 0 else -sys.float_info.max
        exact_cmp = sp.Rational(Fraction(approx)) if approx == approx else None
        if exact_cmp is None:
            raise ValueError(f"Cannot convert {self._expr} to float")
        import math

        if round_up and sp.Rational(Fraction(approx)) < self._expr:
            approx = math.nextafter(approx, float("inf"))
        elif not round_up and sp.Rational(Fraction(approx)) > self._expr:
            approx = math.nextafter(approx, float("-inf"))
        return approx

    # -- arithmetic ---------------------------------------------------------
    def _coerce(self, other: ExactNumberInput) -> sp.Expr:
        return _to_sympy(other)

    def __add__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._expr + self._coerce(other))

    __radd__ = __add__

    def __sub__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._expr - self._coerce(other))

    def __rsub__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._coerce(other) - self._expr)

    def __mul__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._expr * self._coerce(other))

    __rmul__ = __mul__

    def __truediv__(self, other: ExactNumberInput) -> "ExactNumber":
        o = self._coerce(other)
        if o == sp.S.Zero:
            raise ZeroDivisionError("ExactNumber division by zero")
        return ExactNumber(self._expr / o)

    def __rtruediv__(self, other: ExactNumberInput) -> "ExactNumber":
        if self._expr == sp.S.Zero:
            raise ZeroDivisionError("ExactNumber division by zero")
        return ExactNumber(self._coerce(other) / self._expr)

    def __pow__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._expr ** self._coerce(other))

    def __rpow__(self, other: ExactNumberInput) -> "ExactNumber":
        return ExactNumber(self._coerce(other) ** self._expr)

    def __neg__(self) -> "ExactNumber":
        return ExactNumber(-self._expr)

    def __abs__(self) -> "ExactNumber":
        return ExactNumber(sp.Abs(self._expr))

    def sqrt(self) -> "ExactNumber":
        return ExactNumber(sp.sqrt(self._expr))

    # -- comparisons --------------------------------------------------------
    def __eq__(self, other: Any) -> bool:
        try:
            o = self._coerce(other)
        except (TypeError, ValueError):
            return NotImplemented
        return bool(sp.simplify(self._expr - o) == 0) if self._expr.is_finite and o.is_finite else self._expr == o

    def __ne__(self, other: Any) -> bool:
        result = self.__eq__(other)
        return NotImplemented if result is NotImplemented else not result

    def _compare(self, other: ExactNumberInput, op) -> bool:
        """Order comparison with a symbolic fallback: sympy refuses to
        decide relational truth for structurally complex (e.g. nested
        radical) expressions even when the difference simplifies — as
        with the Bun-Steinke zCDP->ApproxDP epsilon, which is exactly
        the requested epsilon but arrives as
        ``(sqrt(L+e)-sqrt(L))**2 + 2 sqrt(...) sqrt(L)``.  Expand and
        simplify the difference first, then compare against zero."""
        o = self._coerce(other)
        try:
            return bool(op(self._expr, o))
        except TypeError:
            diff = sp.simplify(sp.expand(self._expr - o))
            try:
                return bool(op(diff, sp.Integer(0)))
            except TypeError:
                pass
            # Certified sign determination — this sits on the privacy-
            # accounting path, so an uncertified fixed-precision float
            # must never decide a budget comparison.  `equals(0)` does
            # sympy's own rigorous zero test; otherwise evalf at
            # escalating precision until the magnitude provably clears
            # the error bound (sympy's adaptive evalf is accurate to
            # the requested precision), and refuse rather than guess.
            if diff.equals(0) is True:
                return bool(op(sp.Integer(0), sp.Integer(0)))
            for prec in (50, 200, 1000):
                approx = diff.evalf(prec)
                if approx.is_comparable and abs(approx) > sp.Float(10, 5) ** (
                    -(prec - 10)
                ):
                    return bool(op(approx, 0))
            raise ValueError(
                f"Cannot certify the sign of {self._expr} - {o}: symbolically "
                "undecidable and numerically indistinguishable from zero at "
                "1000 digits"
            )

    def __lt__(self, other: ExactNumberInput) -> bool:
        return self._compare(other, lambda a, b: a < b)

    def __le__(self, other: ExactNumberInput) -> bool:
        return self._compare(other, lambda a, b: a <= b)

    def __gt__(self, other: ExactNumberInput) -> bool:
        return self._compare(other, lambda a, b: a > b)

    def __ge__(self, other: ExactNumberInput) -> bool:
        return self._compare(other, lambda a, b: a >= b)

    def __hash__(self) -> int:
        return hash(self._expr)

    def __repr__(self) -> str:
        return f"ExactNumber({self._expr})"

    def __str__(self) -> str:
        return str(self._expr)


class UnsupportedSympyExprError(ValueError):
    """A sympy expression cannot represent an exact real number
    (free symbols, floats, imaginary parts...).

    Parity with reference ``exceptions.py:248``; subclasses
    ``ValueError`` because that is what these sites historically
    raised, so existing ``except ValueError`` handlers keep working.
    Re-exported from :mod:`tumult_core_spark.exceptions`.
    """


def _to_sympy(value: ExactNumberInput) -> sp.Expr:
    """Validate and convert supported inputs to a sympy expression."""
    if isinstance(value, ExactNumber):
        return value._expr
    if isinstance(value, bool):
        raise ValueError("bool is not a valid ExactNumber input")
    if isinstance(value, int):
        return sp.Integer(value)
    if isinstance(value, Fraction):
        return sp.Rational(value)
    if isinstance(value, float):
        if value == float("inf"):
            return sp.oo
        if value == float("-inf"):
            return -sp.oo
        raise ValueError(
            f"Finite float {value!r} is ambiguous as an exact value; use "
            "ExactNumber.from_float(value, round_up=...) or a Fraction/str."
        )
    if isinstance(value, str):
        expr = sp.sympify(value, rational=True)
        return _check_expr(expr)
    if isinstance(value, sp.Expr):
        return _check_expr(value)
    raise ValueError(f"Unsupported type for ExactNumber: {type(value).__name__}")


def _check_expr(expr: sp.Expr) -> sp.Expr:
    if expr.free_symbols:
        raise UnsupportedSympyExprError(
            f"Expression {expr} contains free symbols"
        )
    if not (expr.is_real or expr in (sp.oo, -sp.oo)):
        raise UnsupportedSympyExprError(
            f"Expression {expr} is not a real number"
        )
    if isinstance(expr, sp.Float):
        raise UnsupportedSympyExprError(
            f"sympy Float {expr} is inexact; use Rational instead"
        )
    return expr
