"""Shared helpers for the oracle fixture generators.

One rounding convention on BOTH sides of every pinned float: the
Spark queries round displayed floats with ``F.round`` (Catalyst
``Round``, which is ``BigDecimal.valueOf(d).setScale(n, HALF_UP)`` —
``valueOf`` goes through ``Double.toString``'s shortest decimal
representation, and HALF_UP rounds ties away from zero), while the
builtin Python ``round()`` / ``np.round`` are banker's rounding
(ties-to-even).  An exact decimal tie at the pinned precision would
therefore hash-mismatch — negligible probability for float64
statistics, but silent.  ``round_half_up`` reproduces the Spark/Java
semantics exactly: quantize the shortest-repr decimal with
ROUND_HALF_UP.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, ndigits: int) -> float:
    """Round like Spark's ``F.round(col, ndigits)`` on a double."""
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
