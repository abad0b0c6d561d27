"""Privacy measures and budgets.

A *measure* names the currency in which a randomized computation's
privacy loss is denominated; a *budget* is an amount of that currency.
Pure driver-side Python — mirrors the semantics of the reference's
``tmlt/core/measures.py:84-448`` (PureDP / ApproxDP / RhoZCDP).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Tuple, Union

from .exact_number import ExactNumber, ExactNumberInput


class Measure(ABC):
    """Base class for privacy measures."""

    @abstractmethod
    def validate(self, value: Any) -> None:
        """Raise ValueError if ``value`` is not a valid distance."""

    @abstractmethod
    def compare(self, value1: Any, value2: Any) -> bool:
        """Return True iff ``value1`` is at most ``value2`` (tighter-or-equal)."""

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other)

    def __hash__(self) -> int:
        return hash(type(self))

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class PureDP(Measure):
    """Pure differential privacy; distance = epsilon >= 0."""

    def validate(self, value: Any) -> None:
        v = ExactNumber(value)
        if v < 0:
            raise ValueError(f"epsilon must be non-negative, got {v}")

    def compare(self, value1: Any, value2: Any) -> bool:
        return ExactNumber(value1) <= ExactNumber(value2)


class ApproxDP(Measure):
    """Approximate DP; distance = (epsilon, delta), 0 <= delta <= 1."""

    def validate(self, value: Any) -> None:
        eps, delta = _as_pair(value)
        if eps < 0:
            raise ValueError(f"epsilon must be non-negative, got {eps}")
        if delta < 0 or delta > 1:
            raise ValueError(f"delta must be in [0, 1], got {delta}")

    def compare(self, value1: Any, value2: Any) -> bool:
        e1, d1 = _as_pair(value1)
        e2, d2 = _as_pair(value2)
        return e1 <= e2 and d1 <= d2


class RhoZCDP(Measure):
    """Zero-concentrated DP; distance = rho >= 0."""

    def validate(self, value: Any) -> None:
        v = ExactNumber(value)
        if v < 0:
            raise ValueError(f"rho must be non-negative, got {v}")

    def compare(self, value1: Any, value2: Any) -> bool:
        return ExactNumber(value1) <= ExactNumber(value2)


def _as_pair(value: Any) -> Tuple[ExactNumber, ExactNumber]:
    if not isinstance(value, (tuple, list)) or len(value) != 2:
        raise ValueError(f"ApproxDP distance must be an (epsilon, delta) pair, got {value!r}")
    return ExactNumber(value[0]), ExactNumber(value[1])


# ---------------------------------------------------------------------------
# Budgets — user-facing wrappers with arithmetic used by the accountant.
# ---------------------------------------------------------------------------


class InsufficientBudgetError(ValueError):
    """An operation requested more privacy budget than remains.

    Raised by budget subtraction and by the interactive accountant /
    queryables when a query's cost exceeds the remaining budget
    (reference ``measures.py:20-52``, raised at
    ``measures.py:356,423,486``).  Subclasses ``ValueError`` so
    pre-existing ``except ValueError`` handlers keep catching it.
    """

    def __init__(
        self, remaining_budget: "PrivacyBudget", requested_budget: "PrivacyBudget"
    ):
        self._remaining_budget = remaining_budget
        self._requested_budget = requested_budget
        super().__init__(
            f"The remaining privacy budget is {remaining_budget}, which "
            f"is insufficient given the requested budget {requested_budget}."
        )

    @property
    def remaining_budget(self) -> "PrivacyBudget":
        """The budget that was available."""
        return self._remaining_budget

    @property
    def requested_budget(self) -> "PrivacyBudget":
        """The budget the operation asked for."""
        return self._requested_budget


class PrivacyBudget(ABC):
    """An amount of privacy loss in a particular measure."""

    @property
    @abstractmethod
    def measure(self) -> Measure: ...

    @property
    @abstractmethod
    def value(self) -> Any: ...

    @abstractmethod
    def is_finite(self) -> bool: ...

    @abstractmethod
    def subtract(self, other: "PrivacyBudget") -> "PrivacyBudget": ...

    @abstractmethod
    def can_spend(self, other: "PrivacyBudget") -> bool: ...

    def assert_can_spend_budget(self, other: "PrivacyBudget") -> None:
        """Raise :class:`InsufficientBudgetError` unless ``other`` fits
        within this budget (reference ``measures.py:289,348,413,478``)."""
        if not self.can_spend(other):
            raise InsufficientBudgetError(self, other)

    @staticmethod
    def cast(measure: Measure, value: Any) -> "PrivacyBudget":
        if isinstance(measure, PureDP):
            return PureDPBudget(value)
        if isinstance(measure, ApproxDP):
            if isinstance(value, (tuple, list)):
                return ApproxDPBudget(value[0], value[1])
            return ApproxDPBudget(value, 0)
        if isinstance(measure, RhoZCDP):
            return RhoZCDPBudget(value)
        raise ValueError(f"Unknown measure: {measure}")

    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and self.value == other.value
        )

    def __hash__(self) -> int:
        return hash((type(self), str(self.value)))


class PureDPBudget(PrivacyBudget):
    """epsilon budget under PureDP."""

    def __init__(self, epsilon: ExactNumberInput):
        self._epsilon = ExactNumber(epsilon)
        PureDP().validate(self._epsilon)

    @property
    def measure(self) -> Measure:
        return PureDP()

    @property
    def value(self) -> ExactNumber:
        return self._epsilon

    @property
    def epsilon(self) -> ExactNumber:
        return self._epsilon

    def is_finite(self) -> bool:
        return self._epsilon.is_finite

    def subtract(self, other: "PrivacyBudget") -> "PureDPBudget":
        self.assert_can_spend_budget(other)
        if not self.is_finite():
            return PureDPBudget(self._epsilon)
        return PureDPBudget(self._epsilon - other.value)

    def can_spend(self, other: "PrivacyBudget") -> bool:
        if not isinstance(other, PureDPBudget):
            raise ValueError("Budget measures do not match")
        return not self.is_finite() or other.value <= self._epsilon

    def __repr__(self) -> str:
        return f"PureDPBudget({self._epsilon})"


class ApproxDPBudget(PrivacyBudget):
    """(epsilon, delta) budget under ApproxDP."""

    def __init__(self, epsilon: ExactNumberInput, delta: ExactNumberInput):
        self._epsilon = ExactNumber(epsilon)
        self._delta = ExactNumber(delta)
        ApproxDP().validate((self._epsilon, self._delta))

    @property
    def measure(self) -> Measure:
        return ApproxDP()

    @property
    def value(self) -> Tuple[ExactNumber, ExactNumber]:
        return (self._epsilon, self._delta)

    @property
    def epsilon(self) -> ExactNumber:
        return self._epsilon

    @property
    def delta(self) -> ExactNumber:
        return self._delta

    def is_finite(self) -> bool:
        # (inf, _) or (_, 1) provides no privacy guarantee.
        return self._epsilon.is_finite and self._delta < 1

    def subtract(self, other: "PrivacyBudget") -> "ApproxDPBudget":
        self.assert_can_spend_budget(other)
        if not self.is_finite():
            return ApproxDPBudget(self._epsilon, self._delta)
        oe, od = other.value
        return ApproxDPBudget(self._epsilon - oe, self._delta - od)

    def can_spend(self, other: "PrivacyBudget") -> bool:
        if not isinstance(other, ApproxDPBudget):
            raise ValueError("Budget measures do not match")
        if not self.is_finite():
            return True
        oe, od = other.value
        return oe <= self._epsilon and od <= self._delta

    def __repr__(self) -> str:
        return f"ApproxDPBudget({self._epsilon}, {self._delta})"


class RhoZCDPBudget(PrivacyBudget):
    """rho budget under zCDP."""

    def __init__(self, rho: ExactNumberInput):
        self._rho = ExactNumber(rho)
        RhoZCDP().validate(self._rho)

    @property
    def measure(self) -> Measure:
        return RhoZCDP()

    @property
    def value(self) -> ExactNumber:
        return self._rho

    @property
    def rho(self) -> ExactNumber:
        return self._rho

    def is_finite(self) -> bool:
        return self._rho.is_finite

    def subtract(self, other: "PrivacyBudget") -> "RhoZCDPBudget":
        self.assert_can_spend_budget(other)
        if not self.is_finite():
            return RhoZCDPBudget(self._rho)
        return RhoZCDPBudget(self._rho - other.value)

    def can_spend(self, other: "PrivacyBudget") -> bool:
        if not isinstance(other, RhoZCDPBudget):
            raise ValueError("Budget measures do not match")
        return not self.is_finite() or other.value <= self._rho

    def __repr__(self) -> str:
        return f"RhoZCDPBudget({self._rho})"
