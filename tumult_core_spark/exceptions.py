"""Typed exception hierarchy matching the reference's public surface
(reference ``exceptions.py:22-240``) so user code that catches the
reference's exception classes keeps working here.

Every class subclasses the builtin this package historically raised at
the corresponding site (``ValueError`` / ``TypeError``), so existing
``except ValueError`` handlers keep catching them too.
``OutOfDomainError`` lives in :mod:`tumult_core_spark.domains` and
``UnsupportedSympyExprError`` in :mod:`tumult_core_spark.exact_number`
(they predate this module / avoid an import cycle), as does
``InsufficientBudgetError`` in :mod:`tumult_core_spark.measures`
(reference ``measures.py:20``); all are re-exported here for parity.  The base classes deliberately differ from the
reference where the reference subclasses ``Exception`` directly — see
LIMITATIONS.md "Exception base classes".
"""

from __future__ import annotations

from .domains import OutOfDomainError
from .exact_number import UnsupportedSympyExprError
from .measures import InsufficientBudgetError

__all__ = [
    "OutOfDomainError",
    "UnsupportedSympyExprError",
    "InsufficientBudgetError",
    "DomainMismatchError",
    "UnsupportedDomainError",
    "DomainKeyError",
    "DomainColumnError",
    "UnsupportedMetricError",
    "MetricMismatchError",
    "UnsupportedCombinationError",
    "UnsupportedMeasureError",
    "MeasureMismatchError",
    "UnsupportedNoiseMechanismError",
]


class DomainMismatchError(ValueError):
    """Two or more domains should match but don't (chaining, joins)."""


class UnsupportedDomainError(TypeError):
    """The given domain type is not supported by this component."""


class DomainKeyError(KeyError):
    """A key is not present in the given dict domain."""


class DomainColumnError(ValueError):
    """A column is not present in the given domain's schema."""


class UnsupportedMetricError(ValueError):
    """The given metric is not supported by this component."""


class MetricMismatchError(ValueError):
    """Two or more metrics should match but don't (chaining)."""


class UnsupportedCombinationError(ValueError):
    """The given combination of domain/metric/measure is unsupported."""


class UnsupportedMeasureError(ValueError):
    """The given output measure is not supported by this component."""


class MeasureMismatchError(ValueError):
    """Two or more measures should match but don't (composition)."""


class UnsupportedNoiseMechanismError(ValueError):
    """The requested noise mechanism cannot be used here."""
