"""Input-validation helpers (reference ``utils/validation.py``):
groupby-domain checks and ExactNumber range checks with the same
error behavior."""

from __future__ import annotations

from typing import Any, Mapping, Optional

from ..domains import SparkDataFrameDomain
from ..exact_number import ExactNumber, ExactNumberInput


def validate_groupby_domains(
    groupby_domains: Mapping[str, Any],
    input_domain: SparkDataFrameDomain,
) -> None:
    """Raise ``ValueError`` unless every column's domain is non-empty,
    duplicate-free, and contains only values valid for that column in
    ``input_domain`` (reference ``utils/validation.py:19-55``)."""
    for column, domain in groupby_domains.items():
        if column not in input_domain.schema:
            raise ValueError(f"Column '{column}' is not in the input domain")
        if not domain:
            raise ValueError(f"Domain for '{column}' is empty!")
        desc = input_domain.schema[column]
        seen = set()
        for key in domain:
            if key in seen:
                raise ValueError(f"Domain for '{column}' contains duplicates.")
            seen.add(key)
            if not desc.valid_py_value(key):
                raise ValueError(
                    f"Groupby key '{key}' is invalid for column's '{column}' "
                    f"domain {desc}."
                )


def validate_exact_number(
    value: ExactNumberInput,
    allow_nonintegral: bool = True,
    minimum: Optional[ExactNumberInput] = None,
    minimum_is_inclusive: bool = True,
    maximum: Optional[ExactNumberInput] = None,
    maximum_is_inclusive: bool = True,
) -> None:
    """Raise ``ValueError`` unless ``value`` satisfies the integrality
    and range conditions (reference ``utils/validation.py:58-150``)."""
    x = ExactNumber(value)
    if not allow_nonintegral and not x.is_integer:
        raise ValueError(f"{x} is not an integer")
    if minimum is not None:
        lo = ExactNumber(minimum)
        if minimum_is_inclusive:
            if not x >= lo:
                raise ValueError(f"{x} is not greater than or equal to {lo}")
        elif not x > lo:
            raise ValueError(f"{x} is not strictly greater than {lo}")
    if maximum is not None:
        hi = ExactNumber(maximum)
        if maximum_is_inclusive:
            if not x <= hi:
                raise ValueError(f"{x} is not less than or equal to {hi}")
        elif not x < hi:
            raise ValueError(f"{x} is not strictly less than {hi}")
