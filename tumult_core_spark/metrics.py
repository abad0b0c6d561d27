"""Dataset metrics — distances between datasets.

Every transformation carries an input and an output metric; its
stability function bounds how much the output distance can grow per
unit of input distance.  Mirrors the metric algebra of the reference
(``tmlt/core/metrics.py:92-1278``): SymmetricDifference,
HammingDistance, AbsoluteDifference, SumOf / RootSumOfSquared
aggregations, OnColumn(s), IfGroupedBy, DictMetric, AddRemoveKeys,
NullMetric.

Distances are :class:`~.exact_number.ExactNumber` (or dicts/tuples of
them for compound metrics).  ``distance()`` implementations — used by
tests — run real Spark jobs and are expressed with built-in DataFrame
ops only.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Tuple, Union

from .exact_number import ExactNumber


class Metric(ABC):
    """Base class for dataset metrics."""

    @abstractmethod
    def validate(self, value: Any) -> None:
        """Raise ValueError if ``value`` is not a valid distance."""

    @abstractmethod
    def compare(self, value1: Any, value2: Any) -> bool:
        """Return True iff ``value1 <= value2`` under this metric."""

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other)

    def __hash__(self) -> int:
        return hash(repr(self))

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class _NonNegativeScalarMetric(Metric):
    """Shared impl for metrics whose distances are scalars >= 0."""

    def validate(self, value: Any) -> None:
        v = ExactNumber(value)
        if v < 0:
            raise ValueError(f"{type(self).__name__} distance must be >= 0, got {v}")

    def compare(self, value1: Any, value2: Any) -> bool:
        return ExactNumber(value1) <= ExactNumber(value2)


class NullMetric(Metric):
    """Placeholder metric for domains where distance is undefined."""

    def validate(self, value: Any) -> None:
        raise ValueError("NullMetric has no valid distances")

    def compare(self, value1: Any, value2: Any) -> bool:
        raise ValueError("NullMetric cannot compare distances")


class AbsoluteDifference(_NonNegativeScalarMetric):
    """|x - y| for scalar-valued datasets (aggregation outputs)."""

    def distance(self, value1, value2, domain=None) -> ExactNumber:
        from fractions import Fraction

        return ExactNumber(abs(Fraction(int(value1)) - Fraction(int(value2)))) if (
            float(value1).is_integer() and float(value2).is_integer()
        ) else ExactNumber.from_float(abs(float(value1) - float(value2)), round_up=True)


class SymmetricDifference(_NonNegativeScalarMetric):
    """Rows added + rows removed, treating tables as multisets.

    The canonical unbounded-DP neighboring relation: distance 1 =
    one row added or removed.
    """

    def distance(self, df1, df2, domain=None) -> ExactNumber:
        # |A \ B| + |B \ A| over multisets: count per distinct row and
        # sum absolute count differences.  Pure DataFrame ops.
        from pyspark.sql import functions as F

        c1 = df1.groupBy(*df1.columns).agg(F.count(F.lit(1)).alias("__n1"))
        c2 = df2.groupBy(*df2.columns).agg(F.count(F.lit(1)).alias("__n2"))
        joined = c1.join(c2, on=df1.columns, how="full")
        total = joined.select(
            F.sum(
                F.abs(F.coalesce(F.col("__n1"), F.lit(0)) - F.coalesce(F.col("__n2"), F.lit(0)))
            ).alias("d")
        ).first()["d"]
        return ExactNumber(int(total or 0))


class HammingDistance(_NonNegativeScalarMetric):
    """Number of changed rows between equal-cardinality tables (bounded DP)."""

    def distance(self, df1, df2, domain=None) -> ExactNumber:
        if df1.count() != df2.count():
            raise ValueError("HammingDistance requires equal row counts")
        sym = SymmetricDifference().distance(df1, df2)
        # each changed row contributes 2 to symmetric difference
        return ExactNumber(sym.expr / 2)


class SumOf(Metric):
    """L1 aggregation of an inner metric across groups / list elements."""

    def __init__(self, inner_metric: Metric):
        self.inner_metric = inner_metric

    def validate(self, value: Any) -> None:
        v = ExactNumber(value)
        if v < 0:
            raise ValueError(f"SumOf distance must be >= 0, got {v}")

    def compare(self, value1: Any, value2: Any) -> bool:
        return ExactNumber(value1) <= ExactNumber(value2)

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and self.inner_metric == other.inner_metric

    def __hash__(self) -> int:
        return hash((type(self), self.inner_metric))

    def __repr__(self) -> str:
        return f"SumOf({self.inner_metric!r})"


class RootSumOfSquared(SumOf):
    """L2 aggregation of an inner metric (used for zCDP accounting)."""

    def __repr__(self) -> str:
        return f"RootSumOfSquared({self.inner_metric!r})"


class OnColumn(Metric):
    """Apply a (wrapped) scalar metric to one column of a DataFrame."""

    def __init__(self, column: str, metric: Union[SumOf, RootSumOfSquared]):
        self.column = column
        self.metric = metric

    def validate(self, value: Any) -> None:
        self.metric.validate(value)

    def compare(self, value1: Any, value2: Any) -> bool:
        return self.metric.compare(value1, value2)

    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and self.column == other.column
            and self.metric == other.metric
        )

    def __hash__(self) -> int:
        return hash((type(self), self.column, self.metric))

    def __repr__(self) -> str:
        return f"OnColumn({self.column!r}, {self.metric!r})"


class OnColumns(Metric):
    """Tuple of OnColumn metrics applied simultaneously."""

    def __init__(self, on_columns: List[OnColumn]):
        self.on_columns = list(on_columns)

    def validate(self, value: Any) -> None:
        if not isinstance(value, (tuple, list)) or len(value) != len(self.on_columns):
            raise ValueError(f"Expected {len(self.on_columns)}-tuple, got {value!r}")
        for m, v in zip(self.on_columns, value):
            m.validate(v)

    def compare(self, value1: Any, value2: Any) -> bool:
        return all(
            m.compare(v1, v2) for m, v1, v2 in zip(self.on_columns, value1, value2)
        )

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and self.on_columns == other.on_columns

    def __hash__(self) -> int:
        return hash((type(self), tuple(self.on_columns)))

    def __repr__(self) -> str:
        return f"OnColumns({self.on_columns!r})"


class IfGroupedBy(Metric):
    """Distance after grouping by a column.

    ``IfGroupedBy(col, SumOf(SymmetricDifference()))`` bounds the sum
    over groups of within-group symmetric difference — the metric that
    makes per-user contribution bounding expressible.  Grouping on
    float columns is forbidden (cf. reference ``metrics.py:998`` and
    ``spark_domains.py:511-513``).
    """

    def __init__(self, column: str, inner_metric: Metric):
        if not isinstance(inner_metric, (SumOf, RootSumOfSquared, SymmetricDifference)):
            raise ValueError(
                "IfGroupedBy inner metric must be SumOf, RootSumOfSquared, "
                f"or SymmetricDifference; got {inner_metric!r}"
            )
        self.column = column
        self.inner_metric = inner_metric

    def validate(self, value: Any) -> None:
        self.inner_metric.validate(value)

    def compare(self, value1: Any, value2: Any) -> bool:
        return self.inner_metric.compare(value1, value2)

    def __eq__(self, other: Any) -> bool:
        return (
            type(self) is type(other)
            and self.column == other.column
            and self.inner_metric == other.inner_metric
        )

    def __hash__(self) -> int:
        return hash((type(self), self.column, self.inner_metric))

    def __repr__(self) -> str:
        return f"IfGroupedBy({self.column!r}, {self.inner_metric!r})"


class DictMetric(Metric):
    """Per-key metrics over a dict of datasets."""

    def __init__(self, key_to_metric: Dict[Any, Metric]):
        self.key_to_metric = dict(key_to_metric)

    def validate(self, value: Any) -> None:
        if not isinstance(value, dict) or set(value) != set(self.key_to_metric):
            raise ValueError(
                f"Expected dict with keys {set(self.key_to_metric)}, got {value!r}"
            )
        for k, m in self.key_to_metric.items():
            m.validate(value[k])

    def compare(self, value1: Any, value2: Any) -> bool:
        return all(
            m.compare(value1[k], value2[k]) for k, m in self.key_to_metric.items()
        )

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and self.key_to_metric == other.key_to_metric

    def __hash__(self) -> int:
        return hash((type(self), tuple(sorted(self.key_to_metric.items(), key=lambda kv: str(kv[0])))))

    def __getitem__(self, key: Any) -> Metric:
        return self.key_to_metric[key]

    def __repr__(self) -> str:
        return f"DictMetric({self.key_to_metric!r})"


class AddRemoveKeys(Metric):
    """User-level metric over a dict of DataFrames sharing an ID column.

    Distance = number of distinct key values whose associated rows
    differ in any of the tables (reference ``metrics.py:1278``).  The
    per-table key column name is given by ``df_to_key_column``.
    """

    def __init__(self, df_to_key_column: Dict[str, str]):
        self.df_to_key_column = dict(df_to_key_column)

    def validate(self, value: Any) -> None:
        v = ExactNumber(value)
        if v < 0:
            raise ValueError(f"AddRemoveKeys distance must be >= 0, got {v}")

    def compare(self, value1: Any, value2: Any) -> bool:
        return ExactNumber(value1) <= ExactNumber(value2)

    def __eq__(self, other: Any) -> bool:
        return type(self) is type(other) and self.df_to_key_column == other.df_to_key_column

    def __hash__(self) -> int:
        return hash((type(self), tuple(sorted(self.df_to_key_column.items()))))

    def __repr__(self) -> str:
        return f"AddRemoveKeys({self.df_to_key_column!r})"
