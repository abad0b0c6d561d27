"""Row-level relational transformations (stability 1).

Filter / Select / Rename / Identity / Drop* / Replace* /
AddUniqueColumn / Persist / Unpersist / SparkAction — each a thin,
metric-preserving wrapper over a single declarative DataFrame op, so
Catalyst sees one fused plan across a chain (predicate pushdown,
column pruning and codegen all apply).

Parity targets in the reference: ``transformations/spark_transformations/
filter.py:24``, ``select.py:30``, ``rename.py:32``, ``nan.py:37-1099``,
``id.py:28``, ``persist.py:22-139``, ``identity.py:15``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import Transformation
from ..domains import (
    SparkColumnDescriptor,
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkStringColumnDescriptor,
)
from ..metrics import (
    HammingDistance,
    IfGroupedBy,
    Metric,
    SymmetricDifference,
)


def _check_row_metric(
    metric: Metric,
    allow_hamming: bool = True,
) -> None:
    """Validate a metric for a row-level op.

    IfGroupedBy is accepted with any inner aggregation of
    SymmetricDifference (per-group distances are preserved by
    row-local ops).
    """
    if isinstance(metric, SymmetricDifference):
        return
    if isinstance(metric, HammingDistance):
        if allow_hamming:
            return
        raise ValueError(f"{type(metric).__name__} not supported for this op")
    if isinstance(metric, IfGroupedBy):
        return
    raise ValueError(f"Unsupported metric for row-level op: {metric!r}")


class _RowOp(Transformation):
    """Shared base: same metric in and out, stability = identity."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        output_domain: SparkDataFrameDomain,
    ):
        super().__init__(input_domain, metric, output_domain, metric)

    def stability_function(self, d_in: Any) -> Any:
        self.input_metric.validate(d_in)
        return d_in


class Identity(_RowOp):
    """No-op transformation."""

    def __init__(self, domain: SparkDataFrameDomain, metric: Metric):
        super().__init__(domain, metric, domain)

    def __call__(self, data: DataFrame) -> DataFrame:
        return data


class Filter(_RowOp):
    """Keep rows satisfying a Spark SQL boolean expression.

    The expression is validated at construction time by resolving it
    against an empty DataFrame with the input schema, so malformed
    predicates fail at plan-build rather than execution.
    """

    def __init__(
        self,
        domain: SparkDataFrameDomain,
        metric: Metric,
        filter_expr: str,
    ):
        _check_row_metric(metric, allow_hamming=False)
        super().__init__(domain, metric, domain)
        self.filter_expr = filter_expr
        self._validate_expr()

    def _validate_expr(self) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.active()
        empty = spark.createDataFrame([], self.input_domain.spark_schema)
        try:
            empty.filter(self.filter_expr).schema  # forces analysis
        except Exception as exc:
            raise ValueError(f"Invalid filter expression {self.filter_expr!r}: {exc}") from exc

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.filter(self.filter_expr)


class Select(_RowOp):
    """Project to a subset of columns (no expressions)."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        columns: List[str],
    ):
        _check_row_metric(metric)
        if len(set(columns)) != len(columns):
            raise ValueError(f"Duplicate columns in select: {columns}")
        missing = [c for c in columns if c not in input_domain.schema]
        if missing:
            raise ValueError(f"Columns not in domain: {missing}")
        if isinstance(metric, IfGroupedBy) and metric.column not in columns:
            raise ValueError(
                f"Cannot drop grouping column {metric.column!r} under IfGroupedBy"
            )
        super().__init__(input_domain, metric, input_domain.project(columns))
        self.columns = list(columns)

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.select(*self.columns)


class Rename(_RowOp):
    """Rename columns via a mapping (non-mapped columns unchanged)."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        rename_mapping: Mapping[str, str],
    ):
        _check_row_metric(metric)
        missing = [c for c in rename_mapping if c not in input_domain.schema]
        if missing:
            raise ValueError(f"Columns not in domain: {missing}")
        new_names = [rename_mapping.get(c, c) for c in input_domain.columns]
        if len(set(new_names)) != len(new_names):
            raise ValueError(f"Rename would produce duplicate columns: {new_names}")
        out_metric = metric
        if isinstance(metric, IfGroupedBy) and metric.column in rename_mapping:
            out_metric = IfGroupedBy(
                rename_mapping[metric.column], metric.inner_metric
            )
        out_domain = SparkDataFrameDomain(
            {
                rename_mapping.get(c, c): d
                for c, d in input_domain.schema.items()
            }
        )
        Transformation.__init__(self, input_domain, metric, out_domain, out_metric)
        self.rename_mapping = dict(rename_mapping)

    def stability_function(self, d_in: Any) -> Any:
        self.input_metric.validate(d_in)
        return d_in

    def __call__(self, data: DataFrame) -> DataFrame:
        cols = [
            F.col(c).alias(self.rename_mapping.get(c, c)) for c in data.columns
        ]
        return data.select(*cols)


def _float_columns(domain: SparkDataFrameDomain, columns: List[str]) -> None:
    for c in columns:
        if c not in domain.schema:
            raise ValueError(f"Column {c!r} not in domain")
        if not isinstance(domain.schema[c], SparkFloatColumnDescriptor):
            raise ValueError(f"Column {c!r} is not a float column")


class DropInfs(_RowOp):
    """Drop rows with ±inf in any of the given float columns."""

    def __init__(self, input_domain: SparkDataFrameDomain, metric: Metric, columns: List[str]):
        _check_row_metric(metric, allow_hamming=False)
        _float_columns(input_domain, columns)
        out_schema = dict(input_domain.schema)
        for c in columns:
            d = out_schema[c]
            out_schema[c] = SparkFloatColumnDescriptor(
                allow_null=d.allow_null, allow_nan=d.allow_nan, allow_inf=False, size=d.size
            )
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.columns = list(columns)

    def __call__(self, data: DataFrame) -> DataFrame:
        cond = None
        for c in self.columns:
            clause = ~F.col(c).isin(float("inf"), float("-inf"))
            cond = clause if cond is None else cond & clause
        return data.filter(cond) if cond is not None else data


class DropNaNs(_RowOp):
    """Drop rows with NaN in any of the given float columns."""

    def __init__(self, input_domain: SparkDataFrameDomain, metric: Metric, columns: List[str]):
        _check_row_metric(metric, allow_hamming=False)
        _float_columns(input_domain, columns)
        out_schema = dict(input_domain.schema)
        for c in columns:
            d = out_schema[c]
            out_schema[c] = SparkFloatColumnDescriptor(
                allow_null=d.allow_null, allow_nan=False, allow_inf=d.allow_inf, size=d.size
            )
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.columns = list(columns)

    def __call__(self, data: DataFrame) -> DataFrame:
        cond = None
        for c in self.columns:
            clause = ~F.isnan(F.col(c))
            cond = clause if cond is None else cond & clause
        return data.filter(cond) if cond is not None else data


class DropNulls(_RowOp):
    """Drop rows with null in any of the given columns."""

    def __init__(self, input_domain: SparkDataFrameDomain, metric: Metric, columns: List[str]):
        _check_row_metric(metric, allow_hamming=False)
        for c in columns:
            if c not in input_domain.schema:
                raise ValueError(f"Column {c!r} not in domain")
        import dataclasses

        out_schema = dict(input_domain.schema)
        for c in columns:
            out_schema[c] = dataclasses.replace(out_schema[c], allow_null=False)
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.columns = list(columns)

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.na.drop(subset=self.columns)


class ReplaceInfs(_RowOp):
    """Replace ±inf per column with (lower, upper) replacement values."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        replace_map: Mapping[str, tuple],
    ):
        _check_row_metric(metric)
        _float_columns(input_domain, list(replace_map))
        out_schema = dict(input_domain.schema)
        for c in replace_map:
            d = out_schema[c]
            out_schema[c] = SparkFloatColumnDescriptor(
                allow_null=d.allow_null, allow_nan=d.allow_nan, allow_inf=False, size=d.size
            )
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.replace_map = {k: (float(v[0]), float(v[1])) for k, v in replace_map.items()}

    def __call__(self, data: DataFrame) -> DataFrame:
        out = data
        for c, (lo, hi) in self.replace_map.items():
            out = out.withColumn(
                c,
                F.when(F.col(c) == float("-inf"), F.lit(lo))
                .when(F.col(c) == float("inf"), F.lit(hi))
                .otherwise(F.col(c)),
            )
        return out


class ReplaceNaNs(_RowOp):
    """Replace NaN per column with a value."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        replace_map: Mapping[str, Any],
    ):
        _check_row_metric(metric)
        _float_columns(input_domain, list(replace_map))
        out_schema = dict(input_domain.schema)
        for c in replace_map:
            d = out_schema[c]
            out_schema[c] = SparkFloatColumnDescriptor(
                allow_null=d.allow_null, allow_nan=False, allow_inf=d.allow_inf, size=d.size
            )
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.replace_map = dict(replace_map)

    def __call__(self, data: DataFrame) -> DataFrame:
        out = data
        for c, v in self.replace_map.items():
            out = out.withColumn(
                c, F.when(F.isnan(F.col(c)), F.lit(v)).otherwise(F.col(c))
            )
        return out


class ReplaceNulls(_RowOp):
    """Replace null per column with a value."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        replace_map: Mapping[str, Any],
    ):
        _check_row_metric(metric)
        import dataclasses

        for c in replace_map:
            if c not in input_domain.schema:
                raise ValueError(f"Column {c!r} not in domain")
        if isinstance(metric, IfGroupedBy) and metric.column in replace_map:
            raise ValueError("Cannot replace nulls in the IfGroupedBy column")
        out_schema = dict(input_domain.schema)
        for c in replace_map:
            out_schema[c] = dataclasses.replace(out_schema[c], allow_null=False)
        super().__init__(input_domain, metric, SparkDataFrameDomain(out_schema))
        self.replace_map = dict(replace_map)

    def __call__(self, data: DataFrame) -> DataFrame:
        out = data
        for c, v in self.replace_map.items():
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
        return out


class AddUniqueColumn(Transformation):
    """Add a deterministic unique string ID per row.

    ID = sha2 over a JSON encoding of all columns plus a within-
    duplicate rank, so identical rows get distinct IDs but the mapping
    is stable across runs and input orderings (reference ``id.py:28``).
    Converts ``SymmetricDifference`` into ``IfGroupedBy(column,
    SymmetricDifference)`` — each original row becomes its own group.
    """

    def __init__(self, input_domain: SparkDataFrameDomain, column: str):
        if column in input_domain.schema:
            raise ValueError(f"Column {column!r} already exists")
        out_schema = dict(input_domain.schema)
        out_schema[column] = SparkStringColumnDescriptor(allow_null=False)
        super().__init__(
            input_domain,
            SymmetricDifference(),
            SparkDataFrameDomain(out_schema),
            IfGroupedBy(column, SymmetricDifference()),
        )
        self.column = column

    def stability_function(self, d_in: Any) -> Any:
        self.input_metric.validate(d_in)
        return d_in

    def __call__(self, data: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        cols = data.columns
        payload = F.to_json(F.struct(*[F.col(c) for c in cols]))
        w = Window.partitionBy(*cols).orderBy(F.lit(1))
        return data.withColumn(
            self.column,
            F.sha2(
                F.concat(payload, F.lit("#"), F.row_number().over(w).cast("string")),
                256,
            ),
        )


class Persist(_RowOp):
    """Mark the DataFrame for caching (lazy until an action runs)."""

    def __init__(self, domain: SparkDataFrameDomain, metric: Metric):
        super().__init__(domain, metric, domain)

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.persist()


class Unpersist(_RowOp):
    """Release a cached DataFrame."""

    def __init__(self, domain: SparkDataFrameDomain, metric: Metric):
        super().__init__(domain, metric, domain)

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.unpersist()


class SparkAction(_RowOp):
    """Force materialization (pairs with Persist)."""

    def __init__(self, domain: SparkDataFrameDomain, metric: Metric):
        super().__init__(domain, metric, domain)

    def __call__(self, data: DataFrame) -> DataFrame:
        data.count()
        return data
