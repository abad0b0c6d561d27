"""Row-local derived-column transformation (JVM expression).

The reference realizes "map each value to its deviation from the
bounds midpoint" (average / variance recipes, ``aggregations.py:829+``)
with a Python row ``Map``; here it is a declarative Spark SQL
expression instead, so the whole average/variance pipeline stays inside
WholeStageCodegen with zero Python crossings before the noise UDF.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import Transformation
from ..domains import SparkColumnDescriptor, SparkDataFrameDomain
from ..metrics import Metric
from .rows import _check_row_metric


class DeriveColumn(Transformation):
    """Append one column computed from a row-local SQL expression.

    Stability 1: each output row is a function of its input row alone,
    so dataset distances are preserved.  The caller supplies the output
    descriptor (the expression's type is checked against it at
    construction by resolving over an empty frame).
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        metric: Metric,
        column: str,
        expr_sql: str,
        output_descriptor: SparkColumnDescriptor,
    ):
        _check_row_metric(metric)
        if column in input_domain.schema:
            raise ValueError(f"Column {column!r} already exists")
        out_schema = dict(input_domain.schema)
        out_schema[column] = output_descriptor
        super().__init__(
            input_domain, metric, SparkDataFrameDomain(out_schema), metric
        )
        self.column = column
        self.expr_sql = expr_sql
        self._validate_expr()

    def _validate_expr(self) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.active()
        empty = spark.createDataFrame([], self.input_domain.spark_schema)
        try:
            derived = empty.withColumn(self.column, F.expr(self.expr_sql))
        except Exception as exc:
            raise ValueError(f"Invalid expression {self.expr_sql!r}: {exc}") from exc
        actual = derived.schema[self.column].dataType
        expected = self.output_domain[self.column].data_type()
        if actual != expected:
            raise ValueError(
                f"Expression type {actual} != declared descriptor type {expected}"
            )

    def stability_function(self, d_in: Any) -> Any:
        self.input_metric.validate(d_in)
        return d_in

    def __call__(self, data: DataFrame) -> DataFrame:
        return data.withColumn(self.column, F.expr(self.expr_sql))
