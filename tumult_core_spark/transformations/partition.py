"""Partition transformations: split one DataFrame into a list by key.

``PartitionByKeys`` yields one (lazy) filtered DataFrame per key tuple;
the output metric aggregates per-partition distances with ``SumOf`` or
``RootSumOfSquared`` (partitions are disjoint, so stability = d_in).
Parity: reference ``transformations/spark_transformations/partition.py:27-270``.

Each partition is a predicate filter over the same source, so Catalyst
pushes the partition predicate into the scan; with a partitioned /
bucketed source this becomes partition pruning rather than a full read
per partition.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import Transformation
from ..domains import ListDomain, SparkDataFrameDomain
from ..exact_number import ExactNumber
from ..metrics import (
    IfGroupedBy,
    Metric,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)


class PartitionByKeys(Transformation):
    """Split into one DataFrame per key-tuple in ``keys`` order."""

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: Metric,
        use_l2: bool,
        keys: List[str],
        list_values: Sequence[Tuple],
    ):
        for c in keys:
            if c not in input_domain.schema:
                raise ValueError(f"Partition key {c!r} not in domain")
        if not isinstance(input_metric, (SymmetricDifference, IfGroupedBy)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        seen = set()
        for v in list_values:
            t = tuple(v)
            if len(t) != len(keys):
                raise ValueError(f"Key tuple {t} arity != {len(keys)}")
            if t in seen:
                raise ValueError(f"Duplicate partition key {t}")
            seen.add(t)
        output_metric = (
            RootSumOfSquared(SymmetricDifference())
            if use_l2
            else SumOf(SymmetricDifference())
        )
        super().__init__(
            input_domain,
            input_metric,
            ListDomain(input_domain, length=len(list_values)),
            output_metric,
        )
        self.keys = list(keys)
        self.list_values = [tuple(v) for v in list_values]

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: DataFrame) -> List[DataFrame]:
        out = []
        for values in self.list_values:
            cond = None
            for c, v in zip(self.keys, values):
                clause = F.col(c).eqNullSafe(F.lit(v))
                cond = clause if cond is None else cond & clause
            out.append(data.filter(cond))
        return out
