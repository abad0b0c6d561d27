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


class Partition(Transformation):
    """Base for transformations splitting one dataset into a disjoint
    list (reference ``partition.py:27-76``).

    Subclasses implement ``__call__`` producing ``num_partitions``
    DataFrames whose rows partition the input; because the pieces are
    disjoint, one changed input row changes one piece, so stability
    under a ``SumOf`` / ``RootSumOfSquared`` output metric is ``d_in``.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        input_metric: Metric,
        use_l2: bool,
        num_partitions: int = None,
    ):
        if not isinstance(input_metric, (SymmetricDifference, IfGroupedBy)):
            raise ValueError(f"Unsupported metric {input_metric!r}")
        output_metric = (
            RootSumOfSquared(SymmetricDifference())
            if use_l2
            else SumOf(SymmetricDifference())
        )
        super().__init__(
            input_domain,
            input_metric,
            ListDomain(input_domain, length=num_partitions),
            output_metric,
        )
        self.num_partitions = num_partitions

    def stability_function(self, d_in: Any) -> ExactNumber:
        self.input_metric.validate(d_in)
        return ExactNumber(d_in)

    def __call__(self, data: DataFrame) -> List[DataFrame]:
        raise NotImplementedError


class PartitionByKeys(Partition):
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
        seen = set()
        for v in list_values:
            t = tuple(v)
            if len(t) != len(keys):
                raise ValueError(f"Key tuple {t} arity != {len(keys)}")
            if t in seen:
                raise ValueError(f"Duplicate partition key {t}")
            seen.add(t)
        super().__init__(
            input_domain, input_metric, use_l2, num_partitions=len(list_values)
        )
        self.keys = list(keys)
        self.list_values = [tuple(v) for v in list_values]

    def __call__(self, data: DataFrame) -> List[DataFrame]:
        out = []
        for values in self.list_values:
            cond = None
            for c, v in zip(self.keys, values):
                clause = F.col(c).eqNullSafe(F.lit(v))
                cond = clause if cond is None else cond & clause
            out.append(data.filter(cond))
        return out
