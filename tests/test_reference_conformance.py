"""Edge-case conformance against the reference's own unit tests.

Each test mirrors a specific reference test case (cited) that exercises
a semantic corner — special values as keys, zero grouping columns,
empty inputs, null-key stability — rather than the happy path the
oracle queries already pin.  These were verified interactively in
round 7; this file makes them permanent.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from tumult_core_spark.domains import (
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkGroupedDataFrameDomain,
    SparkIntegerColumnDescriptor,
    SparkStringColumnDescriptor,
)
from tumult_core_spark.metrics import (
    IfGroupedBy,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)

INT64 = SparkIntegerColumnDescriptor(size=64)
INT32 = SparkIntegerColumnDescriptor(size=32)
STR = SparkStringColumnDescriptor()


class TestPartitionByKeysConformance:
    def test_special_value_keys(self, spark):
        """NaN/Inf/-Inf/null are all valid partition key values, each
        selecting exactly its rows (reference test_partition.py
        test_partition_by_special_value_keys)."""
        from tumult_core_spark.transformations.partition import PartitionByKeys

        dom = SparkDataFrameDomain(
            {
                "A": SparkFloatColumnDescriptor(
                    allow_null=True, allow_nan=True, allow_inf=True
                ),
                "B": INT64,
            }
        )
        keys = [0.1, float("nan"), float("inf"), float("-inf"), None]
        t = PartitionByKeys(
            dom, SymmetricDifference(), False, ["A"], [(v,) for v in keys]
        )
        sdf = spark.createDataFrame([(v, 1) for v in keys], "A double, B long")
        for key, part in zip(keys, t(sdf)):
            rows = part.collect()
            assert len(rows) == 1 and rows[0].B == 1
            got = rows[0].A
            if key is not None and isinstance(key, float) and math.isnan(key):
                assert isinstance(got, float) and math.isnan(got)
            else:
                assert got == key


class TestCountGroupedConformance:
    def _cg(self):
        from tumult_core_spark.transformations.agg import CountGrouped

        return CountGrouped(
            input_domain=SparkGroupedDataFrameDomain(
                schema={"A": INT64, "B": STR}, groupby_columns=[]
            ),
            input_metric=SumOf(SymmetricDifference()),
            count_column="C",
        )

    def test_zero_groupby_columns_nonempty_data(self, spark):
        """Empty key relation (zero grouping columns) counts the whole
        table into one row (reference test_agg.py
        test_empty_keys_but_nonempty_data)."""
        from tumult_core_spark.utils.grouped_dataframe import GroupedDataFrame

        gdf = GroupedDataFrame(
            spark.createDataFrame([(1, "x1"), (2, "x2")], "A long, B string"),
            spark.createDataFrame([], T.StructType([])),
        )
        assert [tuple(r) for r in self._cg()(gdf).collect()] == [(2,)]

    def test_zero_groupby_columns_empty_data(self, spark):
        """...and an empty table still emits the single zero row
        (reference test_agg.py test_empty_with_empty_keys)."""
        from tumult_core_spark.utils.grouped_dataframe import GroupedDataFrame

        gdf = GroupedDataFrame(
            spark.createDataFrame([], "A long, B string"),
            spark.createDataFrame([], T.StructType([])),
        )
        assert [tuple(r) for r in self._cg()(gdf).collect()] == [(0,)]


class TestDropReplaceNullsConformance:
    def test_drop_nulls_may_target_grouping_column(self):
        """DropNulls on the IfGroupedBy column is legal (dropping a
        whole null group is group-metric-stable); ReplaceNulls on it is
        not (reference test_nan.py test_can_drop_grouping_column)."""
        from tumult_core_spark.transformations.rows import DropNulls, ReplaceNulls

        dom = SparkDataFrameDomain(
            {
                "A": SparkStringColumnDescriptor(allow_null=True),
                "B": SparkFloatColumnDescriptor(allow_null=True),
            }
        )
        DropNulls(dom, IfGroupedBy("A", SymmetricDifference()), ["A"])
        DropNulls(
            dom, IfGroupedBy("A", RootSumOfSquared(SymmetricDifference())), ["A"]
        )
        with pytest.raises(ValueError):
            ReplaceNulls(dom, IfGroupedBy("A", SymmetricDifference()), {"A": "x"})


class TestPublicJoinStabilityConformance:
    def test_null_key_multiplicity(self, spark):
        """The stability factor counts null-key multiplicity only when
        join_on_nulls=True (reference test_join.py
        test_join_on_nulls_stability / test_join_stability_ignores_nulls)."""
        from tumult_core_spark.transformations.join import PublicJoin

        dom = SparkDataFrameDomain(
            {
                "A": SparkFloatColumnDescriptor(),
                "B": SparkStringColumnDescriptor(allow_null=True),
            }
        )
        pub = spark.createDataFrame(
            [(None, 2.1), (None, 1.2), ("X", 1.1)],
            T.StructType(
                [
                    T.StructField("B", T.StringType()),
                    T.StructField("C", T.DoubleType(), nullable=False),
                ]
            ),
        )
        t_eq = PublicJoin(dom, SymmetricDifference(), pub, join_on_nulls=True)
        t_ne = PublicJoin(dom, SymmetricDifference(), pub, join_on_nulls=False)
        assert t_eq.stability_function(1) == 2
        assert t_ne.stability_function(1) == 1

    def test_empty_public_df(self, spark):
        """An empty public table joins to an empty result with
        stability 0 (reference test_join.py test_empty_public_dataframe)."""
        from tumult_core_spark.transformations.join import PublicJoin

        dom = SparkDataFrameDomain(
            {"A": SparkFloatColumnDescriptor(), "B": STR}
        )
        empty = spark.createDataFrame([], "B string, C double")
        t = PublicJoin(dom, SymmetricDifference(), empty, join_cols=["B"])
        priv = spark.createDataFrame([(1.0, "X")], "A double, B string")
        assert t(priv).count() == 0
        assert t.stability_function(1) == 0


class TestPartitionSelectionConformance:
    def test_empty_input_and_negative_threshold(self, spark):
        """Empty input yields an empty keyed frame with the count
        column; a negative threshold keeps (almost surely) every group
        (reference test_spark_measurements.py test_empty /
        test_negative_threshold)."""
        from tumult_core_spark.measurements.spark import (
            GeometricPartitionSelection,
        )

        dom = SparkDataFrameDomain({"A": STR, "B": INT32})
        empty = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("A", T.StringType()),
                    T.StructField("B", T.IntegerType()),
                ]
            ),
        )
        m = GeometricPartitionSelection(
            input_domain=dom, alpha=1, threshold=2, count_column="count"
        )
        out = m(empty)
        assert out.count() == 0 and out.columns == ["A", "B", "count"]

        m_neg = GeometricPartitionSelection(
            input_domain=dom, alpha=1, threshold=-1000, count_column="count"
        )
        sdf = spark.createDataFrame([("a1", 1)] * 100, "A string, B int")
        rows = m_neg(sdf).collect()
        assert len(rows) == 1 and rows[0].A == "a1"


class TestColumnDomainsConformance:
    def test_null_values_in_key_domains(self, spark):
        """None is a legal column-domain value: the key product carries
        it and groupby binds the null group (reference test_groupby.py
        compute_full_domain_df test_with_null)."""
        from tumult_core_spark.transformations.groupby import (
            compute_full_domain_df,
            create_groupby_from_column_domains,
        )

        schema = T.StructType(
            [
                T.StructField("A", T.LongType(), True),
                T.StructField("B", T.StringType(), True),
            ]
        )
        out = compute_full_domain_df(
            spark, {"A": [1, None], "B": ["x", None]}, schema
        )
        rows = sorted((tuple(r) for r in out.collect()), key=str)
        assert rows == [(1, "x"), (1, None), (None, "x"), (None, None)]

        dom = SparkDataFrameDomain(
            {
                "A": SparkIntegerColumnDescriptor(size=64, allow_null=True),
                "B": SparkStringColumnDescriptor(allow_null=True),
            }
        )
        gb = create_groupby_from_column_domains(
            dom, SymmetricDifference(), False, {"A": [1, None]}
        )
        keys = sorted(
            (tuple(r) for r in gb(spark.createDataFrame([(1, "p")], schema)).group_keys.collect()),
            key=str,
        )
        assert keys == [(1,), (None,)]


class TestNoisyQuantileConformance:
    def test_equal_clamping_bounds(self):
        """Equal bounds are legal and release the bound exactly
        (reference test_series.py test_equal_clamping_bounds)."""
        import pandas as pd

        from tumult_core_spark.measurements.quantile import NoisyQuantile
        from tumult_core_spark.measures import PureDP

        nq = NoisyQuantile(
            "x",
            quantile=0.5,
            lower=1 / 7,
            upper=1 / 7,
            epsilon=10_000_000,
            output_measure=PureDP(),
        )
        out = nq(pd.DataFrame({"x": [10.0, 155.0, -9.0]}))
        assert float(out.iloc[0, 0]) == 1 / 7
        with pytest.raises(ValueError):
            NoisyQuantile(
                "x",
                quantile=0.5,
                lower=2.0,
                upper=1.0,
                epsilon=1,
                output_measure=PureDP(),
            )


class TestTruncationConformance:
    def test_duplicate_rows_not_clumped(self, spark):
        """Truncating a group of repeated duplicate rows must keep a
        spread of the distinct rows, not `threshold` copies of one
        (reference test_truncation.py
        test_hash_truncation_duplicate_rows_not_clumped)."""
        from tumult_core_spark.utils.truncation import truncate_large_groups

        df = spark.createDataFrame(
            [(1, 2, "A")] * 5 + [(2, 4, "A")] * 5, "X long, Y long, Z string"
        )
        kept = [tuple(r) for r in truncate_large_groups(df, ["Z"], 5).collect()]
        assert len(kept) == 5
        assert len(set(kept)) == 2  # both distinct rows represented

    def test_duplicate_interleave_partition_independent(self, spark):
        """The interleaved selection is a pure function of the input
        multiset: repartitioned and shuffled inputs keep the identical
        row multiset, and a removal neighbor changes it by at most 2."""
        from collections import Counter

        from pyspark.sql import functions as F

        from tumult_core_spark.utils.truncation import truncate_large_groups

        rows = [(i % 3, i % 4, "g") for i in range(40)]
        df = spark.createDataFrame(rows, "X long, Y long, Z string")
        base = Counter(
            tuple(r) for r in truncate_large_groups(df, ["Z"], 7).collect()
        )
        for variant in (df.repartition(13), df.orderBy(F.rand(5))):
            alt = Counter(
                tuple(r)
                for r in truncate_large_groups(variant, ["Z"], 7).collect()
            )
            assert alt == base
        nbr = spark.createDataFrame(rows[1:], "X long, Y long, Z string")
        nbr_kept = Counter(
            tuple(r) for r in truncate_large_groups(nbr, ["Z"], 7).collect()
        )
        diff = sum((base - nbr_kept).values()) + sum((nbr_kept - base).values())
        assert diff <= 2
