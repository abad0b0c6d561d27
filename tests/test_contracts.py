"""Abstract contract suite: the same invariants re-checked on every
transformation (the reference's test/unit/*/abstract.py technique).

For each case: (a) the declared output domain matches the actual
output schema, (b) stability_function is monotone in d_in, (c) the
transformation is deterministic (two applications agree), (d) chaining
with Identity round-trips types.
"""

import pytest
from pyspark.sql import functions as F

from tumult_core_spark.base import ChainTT, Transformation
from tumult_core_spark.domains import (
    SparkDataFrameDomain,
    SparkIntegerColumnDescriptor,
    SparkRowDomain,
    SparkStringColumnDescriptor,
)
from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.metrics import (
    IfGroupedBy,
    SymmetricDifference,
)

INT = SparkIntegerColumnDescriptor(size=64)
STR = SparkStringColumnDescriptor()


def base_domain():
    return SparkDataFrameDomain({"k": INT, "v": STR})


CASE_NAMES = [
    "identity", "filter", "select", "rename", "derive",
    "map", "flatmap", "limit_rows", "limit_keys", "limit_rows_per_key",
]


def make_cases():
    """(name, transformation) pairs over the shared kv domain.

    Requires an active SparkSession (Filter/Derive validate their
    expressions at construction), so call inside tests only.
    """
    from tumult_core_spark.transformations.derive import DeriveColumn
    from tumult_core_spark.transformations.map import (
        FlatMap,
        Map,
        RowToRowsTransformation,
        RowToRowTransformation,
    )
    from tumult_core_spark.transformations.rows import (
        Filter,
        Identity,
        Rename,
        Select,
    )
    from tumult_core_spark.transformations.truncation import (
        LimitKeysPerGroup,
        LimitRowsPerGroup,
        LimitRowsPerKeyPerGroup,
    )

    d = base_domain()
    sym = SymmetricDifference()
    grouped = IfGroupedBy("k", SymmetricDifference())
    return [
        ("identity", Identity(d, sym)),
        ("filter", Filter(d, sym, "k > 1")),
        ("select", Select(d, sym, ["k"])),
        ("rename", Rename(d, sym, {"v": "val"})),
        ("derive", DeriveColumn(d, sym, "k2", "k * 2", INT)),
        (
            "map",
            Map(
                sym,
                RowToRowTransformation(
                    SparkRowDomain({"k": INT, "v": STR}),
                    SparkRowDomain({"k": INT, "v": STR, "n": INT}),
                    lambda r: {"n": r["k"] + 1},
                    augment=True,
                ),
            ),
        ),
        (
            "flatmap",
            FlatMap(
                sym,
                RowToRowsTransformation(
                    SparkRowDomain({"k": INT, "v": STR}),
                    SparkRowDomain({"n": INT}),
                    lambda r: [{"n": i} for i in range(int(r["k"]))],
                ),
                max_num_rows=2,
            ),
        ),
        ("limit_rows", LimitRowsPerGroup(d, grouped, 2)),
        ("limit_keys", LimitKeysPerGroup(d, grouped, "v", 1)),
        ("limit_rows_per_key", LimitRowsPerKeyPerGroup(d, grouped, "v", 1)),
    ]


@pytest.fixture(scope="module")
def kv(spark):
    return spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "k long, v string",
    )


@pytest.fixture(scope="module")
def cases(spark):
    return dict(make_cases())


@pytest.mark.parametrize("name", CASE_NAMES)
class TestTransformationContract:
    def test_output_domain_matches_reality(self, spark, kv, cases, name):
        t = cases[name]
        out = t(kv)
        expected = t.output_domain.spark_schema
        assert [f.name for f in out.schema.fields] == [
            f.name for f in expected.fields
        ]
        for af, ef in zip(out.schema.fields, expected.fields):
            assert af.dataType == ef.dataType, f"{name}: {af.name}"

    def test_stability_monotone(self, spark, kv, cases, name):
        t = cases[name]
        s1 = ExactNumber(t.stability_function(1))
        s2 = ExactNumber(t.stability_function(2))
        s5 = ExactNumber(t.stability_function(5))
        assert s1 <= s2 <= s5
        assert s1 >= 0

    def test_deterministic(self, spark, kv, cases, name):
        t = cases[name]
        a = sorted(map(tuple, t(kv).collect()))
        b = sorted(map(tuple, t(kv).collect()))
        assert a == b

    def test_chains_with_identity(self, spark, kv, cases, name):
        t = cases[name]
        from tumult_core_spark.transformations.rows import Identity

        post = Identity(t.output_domain, t.output_metric)
        chained = ChainTT(t, post)
        assert chained.stability_function(1) == t.stability_function(1)
        assert sorted(map(tuple, chained(kv).collect())) == sorted(
            map(tuple, t(kv).collect())
        )


class TestCleanup:
    def test_cleanup_removes_materialization_root(self, spark):
        import os

        from tumult_core_spark.utils import misc
        from tumult_core_spark.utils.cleanup import (
            cleanup,
            materialization_root,
            remove_all_temp_tables,
        )

        df = spark.range(5)
        frozen = misc.materialize(df)
        assert frozen.count() == 5
        root = materialization_root()
        assert root is not None and os.path.isdir(root)
        cleanup()
        assert not os.path.exists(root)
        assert materialization_root() is None
        # a later materialize transparently opens a fresh root
        again = misc.materialize(spark.range(3))
        assert again.count() == 3
        # sweep mode also removes orphaned roots from other sessions
        import tempfile

        orphan = tempfile.mkdtemp(prefix="tcs_materialize_")
        remove_all_temp_tables()
        assert not os.path.exists(orphan)
        assert materialization_root() is None


class TestProfile:
    def test_profile_exact_metrics_one_scan(self, spark):
        from tumult_core_spark.utils.profile import profile_table

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b"), (None, "b")], "x long, s string"
        )
        got = {r["column"]: r for r in profile_table(df).collect()}
        assert got["x"]["n_rows"] == 4
        assert got["x"]["n_nulls"] == 1 and got["x"]["n_distinct"] == 2
        assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
        import pytest as _pytest

        with _pytest.raises(ValueError, match="No such column"):
            profile_table(df, ["nope"])


class TestProfileApprox:
    def test_approx_mode_no_expand_and_close(self, spark, sf_dir):
        from tumult_core_spark.utils.profile import profile_table

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_returnflag"
        )
        exact = {
            r["column"]: r["n_distinct"] for r in profile_table(li).collect()
        }
        approx_df = profile_table(li, approximate=True, rsd=0.02)
        plan = approx_df._sc._jvm.PythonSQLUtils.explainString(
            approx_df._jdf.queryExecution(), "formatted"
        )
        # HLL sketches profile all columns in one un-expanded pass
        assert "Expand" not in plan
        got = {r["column"]: r for r in approx_df.collect()}
        for c, exact_d in exact.items():
            r = got[c]
            assert abs(r["n_distinct"] - exact_d) <= max(3, 0.1 * exact_d)
            assert r["n_rows"] == li.count()


class TestOrcRoundTrip:
    def test_orc_round_trip_preserves_values(self, spark, tmp_path):
        from tumult_core_spark.sources.io import read_orc, write_orc

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, float("nan")), (3, "c", -2.0)],
            "k long, s string, v double",
        )
        p = str(tmp_path / "t.orc")
        write_orc(df, p)
        back = read_orc(spark, p)
        a = sorted(map(repr, df.collect()))
        b = sorted(map(repr, back.collect()))
        assert a == b


class TestJsonlRoundTrip:
    def test_jsonl_round_trip_preserves_values(self, spark, tmp_path):
        from tumult_core_spark.domains import SparkDataFrameDomain
        from tumult_core_spark.sources.io import read_json, write_jsonl

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, -2.0), (3, 'q"uote\nnot', 0.0)],
            "k long, s string, v double",
        )
        p = str(tmp_path / "t.jsonl")
        write_jsonl(df, p, compression="gzip")
        dom = SparkDataFrameDomain.from_spark_schema(df.schema)
        back = read_json(spark, p, domain=dom)
        a = sorted(map(repr, df.collect()))
        b = sorted(map(repr, back.collect()))
        assert a == b
        # files actually gzip-compressed
        import glob

        assert glob.glob(f"{p}/*.gz")
