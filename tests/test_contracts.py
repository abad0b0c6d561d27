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
    "public_join", "grouping_flatmap_l1", "grouping_flatmap_l2",
    "flatmap_by_key", "add_unique", "drop_nulls", "replace_nulls",
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
        ("public_join", _public_join_case(d, sym)),
        ("grouping_flatmap_l1", _grouping_flatmap_case(l2=False)),
        ("grouping_flatmap_l2", _grouping_flatmap_case(l2=True)),
        ("flatmap_by_key", _flatmap_by_key_case(d)),
        ("add_unique", _add_unique_case(d)),
        ("drop_nulls", _drop_nulls_case(sym)),
        ("replace_nulls", _replace_nulls_case(sym)),
    ]


def _public_join_case(d, sym):
    """Public dim with key multiplicity 2 -> claimed stability 2."""
    from pyspark.sql import SparkSession

    from tumult_core_spark.transformations.join import PublicJoin

    spark = SparkSession.getActiveSession()
    pub = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], "k long, tag string"
    )
    return PublicJoin(d, sym, pub)


def _grouping_flatmap_case(l2):
    from tumult_core_spark.metrics import RootSumOfSquared, SumOf
    from tumult_core_spark.transformations.map import (
        GroupingFlatMap,
        RowToRowsTransformation,
    )

    om = (
        RootSumOfSquared(SymmetricDifference())
        if l2
        else SumOf(SymmetricDifference())
    )
    return GroupingFlatMap(
        om,
        RowToRowsTransformation(
            SparkRowDomain({"k": INT, "v": STR}),
            SparkRowDomain({"k": INT, "v": STR, "tag": INT}),
            lambda r: [{"tag": 0}, {"tag": 1}],
            augment=True,
        ),
        max_num_rows=2,
    )


def _flatmap_by_key_case(d):
    from tumult_core_spark.transformations.map import (
        FlatMapByKey,
        RowsToRowsTransformation,
    )

    return FlatMapByKey(
        d,
        IfGroupedBy("k", SymmetricDifference()),
        RowsToRowsTransformation(
            SparkRowDomain({"v": STR}),
            SparkRowDomain({"n": INT}),
            lambda rows: [{"n": len(rows)}],
        ),
    )


def _add_unique_case(d):
    from tumult_core_spark.transformations.rows import AddUniqueColumn

    return AddUniqueColumn(d, "uid")


def _drop_nulls_case(sym):
    from tumult_core_spark.domains import SparkStringColumnDescriptor
    from tumult_core_spark.transformations.rows import DropNulls

    dn = SparkDataFrameDomain(
        {"k": INT, "v": SparkStringColumnDescriptor(allow_null=True)}
    )
    return DropNulls(dn, sym, ["v"])


def _replace_nulls_case(sym):
    from tumult_core_spark.domains import SparkStringColumnDescriptor
    from tumult_core_spark.transformations.rows import ReplaceNulls

    rn = SparkDataFrameDomain(
        {"k": INT, "v": SparkStringColumnDescriptor(allow_null=True)}
    )
    return ReplaceNulls(rn, sym, {"v": "filled"})


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

    def test_numeric_overflow_guard_is_sum_based(self, spark):
        """One large-magnitude outlier must NOT trip the decimal-sum
        overflow guard when the true sum fits DECIMAL(38,12) easily
        (the old count*max(|min|,|max|) proxy raised here); a sum that
        genuinely exceeds capacity still fails loudly."""
        from tumult_core_spark.utils.profile import profile_numeric

        import pytest as _pytest

        # 10k small rows + one 1e24 outlier: count*max proxy = 1e28
        # (would raise), true sum(|x|) ~ 1e24 (fits)
        df = spark.range(10_000).select(
            F.when(F.col("id") == 0, F.lit(1e24)).otherwise(
                F.col("id").cast("double")
            ).alias("v")
        )
        row = profile_numeric(df, ["v"]).collect()[0]
        assert abs(row["mean"] - (1e24 + (10_000 * 9_999) / 2 - 0) / 10_000) < 1e10
        # genuine overflow (2 rows of 0.6e26: sum 1.2e26 > 1e26) still
        # fails loudly: under ANSI the decimal sum itself throws
        # NUMERIC_VALUE_OUT_OF_RANGE first; with ANSI off (where the
        # sum would silently NULL) the guard's raise_error fires
        big = spark.range(2).select(F.lit(0.6e26).alias("v"))
        with _pytest.raises(
            Exception, match="rescale|cannot be represented"
        ):
            profile_numeric(big, ["v"]).collect()


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


class TestProfileQuantiles:
    def test_exact_matches_numpy_type7(self, spark):
        import numpy as np

        from tumult_core_spark.utils.profile import profile_quantiles

        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            (r["column"], r["p"]): r["value"]
            for r in profile_quantiles(df, ["x"]).collect()
        }
        for p in (0.25, 0.5, 0.75):
            exp = float(np.quantile(np.array(vals), p))  # type-7 default
            assert abs(got[("x", p)] - exp) < 1e-12

    def test_approximate_mode_close_and_mergeable(self, spark, sf_dir):
        from tumult_core_spark.utils.profile import profile_quantiles

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        exact = {
            (r["column"], r["p"]): r["value"]
            for r in profile_quantiles(li, ["l_quantity"]).collect()
        }
        approx = {
            (r["column"], r["p"]): r["value"]
            for r in profile_quantiles(
                li, ["l_quantity"], approximate=True
            ).collect()
        }
        for key, e in exact.items():
            assert abs(approx[key] - e) <= max(1.0, 0.05 * abs(e))

    def test_rejects_non_numeric(self, spark):
        import pytest as _pytest

        from tumult_core_spark.utils.profile import profile_quantiles

        df = spark.createDataFrame([(1, "a")], "x long, s string")
        with _pytest.raises(ValueError, match="Not numeric"):
            profile_quantiles(df, ["s"])


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


class TestPublicTestingHelpers:
    """The public test-support surface downstream suites import
    (reference utils/testing.py parity)."""

    def test_assert_dataframe_equal(self, spark):
        from tumult_core_spark.utils.testing import assert_dataframe_equal

        a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
        b = spark.createDataFrame([(2, "y"), (1, "x")], "k long, s string")
        assert_dataframe_equal(a, b)  # order-insensitive
        import pandas as pd
        import pytest as _pytest

        assert_dataframe_equal(a, pd.DataFrame({"k": [2, 1], "s": ["y", "x"]}))
        with _pytest.raises(AssertionError):
            assert_dataframe_equal(
                a, spark.createDataFrame([(1, "x")], "k long, s string")
            )

    def test_pandas_to_spark_empty_with_domain(self, spark):
        import pandas as pd

        from tumult_core_spark.domains import (
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
            SparkStringColumnDescriptor,
        )
        from tumult_core_spark.utils.testing import pandas_to_spark_dataframe

        dom = SparkDataFrameDomain(
            {
                "k": SparkIntegerColumnDescriptor(size=64),
                "s": SparkStringColumnDescriptor(),
            }
        )
        out = pandas_to_spark_dataframe(
            spark, pd.DataFrame({"k": [], "s": []}), dom
        )
        assert out.count() == 0 and out.schema == dom.spark_schema

    def test_props_and_mocks(self):
        from tumult_core_spark.measurements.interactive import PrivacyAccountant
        from tumult_core_spark.utils.testing import (
            assert_property_immutability,
            create_mock_measurement,
            create_mock_transformation,
            get_all_props,
        )

        props = get_all_props(PrivacyAccountant)
        assert ("state",) in props and ("privacy_budget",) in props

        class Dummy:
            @property
            def ro(self):
                return 1

        assert_property_immutability(Dummy(), "ro")
        t = create_mock_transformation(stability_function_implemented=True)
        assert t.stability_function(1) == 1
        m = create_mock_measurement()
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            m.privacy_function(1)

    def test_case_parametrize_shape(self):
        from tumult_core_spark.utils.testing import Case, parametrize

        mark = parametrize(Case("a", x=1, y=2), Case("b", x=3, y=4))
        assert mark.args[0] == "x,y"
        assert [p.id for p in mark.args[1]] == ["a", "b"]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parametrize(Case("a", x=1), Case("b", y=2))

    def test_fixed_group_dataset_and_stats(self, spark):
        import numpy as np

        from tumult_core_spark.utils.testing import (
            FixedGroupDataSet,
            run_test_using_chi_squared_test,
            run_test_using_ks_test,
        )

        ds = FixedGroupDataSet([1, 2, 3], num_groups=4)
        assert ds.get_dataframe().count() == 12
        assert ds.groupby().group_keys.count() == 4
        assert ds.lower.to_float(False) == 1 and ds.upper.to_float(True) == 3
        rng = np.random.default_rng(5)
        # uniform[0,1] against its own CDF passes; against a wrong CDF fails
        u = rng.random(2000)
        run_test_using_ks_test(u, lambda x: min(max(x, 0.0), 1.0))
        import pytest as _pytest

        with _pytest.raises(AssertionError):
            run_test_using_ks_test(u, lambda x: min(max(x * x, 0.0), 1.0))
        # fair die against its own pmf
        die = rng.integers(1, 7, 3000)
        run_test_using_chi_squared_test(die, lambda k: 1 / 6 if 1 <= k <= 6 else 0.0)
        with _pytest.raises(AssertionError):
            run_test_using_chi_squared_test(
                die, lambda k: [0.5, 0.1, 0.1, 0.1, 0.1, 0.1][k - 1]
            )


class TestMiscValidationParity:
    def test_nonconflicting_and_names(self):
        from tumult_core_spark.utils.misc import (
            escape_column_name,
            get_fullname,
            get_nonconflicting_string,
        )

        strs = ["count", "A" * 10, ""]
        assert get_nonconflicting_string(strs) not in strs
        assert get_nonconflicting_string([]) != ""
        assert escape_column_name("q0.9(x)") == "`q0.9(x)`"
        assert escape_column_name("`done`") == "`done`"
        assert escape_column_name("plain_1") == "plain_1"
        # embedded backticks double (Spark's quoted-identifier escape);
        # backticks-at-both-ends alone is NOT "already escaped"
        assert escape_column_name("a`b") == "`a``b`"
        assert escape_column_name("`a`x`b`") == "```a``x``b```"
        assert escape_column_name("`a``b`") == "`a``b`"
        from tumult_core_spark.exact_number import ExactNumber

        assert get_fullname(ExactNumber(1)).endswith("exact_number.ExactNumber")
        assert get_fullname(str) == "str"

    def test_materialize_dir_env_knob(self, spark, tmp_path, monkeypatch):
        """SPARK_GRAFT_MATERIALIZE_DIR points the release-freeze
        parquet root at shared storage (cluster mode); the session
        subdir is created under it and survives (no local atexit
        cleanup on shared storage)."""
        import tumult_core_spark.utils.misc as misc

        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_DIR", str(tmp_path / "shared"))
        monkeypatch.setattr(misc, "_MATERIALIZE_ROOT", None)
        try:
            out = misc.materialize(spark.range(5))
            assert sorted(r.id for r in out.collect()) == list(range(5))
            assert misc._MATERIALIZE_ROOT.startswith(str(tmp_path / "shared"))
            import os as _os

            assert _os.path.isdir(misc._MATERIALIZE_ROOT)
        finally:
            monkeypatch.setattr(misc, "_MATERIALIZE_ROOT", None)

    def test_checkpoint_dir_relative_path_normalizes(self):
        """A relative checkpoint_dir must compare equal to the absolute
        file:/ URI SparkContext stores, or cut_lineage re-invokes
        setCheckpointDir every round (fresh UUID subdir per iteration)."""
        import os

        from tumult_core_spark.utils.misc import (
            _checkpoint_parent,
            _strip_file_scheme,
        )

        rel = "ckpt_dir"
        absolute = os.path.abspath(rel)
        # what SparkContext stores back: file: URI of dir + UUID subdir
        stored = f"file:{absolute}/0a1b2c3d-uuid"
        assert _checkpoint_parent(stored) == _strip_file_scheme(rel)
        assert _strip_file_scheme(rel) == absolute
        # non-file schemes pass through un-abspathed
        assert _strip_file_scheme("hdfs://nn/ckpt") == "hdfs://nn/ckpt"

    def test_privacy_accountant_state_parity_alias(self):
        """The reference spells the enum PrivacyAccountantState
        (interactive_measurements.py:769); ported code must import the
        same name here."""
        from tumult_core_spark.measurements.interactive import (
            AccountantState,
            PrivacyAccountantState,
        )

        assert PrivacyAccountantState is AccountantState

    def test_copy_if_mutable(self):
        from tumult_core_spark.utils.misc import copy_if_mutable

        d = {"a": [1, {2}], "b": (3, [4])}
        c = copy_if_mutable(d)
        c["a"].append(9)
        c["b"][1].append(9)
        assert d == {"a": [1, {2}], "b": (3, [4])}
        assert copy_if_mutable("s") == "s" and copy_if_mutable(None) is None

    def test_validate_groupby_domains(self):
        from tumult_core_spark.domains import (
            SparkDataFrameDomain,
            SparkIntegerColumnDescriptor,
            SparkStringColumnDescriptor,
        )
        from tumult_core_spark.utils.validation import validate_groupby_domains

        dom = SparkDataFrameDomain(
            {
                "k": SparkIntegerColumnDescriptor(size=64),
                "s": SparkStringColumnDescriptor(),
            }
        )
        validate_groupby_domains({"k": [1, 2], "s": ["a"]}, dom)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="empty"):
            validate_groupby_domains({"k": []}, dom)
        with _pytest.raises(ValueError, match="duplicates"):
            validate_groupby_domains({"k": [1, 1]}, dom)
        with _pytest.raises(ValueError, match="invalid"):
            validate_groupby_domains({"k": ["not-an-int"]}, dom)
        with _pytest.raises(ValueError, match="not in the input domain"):
            validate_groupby_domains({"zz": [1]}, dom)

    def test_validate_exact_number(self):
        from fractions import Fraction

        from tumult_core_spark.utils.validation import validate_exact_number
        import pytest as _pytest

        validate_exact_number(1, minimum=0, maximum=1)
        validate_exact_number(Fraction(1, 2), minimum=0, minimum_is_inclusive=False)
        with _pytest.raises(ValueError, match="not an integer"):
            validate_exact_number(Fraction(1, 2), allow_nonintegral=False)
        with _pytest.raises(ValueError, match="strictly greater"):
            validate_exact_number(0, minimum=0, minimum_is_inclusive=False)
        with _pytest.raises(ValueError, match="less than or equal"):
            validate_exact_number(2, maximum=1)


class TestIncrementalFiles:
    def test_commit_manifest_is_frozen_at_read_time(self, spark, tmp_path):
        """Regression: the batch manifest used to be a LAZY plan that
        re-listed the filesystem at commit time, so a file landing
        between read and commit was marked processed without its rows
        ever being read — silent permanent data loss."""
        from tumult_core_spark.sources.io import (
            commit_manifest,
            read_incremental_parquet,
        )

        data = str(tmp_path / "data")
        man = str(tmp_path / "manifest")
        spark.range(5).write.parquet(f"{data}/b1")
        d1, batch = read_incremental_parquet(spark, f"{data}/*/", man)
        assert d1.count() == 5
        # a file arrives AFTER the read but BEFORE the commit
        spark.range(7).write.parquet(f"{data}/b2")
        commit_manifest(batch, man)
        d2, _ = read_incremental_parquet(spark, f"{data}/*/", man)
        assert d2.count() == 7  # the late file is still unprocessed

    def test_incremental_reads_glob_metachar_filenames(self, spark, tmp_path):
        """Listed paths are glob-escaped before being fed back to the
        reader: a literal part[1].parquet must be read as itself, not
        expanded as a character class."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tumult_core_spark.sources.io import read_incremental_parquet

        data = tmp_path / "data" / "b1"
        data.mkdir(parents=True)
        pq.write_table(
            pa.table({"id": [1, 2, 3]}), str(data / "part[1].parquet")
        )
        d, _ = read_incremental_parquet(
            spark, f"{tmp_path}/data/*/", str(tmp_path / "manifest")
        )
        assert d.count() == 3

    def test_incremental_batches_and_overwrite_detection(self, spark, tmp_path):
        """read_incremental_parquet processes each file exactly once
        across runs; an overwritten file (same path, new content
        fingerprint) is re-processed; an empty batch yields a
        schema-correct empty frame."""
        from tumult_core_spark.sources.io import (
            commit_manifest,
            new_files_since,
            read_incremental_parquet,
        )

        data = str(tmp_path / "data")
        man = str(tmp_path / "manifest")
        spark.range(5).write.parquet(f"{data}/f1")
        spark.range(5, 8).write.parquet(f"{data}/f2")
        d1, m1 = read_incremental_parquet(spark, f"{data}/*/", man)
        assert sorted(r.id for r in d1.collect()) == list(range(8))
        commit_manifest(m1, man)

        # second run: only the new file's rows
        spark.range(100, 104).write.parquet(f"{data}/f3")
        d2, m2 = read_incremental_parquet(spark, f"{data}/*/", man)
        assert sorted(r.id for r in d2.collect()) == [100, 101, 102, 103]
        commit_manifest(m2, man)

        # third run: nothing new — empty but schema-correct
        d3, m3 = read_incremental_parquet(spark, f"{data}/*/", man)
        assert d3.count() == 0 and m3.count() == 0
        assert d3.schema == d2.schema

        # overwrite f3 in place: its files become new again
        spark.range(200, 202).coalesce(1).write.mode("overwrite").parquet(
            f"{data}/f3"
        )
        assert new_files_since(spark, f"{data}/*/", man).count() >= 1
        d4, m4 = read_incremental_parquet(spark, f"{data}/*/", man)
        assert sorted(r.id for r in d4.collect()) == [200, 201]

    def test_corrupt_manifest_raises_instead_of_full_reprocess(
        self, spark, tmp_path
    ):
        """A MISSING manifest means first run (everything new), but a
        CORRUPT manifest must raise — silently treating it as a first
        run would reprocess the whole corpus and then append duplicate
        manifest rows."""
        import pytest as _pytest

        from tumult_core_spark.sources.io import new_files_since

        data = str(tmp_path / "data")
        spark.range(3).write.parquet(f"{data}/f1")

        # missing manifest: first run, all files new
        missing = str(tmp_path / "no_such_manifest")
        assert new_files_since(spark, f"{data}/*/", missing).count() >= 1

        # corrupt manifest: not silently "first run"
        corrupt = tmp_path / "manifest"
        corrupt.mkdir()
        (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
        with _pytest.raises(Exception) as exc_info:
            new_files_since(spark, f"{data}/*/", str(corrupt)).count()
        assert "PATH_NOT_FOUND" not in str(exc_info.value)

    def test_listing_prunes_binary_content(self, spark, tmp_path):
        # the metadata listing must not read file bodies: the scan's
        # ReadSchema carries only the projected metadata columns
        from tumult_core_spark.sources.io import list_data_files

        spark.range(3).write.parquet(str(tmp_path / "p"))
        df = list_data_files(spark, str(tmp_path / "p") + "/*")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "content" not in plan.split("ReadSchema:")[-1]
        assert df.count() >= 1


class TestTextAndBinarySources:
    def test_read_text_line_and_whole_file(self, spark, tmp_path):
        from tumult_core_spark.sources.io import read_text

        d = tmp_path / "corpus"
        d.mkdir()
        (d / "a.txt").write_text("line one\nline two\n")
        (d / "b.txt").write_text("solo\n")
        lines = read_text(spark, str(d))
        assert sorted(r["value"] for r in lines.collect()) == [
            "line one", "line two", "solo",
        ]
        whole = read_text(spark, str(d), whole_file=True, line_col="text")
        got = sorted(r["text"] for r in whole.collect())
        assert got == ["line one\nline two\n", "solo\n"]

    def test_read_binary_files_glob(self, spark, tmp_path):
        from tumult_core_spark.sources.io import read_binary_files

        d = tmp_path / "blobs"
        d.mkdir()
        (d / "x.wav").write_bytes(b"RIFFxxxx")
        (d / "y.bin").write_bytes(b"\x00\x01")
        all_files = read_binary_files(spark, str(d))
        assert all_files.count() == 2
        assert set(all_files.columns) >= {"path", "length", "content"}
        wavs = read_binary_files(spark, str(d), path_glob="*.wav").collect()
        assert len(wavs) == 1 and bytes(wavs[0]["content"]) == b"RIFFxxxx"


@pytest.mark.parametrize("name", CASE_NAMES)
@pytest.mark.slow  # empirical neighbor fuzz: full lane only
class TestEmpiricalStability:
    """The claimed stability bound, checked empirically under the
    TRANSFORMATION'S OWN metrics: for neighboring inputs (single-row
    removal, and whole-group replacement for group-counting metrics),
    distance(outputs) under the output metric must be <=
    stability_function(distance(inputs) under the input metric).  This
    is the privacy calculus's load-bearing inequality — a
    transformation whose real sensitivity exceeds its claim silently
    destroys the DP guarantee of everything chained after it.  (This
    suite caught the pre-r5 LimitKeysPerGroup output-metric
    unsoundness.)"""

    @staticmethod
    def _distance(metric, rows_a, rows_b, cols):
        """Metric distance between two row multisets (reference
        metrics.py distance semantics: SymmetricDifference is row
        multiset symdiff; IfGroupedBy(col, SymmetricDifference) counts
        differing groups — 1 if one side is empty, else 2; SumOf /
        RootSumOfSquared aggregate inner distances per group)."""
        import math as _math
        from collections import Counter

        from tumult_core_spark.metrics import (
            IfGroupedBy,
            RootSumOfSquared,
            SumOf,
            SymmetricDifference,
        )

        dist = TestEmpiricalStability._distance
        if isinstance(metric, SymmetricDifference):
            ca, cb = Counter(rows_a), Counter(rows_b)
            return sum((ca - cb).values()) + sum((cb - ca).values())
        if isinstance(metric, IfGroupedBy):
            idx = cols.index(metric.column)
            groups = {}
            for r in rows_a:
                groups.setdefault(r[idx], ([], []))[0].append(r)
            for r in rows_b:
                groups.setdefault(r[idx], ([], []))[1].append(r)
            inner = metric.inner_metric
            if isinstance(inner, SymmetricDifference):
                d = 0
                for ga, gb in groups.values():
                    if Counter(ga) != Counter(gb):
                        d += 1 if (not ga or not gb) else 2
                return d
            if isinstance(inner, (SumOf, RootSumOfSquared)):
                parts = [
                    dist(inner.inner_metric, ga, gb, cols)
                    for ga, gb in groups.values()
                ]
                # RootSumOfSquared subclasses SumOf: check it first
                if isinstance(inner, RootSumOfSquared):
                    return _math.sqrt(sum(p * p for p in parts))
                return sum(parts)
        raise NotImplementedError(repr(metric))

    def _check_neighbor(self, spark, t, kv, neighbor_rows):
        base_rows = [tuple(r) for r in kv.collect()]
        cols = kv.columns
        in_d = self._distance(t.input_metric, base_rows, neighbor_rows, cols)
        if in_d == 0:
            return
        bound = ExactNumber(t.stability_function(in_d)).to_float(round_up=True)
        out_base = [tuple(r) for r in t(kv).collect()]
        neighbor = spark.createDataFrame(neighbor_rows, kv.schema)
        out_nbr = [tuple(r) for r in t(neighbor).collect()]
        out_cols = [f.name for f in t.output_domain.spark_schema.fields]
        out_d = self._distance(t.output_metric, out_base, out_nbr, out_cols)
        assert out_d <= bound + 1e-9, (
            f"input distance {in_d} -> output distance {out_d} exceeds "
            f"claimed stability {bound}"
        )

    def test_single_row_removal_neighbors(self, spark, kv, cases, name):
        t = cases[name]
        rows = [tuple(r) for r in kv.collect()]
        for i in range(len(rows)):
            self._check_neighbor(
                spark, t, kv, [r for j, r in enumerate(rows) if j != i]
            )

    def test_group_replacement_neighbor(self, spark, kv, cases, name):
        """For group-counting input metrics the harshest d_in=2
        neighbor is a wholly REPLACED group — swap every row of the
        k=3 group (including its v keys)."""
        from tumult_core_spark.metrics import IfGroupedBy

        t = cases[name]
        if not isinstance(t.input_metric, IfGroupedBy):
            pytest.skip("row-level metric: covered by removal neighbors")
        rows = [tuple(r) for r in kv.collect()]
        replaced = [r for r in rows if r[0] != 3] + [(3, "x"), (3, "y")]
        self._check_neighbor(spark, t, kv, replaced)


@pytest.mark.slow  # empirical neighbor fuzz: full lane only
class TestEmpiricalStabilityComposite:
    """Empirical stability for operators whose inputs/outputs are not
    single DataFrames: PrivateJoin (dict input, the most intricate
    stability formula in the package) and PartitionByKeys (list
    output under SumOf / RootSumOfSquared)."""

    def _symdiff(self, rows_a, rows_b):
        from collections import Counter

        ca, cb = Counter(rows_a), Counter(rows_b)
        return sum((ca - cb).values()) + sum((cb - ca).values())

    @pytest.mark.parametrize(
        "strategy_name", ["TRUNCATE", "DROP", "NO_TRUNCATION_left_only"]
    )
    def test_private_join_neighbors(self, spark, strategy_name):
        """For every single-row removal on either side, the output
        row symdiff must be within stability_function of the
        corresponding one-sided dict distance."""
        from tumult_core_spark.domains import DictDomain
        from tumult_core_spark.transformations.join import (
            PrivateJoin,
            TruncationStrategy,
        )

        left_rows = [(1, i) for i in range(5)] + [(2, 9)] + [(3, 7)]
        right_rows = [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (4, "e")]
        left = spark.createDataFrame(left_rows, "k long, x long")
        right = spark.createDataFrame(right_rows, "k long, t string")
        dd = DictDomain(
            {
                "l": SparkDataFrameDomain.from_spark_schema(left.schema),
                "r": SparkDataFrameDomain.from_spark_schema(right.schema),
            }
        )
        if strategy_name == "TRUNCATE":
            sl = sr = TruncationStrategy.TRUNCATE
            tl, tr = 2, 2
        elif strategy_name == "DROP":
            sl = sr = TruncationStrategy.DROP
            tl, tr = 3, 2
        else:
            sl, sr = TruncationStrategy.NO_TRUNCATION, TruncationStrategy.TRUNCATE
            tl, tr = float("inf"), 2
        t = PrivateJoin(dd, "l", "r", sl, sr, tl, tr)
        if strategy_name == "NO_TRUNCATION_left_only":
            # infinite stability is the documented contract; also check
            # the construction-time threshold validation
            assert not t.stability_function({"l": 1, "r": 0}).is_finite
            with pytest.raises(ValueError, match="inf"):
                PrivateJoin(dd, "l", "r", sl, sr, None, tr)
            return

        def run(l_rows, r_rows):
            out = t(
                {
                    "l": spark.createDataFrame(l_rows, left.schema),
                    "r": spark.createDataFrame(r_rows, right.schema),
                }
            )
            return [tuple(r) for r in out.collect()]

        base = run(left_rows, right_rows)
        bound_l = ExactNumber(
            t.stability_function({"l": 1, "r": 0})
        ).to_float(round_up=True)
        bound_r = ExactNumber(
            t.stability_function({"l": 0, "r": 1})
        ).to_float(round_up=True)
        for i in range(len(left_rows)):
            nbr = run([r for j, r in enumerate(left_rows) if j != i], right_rows)
            d = self._symdiff(base, nbr)
            assert d <= bound_l + 1e-9, f"left row {i}: {d} > {bound_l}"
        for i in range(len(right_rows)):
            nbr = run(left_rows, [r for j, r in enumerate(right_rows) if j != i])
            d = self._symdiff(base, nbr)
            assert d <= bound_r + 1e-9, f"right row {i}: {d} > {bound_r}"

    @pytest.mark.parametrize("use_l2", [False, True])
    def test_partition_by_keys_neighbors(self, spark, kv, use_l2):
        import math

        from tumult_core_spark.transformations.partition import PartitionByKeys

        d = base_domain()
        t = PartitionByKeys(
            d, SymmetricDifference(), use_l2, ["k"], [(1,), (2,), (3,)]
        )
        rows = [tuple(r) for r in kv.collect()]

        def run(in_rows):
            parts = t(spark.createDataFrame(in_rows, kv.schema))
            return [[tuple(r) for r in p.collect()] for p in parts]

        base = run(rows)
        bound = ExactNumber(t.stability_function(1)).to_float(round_up=True)
        for i in range(len(rows)):
            nbr = run([r for j, r in enumerate(rows) if j != i])
            per_part = [self._symdiff(a, b) for a, b in zip(base, nbr)]
            dist = (
                math.sqrt(sum(x * x for x in per_part))
                if use_l2
                else sum(per_part)
            )
            assert dist <= bound + 1e-9, f"row {i}: {dist} > {bound}"

    def test_add_remove_keys_neighbors(self, spark):
        """AddRemoveKeys neighbors differ by ALL rows of one key value
        across every frame; output key-distance (number of key values
        whose slices differ in any output frame) must be <=
        stability_function(1) for PrivateJoinOnKey and the lifts."""
        from tumult_core_spark.domains import DictDomain
        from tumult_core_spark.metrics import AddRemoveKeys
        from tumult_core_spark.transformations.add_remove_keys import (
            FilterValue,
        )
        from tumult_core_spark.transformations.join import PrivateJoinOnKey
        from tumult_core_spark.transformations.rows import Filter

        ldom = SparkDataFrameDomain({"uid": INT, "x": INT})
        rdom = SparkDataFrameDomain({"uid": INT, "t": STR})
        dd = DictDomain({"l": ldom, "r": rdom})
        metric = AddRemoveKeys({"l": "uid", "r": "uid"})
        l_rows = [(1, 10), (1, 11), (2, 20), (3, 30)]
        r_rows = [(1, "a"), (2, "b"), (2, "c"), (4, "d")]

        def key_distance(frames_a, frames_b, key_col="uid"):
            keys = set()
            for fa, fb in zip(frames_a, frames_b):
                from collections import Counter

                by_key_a, by_key_b = {}, {}
                for row in fa:
                    by_key_a.setdefault(row[0], []).append(row)
                for row in fb:
                    by_key_b.setdefault(row[0], []).append(row)
                for k in set(by_key_a) | set(by_key_b):
                    if Counter(by_key_a.get(k, [])) != Counter(by_key_b.get(k, [])):
                        keys.add(k)
            return len(keys)

        pj = PrivateJoinOnKey(dd, metric, "l", "r", "joined")
        fv = FilterValue(
            dd, metric, Filter(ldom, SymmetricDifference(), "x < 25"), "l", "l2"
        )
        for t, out_keys in ((pj, ["l", "r", "joined"]), (fv, ["l", "r", "l2"])):
            bound = ExactNumber(t.stability_function(1)).to_float(round_up=True)

            def run(lr, rr, _t=t, _keys=out_keys):
                out = _t(
                    {
                        "l": spark.createDataFrame(lr, "uid long, x long"),
                        "r": spark.createDataFrame(rr, "uid long, t string"),
                    }
                )
                return [
                    [tuple(r) for r in out[k].collect()] for k in _keys
                ]

            base = run(l_rows, r_rows)
            for uid in (1, 2, 3, 4):
                nbr = run(
                    [r for r in l_rows if r[0] != uid],
                    [r for r in r_rows if r[0] != uid],
                )
                d = key_distance(base, nbr)
                assert d <= bound + 1e-9, (
                    f"{type(t).__name__}: removing uid {uid} changed {d} "
                    f"key slices, claimed {bound}"
                )
