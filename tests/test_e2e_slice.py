"""Minimum end-to-end slice: noisy grouped count / sum / average on the
driver's sf0.001 lineitem+orders tables, noise-scale-0 mode compared
against direct Spark computation, noise-on mode sanity-checked."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tumult_core_spark.domains import SparkDataFrameDomain
from tumult_core_spark.exact_number import ExactNumber
from tumult_core_spark.measures import ApproxDP, PureDP, RhoZCDP
from tumult_core_spark.metrics import SymmetricDifference
from tumult_core_spark.measurements.aggregations import (
    NoiseMechanism,
    create_average_measurement,
    create_count_measurement,
    create_partition_selection_measurement,
    create_sum_measurement,
    create_variance_measurement,
)
from tumult_core_spark.transformations.groupby import (
    create_groupby_from_list_of_keys,
)

EPS_OFF = float("inf")  # infinite budget -> zero noise -> deterministic


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def li_domain(lineitem):
    return SparkDataFrameDomain.from_spark_schema(lineitem.schema, strict=True)


FLAGS = [("A",), ("N",), ("R",), ("Z",)]  # Z is an empty public group


def _flag_groupby(domain, use_l2=False):
    return create_groupby_from_list_of_keys(
        domain, SymmetricDifference(), use_l2, ["l_returnflag"], FLAGS
    )


def test_grouped_count_noise_off(spark, lineitem, li_domain):
    m = create_count_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=EPS_OFF,
        groupby_transformation=_flag_groupby(li_domain),
    )
    got = {r["l_returnflag"]: r["count"] for r in m(lineitem).collect()}
    expected = {
        r["l_returnflag"]: r["cnt"]
        for r in lineitem.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    assert got["Z"] == 0  # empty public group fill
    for k in ("A", "N", "R"):
        assert got[k] == expected[k]
    assert set(got) == {"A", "N", "R", "Z"}


def test_grouped_count_noise_on(spark, lineitem, li_domain):
    m = create_count_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=1,
        groupby_transformation=_flag_groupby(li_domain),
    )
    assert m.privacy_function(1) == 1
    got = {r["l_returnflag"]: r["count"] for r in m(lineitem).collect()}
    expected = {
        r["l_returnflag"]: r["cnt"]
        for r in lineitem.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    # geometric noise at eps=1 stays within ~±60 whp
    for k in ("A", "N", "R"):
        assert abs(got[k] - expected[k]) < 200


def test_scalar_count(spark, lineitem, li_domain):
    m = create_count_measurement(
        li_domain, SymmetricDifference(), PureDP(), d_in=1, d_out=EPS_OFF
    )
    assert int(m(lineitem)) == lineitem.count()


def test_grouped_sum_noise_off(spark, lineitem, li_domain):
    m = create_sum_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=EPS_OFF,
        measure_column="l_quantity",
        lower=0,
        upper=50,
        groupby_transformation=_flag_groupby(li_domain),
        sum_column="sum_qty",
    )
    got = {r["l_returnflag"]: r["sum_qty"] for r in m(lineitem).collect()}
    clipped = F.least(F.greatest(F.col("l_quantity"), F.lit(0.0)), F.lit(50.0))
    expected = {
        r["l_returnflag"]: r["s"]
        for r in lineitem.groupBy("l_returnflag").agg(F.sum(clipped).alias("s")).collect()
    }
    assert got["Z"] == 0.0
    for k in ("A", "N", "R"):
        assert got[k] == pytest.approx(expected[k])


def test_scalar_sum_clipping(spark, lineitem, li_domain):
    m = create_sum_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=EPS_OFF,
        measure_column="l_quantity",
        lower=0,
        upper=10,
    )
    clipped = F.least(F.greatest(F.col("l_quantity"), F.lit(0.0)), F.lit(10.0))
    expected = lineitem.select(F.sum(clipped)).first()[0]
    assert float(m(lineitem)) == pytest.approx(expected)


def test_grouped_average_noise_off(spark, lineitem, li_domain):
    m = create_average_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=EPS_OFF,
        measure_column="l_quantity",
        lower=0,
        upper=50,
        groupby_transformation=_flag_groupby(li_domain),
        average_column="avg_qty",
    )
    got = {r["l_returnflag"]: r["avg_qty"] for r in m(lineitem).collect()}
    clipped = F.least(F.greatest(F.col("l_quantity"), F.lit(0.0)), F.lit(50.0))
    expected = {
        r["l_returnflag"]: r["a"]
        for r in lineitem.groupBy("l_returnflag").agg(F.avg(clipped).alias("a")).collect()
    }
    for k in ("A", "N", "R"):
        assert got[k] == pytest.approx(expected[k])
    assert got["Z"] == pytest.approx(25.0)  # empty group -> midpoint


def test_variance_noise_off(spark, lineitem, li_domain):
    m = create_variance_measurement(
        li_domain,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=EPS_OFF,
        measure_column="l_quantity",
        lower=0,
        upper=50,
    )
    expected = lineitem.select(
        F.var_pop(F.least(F.greatest(F.col("l_quantity"), F.lit(0.0)), F.lit(50.0)))
    ).first()[0]
    assert float(m(lineitem)) == pytest.approx(expected, rel=1e-9)


def test_zcdp_grouped_count(spark, lineitem, li_domain):
    m = create_count_measurement(
        li_domain,
        SymmetricDifference(),
        RhoZCDP(),
        d_in=1,
        d_out=1,
        groupby_transformation=_flag_groupby(li_domain, use_l2=True),
    )
    assert m.privacy_function(1) == 1
    rows = m(lineitem).collect()
    assert len(rows) == 4


def test_partition_selection(spark, lineitem, li_domain):
    flags = lineitem.select("l_returnflag", "l_linestatus")
    dom = SparkDataFrameDomain.from_spark_schema(flags.schema)
    m = create_partition_selection_measurement(
        dom, epsilon=1, delta="1/1000000", count_column="count"
    )
    eps, delta = m.privacy_function(1)
    assert eps <= 1 and delta <= ExactNumber("1/1000000")
    out = m(flags)
    # every kept group has noisy count >= threshold; common groups survive whp
    assert out.filter(F.col("count") < m.threshold).count() == 0
    assert out.count() >= 1
