"""Measure the reference (tumult-core) on this hardware, same workloads
and scale as ``bench.py``, writing REFERENCE_BENCH.json.

The reference cannot be pip-installed here, so it runs from a copied
source tree with three shims (see ``benchmarks/setup_reference.sh``):

* ``typeguard`` — no-op decorator (runtime type checks skipped: makes
  the reference FASTER than its packaged form);
* ``randomgen``-backed RNG — replaced by NumPy PCG64 seeded from
  ``os.urandom`` (PCG64 is at least as fast as the RDRAND loop);
* ``tmlt.core.utils.arb`` — float-midpoint shim for the vendored Arb
  interval library (no compiled libarb in this container).  Every
  precision-doubling sampler loop therefore terminates on its first
  iteration, i.e. continuous noise and quantile selection run FASTER
  than the real Arb-backed reference.

All three substitutions only ever make the reference faster, so the
recorded numbers are a LOWER bound on real reference wall-clock and the
rebuild/reference ratios in BENCH_r*.json are an upper bound (the honest
direction for the <=2x gate).

The ``noise_sampling`` workload draws ``NOISE_SAMPLE_N`` values per
mechanism through the reference's per-value samplers and extrapolates
linearly to the 2M-draw workload of ``bench.py`` (pure per-value loops
have no fixed cost to amortize); the JSON records the extrapolation.

Workload parity map (bench.py -> this file): groupby_count_sum,
quantile, public_join, private_join, map_flatmap, partition_selection,
bounds, noise_sampling.  Extension workloads (dedup/ANN/text) have no
reference counterpart — the reference implements none of them.
"""

from __future__ import annotations

import json
import os
import sys
import time

REF_ROOT = os.environ.get("REFBENCH_ROOT", "/tmp/refbench")
sys.path.insert(0, os.path.join(REF_ROOT, "shims"))
sys.path.insert(0, REF_ROOT)
# sys.path above only covers the DRIVER; the reference's pandas-UDF
# workloads unpickle tmlt inside Python workers, which resolve imports
# from PYTHONPATH.  Export it BEFORE the SparkSession exists so local
# workers inherit it (without this every UDF workload dies with
# ModuleNotFoundError('tmlt') and records null).
os.environ["PYTHONPATH"] = os.pathsep.join(
    [os.path.join(REF_ROOT, "shims"), REF_ROOT]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NOISE_SAMPLE_N = int(os.environ.get("REFBENCH_NOISE_N", "100000"))
NOISE_TARGET_N = 2_000_000  # matches bench.py's per-mechanism draw count


def get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("tcs-refbench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _strict(desc):
    """Non-nullable / no-NaN / no-inf variant of a column descriptor.

    The testdata tables contain no nulls or NaNs, and several reference
    paths (noise-column pandas conversion, quantile) require the domain
    to promise that.
    """
    import dataclasses

    kwargs = {"allow_null": False}
    if hasattr(desc, "allow_nan"):
        kwargs.update(allow_nan=False, allow_inf=False)
    return dataclasses.replace(desc, **kwargs)


def _domain(df):
    from tmlt.core.domains.spark_domains import (
        SparkDataFrameDomain,
        convert_spark_schema,
    )

    return SparkDataFrameDomain(
        {name: _strict(d) for name, d in convert_spark_schema(df.schema).items()}
    )


def _load(spark, table):
    """Read a testdata table, casting TimestampNTZ columns (Spark 4's
    parquet default) to TimestampType, which is what the reference's
    domain layer supports.  Happens outside the timed measurements."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def bench_groupby_count_sum(spark):
    from pyspark.sql import functions as F
    from tmlt.core.measures import PureDP
    from tmlt.core.metrics import SymmetricDifference
    from tmlt.core.measurements.aggregations import (
        NoiseMechanism,
        create_count_measurement,
        create_sum_measurement,
    )
    from tmlt.core.transformations.spark_transformations.groupby import (
        create_groupby_from_list_of_keys,
    )

    li = _load(spark, "lineitem")
    dom = _domain(li)
    keys = [(a, b) for a in ["A", "N", "R"] for b in ["F", "O"]]
    gb = create_groupby_from_list_of_keys(
        dom, SymmetricDifference(), False, ["l_returnflag", "l_linestatus"], keys
    )
    mc = create_count_measurement(
        dom,
        SymmetricDifference(),
        PureDP(),
        d_out=1,
        noise_mechanism=NoiseMechanism.GEOMETRIC,
        d_in=1,
        groupby_transformation=gb,
    )
    mc(li).collect()

    # bench.py derives the integer qty column with a JVM expression
    # (DeriveColumn); the reference has no JVM derive operator, so the
    # cast happens OUTSIDE the timed reference measurement — another
    # reference-favoring simplification.
    li2 = li.withColumn("qty", F.floor(F.col("l_quantity")).cast("long"))
    dom2 = _domain(li2)
    gb2 = create_groupby_from_list_of_keys(
        dom2, SymmetricDifference(), False, ["l_returnflag", "l_linestatus"], keys
    )
    ms = create_sum_measurement(
        dom2,
        SymmetricDifference(),
        PureDP(),
        d_out=1,
        noise_mechanism=NoiseMechanism.GEOMETRIC,
        measure_column="qty",
        lower=0,
        upper=50,
        d_in=1,
        groupby_transformation=gb2,
        sum_column="sum_qty",
    )
    ms(li2).collect()


def bench_quantile(spark):
    from tmlt.core.measures import PureDP
    from tmlt.core.metrics import SymmetricDifference
    from tmlt.core.measurements.aggregations import create_quantile_measurement
    from tmlt.core.transformations.spark_transformations.groupby import (
        create_groupby_from_list_of_keys,
    )

    li = _load(spark, "lineitem")
    dom = _domain(li)
    gb = create_groupby_from_list_of_keys(
        dom, SymmetricDifference(), False, ["l_returnflag"], [("A",), ("N",), ("R",)]
    )
    m = create_quantile_measurement(
        dom,
        SymmetricDifference(),
        PureDP(),
        d_out=1,
        measure_column="l_extendedprice",
        quantile=0.5,
        lower=0,
        upper=100000,
        d_in=1,
        groupby_transformation=gb,
    )
    m(li).collect()


def bench_public_join(spark):
    from tmlt.core.metrics import SymmetricDifference
    from tmlt.core.transformations.spark_transformations.join import PublicJoin
    from tmlt.core.transformations.spark_transformations.rename import Rename

    orders = _load(spark, "orders")
    cust = _load(spark, "customer")
    dom = _domain(orders)
    ren = Rename(dom, SymmetricDifference(), {"o_custkey": "c_custkey"})
    pj = PublicJoin(ren.output_domain, SymmetricDifference(), cust)
    (ren | pj)(orders).count()


def bench_private_join(spark):
    from pyspark.sql import functions as F
    from tmlt.core.domains.collections import DictDomain
    from tmlt.core.transformations.spark_transformations.join import (
        PrivateJoin,
        TruncationStrategy,
    )

    li = _load(spark, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    orders = _load(spark, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_totalprice"
    )
    dd = DictDomain({"l": _domain(li), "r": _domain(orders)})
    t = PrivateJoin(
        dd, "l", "r", TruncationStrategy.TRUNCATE, TruncationStrategy.TRUNCATE, 4, 2
    )
    t({"l": li, "r": orders}).count()


def bench_map_flatmap(spark):
    from pyspark.sql import Row
    from tmlt.core.domains.spark_domains import (
        SparkFloatColumnDescriptor,
        SparkRowDomain,
        convert_spark_schema,
    )
    from tmlt.core.metrics import SymmetricDifference
    from tmlt.core.transformations.spark_transformations.map import (
        FlatMap,
        Map,
        RowToRowsTransformation,
        RowToRowTransformation,
    )
    from tmlt.core.transformations.spark_transformations.select import Select

    li = _load(spark, "lineitem")
    dom = _domain(li)
    sel = Select(dom, SymmetricDifference(), ["l_extendedprice", "l_discount"])
    in_schema = {
        name: _strict(d)
        for name, d in convert_spark_schema(
            li.select("l_extendedprice", "l_discount").schema
        ).items()
    }
    out_schema = dict(in_schema)
    out_schema["revenue"] = SparkFloatColumnDescriptor(size=64)
    m = Map(
        metric=SymmetricDifference(),
        row_transformer=RowToRowTransformation(
            SparkRowDomain(in_schema),
            SparkRowDomain(out_schema),
            lambda r: Row(revenue=r["l_extendedprice"] * (1 - r["l_discount"])),
            augment=True,
        ),
    )
    (sel | m)(li).count()

    from tmlt.core.domains.collections import ListDomain

    fm = FlatMap(
        metric=SymmetricDifference(),
        row_transformer=RowToRowsTransformation(
            SparkRowDomain(in_schema),
            ListDomain(SparkRowDomain({"v": SparkFloatColumnDescriptor(size=64)})),
            lambda r: [Row(v=r["l_extendedprice"]), Row(v=r["l_discount"])],
            augment=False,
        ),
        max_num_rows=2,
    )
    (sel | fm)(li).count()


def bench_partition_selection(spark):
    from tmlt.core.measurements.aggregations import (
        create_partition_selection_measurement,
    )

    li = _load(spark, "lineitem").select(
        "l_suppkey", "l_returnflag"
    )
    m = create_partition_selection_measurement(_domain(li), 1, "1/1000000")
    m(li).count()


def bench_bounds(spark):
    from tmlt.core.measures import PureDP
    from tmlt.core.metrics import SymmetricDifference
    from tmlt.core.measurements.aggregations import create_bounds_measurement

    li = _load(spark, "lineitem").select("l_partkey")
    m = create_bounds_measurement(
        _domain(li),
        SymmetricDifference(),
        PureDP(),
        d_out=10,
        measure_column="l_partkey",
        threshold=0.95,
    )
    m(li)


def bench_noise_sampling(spark):
    """Per-value reference samplers; timed at NOISE_SAMPLE_N draws and
    linearly extrapolated to bench.py's 2M draws per mechanism."""
    from fractions import Fraction

    from tmlt.core.random.laplace import laplace
    from tmlt.core.random.continuous_gaussian import gaussian
    from tmlt.core.random.discrete_gaussian import (
        _sample_geometric_exp_slow,
        sample_dgauss,
    )

    n = NOISE_SAMPLE_N
    for _ in range(n):
        laplace(0.0, 1.0)
    one = Fraction(1)
    for _ in range(n):
        _sample_geometric_exp_slow(one) - _sample_geometric_exp_slow(one)
    for _ in range(n):
        gaussian(1.0)
    for _ in range(n):
        sample_dgauss(1)


BENCHES = {
    "groupby_count_sum": bench_groupby_count_sum,
    "quantile": bench_quantile,
    "public_join": bench_public_join,
    "private_join": bench_private_join,
    "map_flatmap": bench_map_flatmap,
    "partition_selection": bench_partition_selection,
    "bounds": bench_bounds,
    "noise_sampling": bench_noise_sampling,
}


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    _load(spark, "lineitem").count()

    timings = {}
    for name, fn in BENCHES.items():
        try:
            fn(spark)  # warmup (UDF worker startup, codegen, AQE stats)
            start = time.perf_counter()
            fn(spark)
            elapsed = time.perf_counter() - start
            if name == "noise_sampling":
                elapsed *= NOISE_TARGET_N / NOISE_SAMPLE_N
            timings[name] = round(elapsed, 3)
        except Exception as exc:  # pragma: no cover
            timings[name] = None
            print(f"# refbench {name} failed: {exc!r}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v is not None), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "reference_headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "notes": {
            "source": "tumult-core v0.18.2 from /root/reference/src, shimmed",
            "shims": [
                "typeguard no-op (skips runtime type checks: faster)",
                "PCG64/os.urandom RNG instead of randomgen RDRAND",
                "float-midpoint Arb (no compiled libarb): continuous "
                "samplers and quantile selection terminate in one "
                "precision round — faster than the real reference",
            ],
            "direction": "all shims only speed the reference up; these "
            "numbers are a lower bound on real reference wall-clock",
            "noise_sampling_extrapolated_from_n": NOISE_SAMPLE_N,
        },
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "REFERENCE_BENCH.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
