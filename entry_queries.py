"""Spark-side half of the driver contract: ``entry`` (flagship DP
query) and ``queries`` (one deterministic entry per operator family,
SURVEY.md §2 + extensions).  Split out of ``__spark_entry__.py`` so the
contract file stays reviewable; the oracles live in
``entry_oracles.py``.  ``__spark_entry__`` re-exports both surfaces —
import from there.
"""


from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INF = float("inf")  # infinite budget -> zero noise -> deterministic


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dom(df: DataFrame, strict: bool = True):
    from tumult_core_spark.domains import SparkDataFrameDomain

    return SparkDataFrameDomain.from_spark_schema(df.schema, strict=strict)


def _flag_keys_groupby(domain, extra_missing_key: bool = True, use_l2: bool = False):
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.groupby import (
        create_groupby_from_list_of_keys,
    )

    keys = [("A",), ("N",), ("R",)] + ([("X",)] if extra_missing_key else [])
    return create_groupby_from_list_of_keys(
        domain, SymmetricDifference(), use_l2, ["l_returnflag"], keys
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: eps=1 DP count of lineitem per return flag (sf0.001)."""
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_count_measurement

    li = _load(spark, "/root/testdata/sf0.001", "lineitem")
    dom = _dom(li)
    m = create_count_measurement(
        dom,
        SymmetricDifference(),
        PureDP(),
        d_in=1,
        d_out=1,
        groupby_transformation=_flag_keys_groupby(dom),
    )
    return m(li)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_filter_select(spark, sf_dir):
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.rows import Filter, Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    t = Filter(dom, SymmetricDifference(), "l_quantity < 25") | Select(
        dom, SymmetricDifference(), ["l_orderkey", "l_quantity"]
    )
    return t(li)


def q_rename(spark, sf_dir):
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.rows import Rename, Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(dom, SymmetricDifference(), ["l_orderkey", "l_returnflag"])
    ren = Rename(sel.output_domain, SymmetricDifference(), {"l_returnflag": "flag"})
    return (sel | ren)(li)


def q_groupby_count(spark, sf_dir):
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_count_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    m = create_count_measurement(
        dom, SymmetricDifference(), PureDP(), 1, INF,
        groupby_transformation=_flag_keys_groupby(dom),
    )
    return m(li)


def q_groupby_count_distinct(spark, sf_dir):
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_count_distinct_measurement,
    )
    from tumult_core_spark.transformations.rows import Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(dom, SymmetricDifference(), ["l_returnflag", "l_orderkey"])
    sub = sel(li)
    sub_dom = sel.output_domain
    m = create_count_distinct_measurement(
        sub_dom, SymmetricDifference(), PureDP(), 1, INF,
        groupby_transformation=_flag_keys_groupby(sub_dom),
        count_column="n_distinct",
    )
    return m(sub)


def _with_qty_long(li, dom):
    from tumult_core_spark.domains import SparkIntegerColumnDescriptor
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.derive import DeriveColumn

    t = DeriveColumn(
        dom,
        SymmetricDifference(),
        "qty",
        "cast(floor(l_quantity) as long)",
        SparkIntegerColumnDescriptor(size=64),
    )
    return t, t.output_domain


def q_groupby_sum(spark, sf_dir):
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_sum_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    m = create_sum_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
        groupby_transformation=_flag_keys_groupby(dom2),
        sum_column="sum_qty",
    )
    return ChainTM(derive, m)(li)


def q_total_counts(spark, sf_dir):
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_count_distinct_measurement,
        create_count_measurement,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    n = int(create_count_measurement(dom, SymmetricDifference(), PureDP(), 1, INF)(li))
    nd = int(
        create_count_distinct_measurement(
            dom, SymmetricDifference(), PureDP(), 1, INF
        )(li)
    )
    return spark.createDataFrame([(n, nd)], "n_rows long, n_distinct long")


def q_average(spark, sf_dir):
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_average_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    m = create_average_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
        groupby_transformation=_flag_keys_groupby(dom2),
        average_column="avg_qty",
    )
    return ChainTM(derive, m)(li)


def q_variance(spark, sf_dir):
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_variance_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    m = create_variance_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
    )
    var = float(ChainTM(derive, m)(li))
    out = spark.createDataFrame([(var,)], "var_qty double")
    return out.select(F.round("var_qty", 6).alias("var_qty"))


def q_variance_intermediates(spark, sf_dir):
    """Grouped variance with keep_intermediates: the noisy sod/sos/
    count accompany the variance column (noise-off here, so all four
    are exact and SQL-replayable, including the 0-filled absent key)."""
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_variance_measurement,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    m = create_variance_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
        groupby_transformation=_flag_keys_groupby(dom2),
        variance_column="var_qty", keep_intermediates=True,
        sum_of_deviations_column="sod_qty",
        sum_of_squared_deviations_column="sos_qty", count_column="n",
    )
    out = ChainTM(derive, m)(li)
    return out.select(
        "l_returnflag", F.round("var_qty", 6).alias("var_qty"),
        "sod_qty", "sos_qty", "n",
    )


def q_fused_moments(spark, sf_dir):
    """Average, variance AND stddev of clipped l_quantity per return
    flag from ONE aggregation scan — the FusedMomentsMeasurement
    beyond-reference optimization (aggregations.py:692).  The
    reference's compositional recipe (reference aggregations.py:
    829-1567) runs one measurement per statistic, i.e. 2-3 full input
    scans; here a single groupBy produces (sod, sos, count) and every
    statistic is post-processing.  Noise off (d_out = inf) so the
    DuckDB oracle replays all three exactly, including the 0-filled
    absent key 'X' (avg = midpoint, var = std = 0)."""
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        FusedMomentsMeasurement,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    gb = _flag_keys_groupby(dom2)
    keys = gb.groupby_columns
    mid = 25.0  # exact midpoint of the integral clip bounds [0, 50]

    def post(df):
        n = F.greatest(F.col("count"), F.lit(1))
        ratio = F.col("sod") / n
        var = F.greatest(F.col("sos") / n - ratio * ratio, F.lit(0.0))
        return df.select(
            *keys,
            F.round(ratio + F.lit(mid), 6).alias("avg_qty"),
            F.round(var, 6).alias("var_qty"),
            F.round(F.sqrt(var), 6).alias("std_qty"),
        )

    m = FusedMomentsMeasurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50, include_squares=True,
        groupby_transformation=gb, postprocess=post,
    )
    return ChainTM(derive, m)(li)


def q_json_extract(spark, sf_dir):
    """Typed JSON field extraction from the events.props column (pure
    Catalyst get_json_object) feeding a grouped aggregate — the
    semi-structured projection every event pipeline runs at scan
    speed."""
    from tumult_core_spark.extensions.semistructured import extract_json_fields

    ev = _load(spark, sf_dir, "events").select("event_id", "event_type", "props")
    out = extract_json_fields(ev, "props", {"k": ("$.k", "long")})
    return (
        out.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_public_join(spark, sf_dir):
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.join import PublicJoin
    from tumult_core_spark.transformations.rows import Rename, Select

    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    dom = _dom(orders)
    ren = Rename(dom, SymmetricDifference(), {"o_custkey": "c_custkey"})
    pj = PublicJoin(ren.output_domain, SymmetricDifference(), cust)
    sel = Select(
        pj.output_domain,
        SymmetricDifference(),
        ["c_custkey", "o_orderkey", "o_totalprice", "c_name"],
    )
    return (ren | pj | sel)(orders)


def q_private_join_drop(spark, sf_dir):
    from tumult_core_spark.domains import DictDomain
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.join import (
        PrivateJoin,
        TruncationStrategy,
    )

    li = _load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_linenumber"
    )
    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    dd = DictDomain({"l": _dom(li), "r": _dom(orders)})
    t = PrivateJoin(
        dd, "l", "r",
        TruncationStrategy.DROP, TruncationStrategy.DROP,
        4, 2,
    )
    return t({"l": li, "r": orders})


def q_limit_rows_per_group(spark, sf_dir):
    from tumult_core_spark.metrics import IfGroupedBy, SymmetricDifference
    from tumult_core_spark.transformations.truncation import LimitRowsPerGroup

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    t = LimitRowsPerGroup(dom, IfGroupedBy("l_orderkey", SymmetricDifference()), 3)
    out = t(li)
    return out.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))


def q_limit_keys_per_group(spark, sf_dir):
    from tumult_core_spark.metrics import IfGroupedBy, SymmetricDifference
    from tumult_core_spark.transformations.truncation import LimitKeysPerGroup

    orders = _load(spark, sf_dir, "orders")
    dom = _dom(orders)
    t = LimitKeysPerGroup(
        dom, IfGroupedBy("o_custkey", SymmetricDifference()), "o_orderkey", 2
    )
    out = t(orders)
    return out.groupBy("o_custkey").agg(
        F.countDistinct("o_orderkey").alias("n_keys")
    )


def q_partition_selection(spark, sf_dir):
    from tumult_core_spark.domains import SparkDataFrameDomain
    from tumult_core_spark.measurements.spark import GeometricPartitionSelection

    li = _load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    dom = _dom(li)
    m = GeometricPartitionSelection(dom, threshold=20, alpha=0, count_column="count")
    return m(li)


def q_bounds(spark, sf_dir):
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_bounds_measurement

    li = _load(spark, sf_dir, "lineitem").select("l_partkey")
    dom = _dom(li)
    m = create_bounds_measurement(
        dom, SymmetricDifference(), PureDP(), INF, "l_partkey", threshold=0.95
    )
    lo, hi = m(li)
    return spark.createDataFrame([(int(lo), int(hi))], "lower long, upper long")


def q_quantile_median(spark, sf_dir):
    """eps=inf quantile interval endpoints per group — the
    deterministic, oracle-checkable core of the exponential-mechanism
    quantile (the noisy path is distribution-tested in pytest)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.measurements.quantile import NoisyQuantile

    li = _load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dom = _dom(li)
    gb = _flag_keys_groupby(dom, extra_missing_key=False)
    nq = NoisyQuantile("l_quantity", 0.5, 0.0, 50.0, INF, PureDP())

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["l_quantity"].to_numpy(dtype=float)
        lo, hi = nq.select_interval(vals, np.ones(len(vals)))
        return pd.DataFrame({"q_lo": [lo], "q_hi": [hi]})

    schema = T.StructType(
        [
            T.StructField("q_lo", T.DoubleType()),
            T.StructField("q_hi", T.DoubleType()),
        ]
    )
    return gb(li).apply_in_pandas(pick, schema)


def q_partition_by_keys(spark, sf_dir):
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.partition import PartitionByKeys

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    t = PartitionByKeys(
        dom, SymmetricDifference(), False, ["l_returnflag"], [("A",), ("N",), ("R",)]
    )
    parts = t(li)
    counts = [(flag, p.count()) for (flag,), p in zip([("A",), ("N",), ("R",)], parts)]
    return spark.createDataFrame(counts, "l_returnflag string, n long")


def q_map_derive(spark, sf_dir):
    """Row-UDF Map (mapInPandas) computing revenue per lineitem row."""
    from tumult_core_spark.domains import (
        SparkFloatColumnDescriptor,
        SparkRowDomain,
    )
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.map import Map, RowToRowTransformation
    from tumult_core_spark.transformations.rows import Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(
        dom, SymmetricDifference(), ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    in_schema = dict(sel.output_domain.schema)
    out_schema = dict(in_schema)
    out_schema["revenue"] = SparkFloatColumnDescriptor(size=64)
    rt = RowToRowTransformation(
        SparkRowDomain(in_schema),
        SparkRowDomain(out_schema),
        lambda row: {"revenue": row["l_extendedprice"] * (1.0 - row["l_discount"])},
        augment=True,
    )
    m = Map(SymmetricDifference(), rt)
    out = (sel | m)(li)
    return out.select(
        "l_orderkey", F.round("revenue", 4).alias("revenue")
    )


def q_flatmap_by_key(spark, sf_dir):
    """FlatMapByKey: per-order line count + max quantity via applyInPandas."""
    from tumult_core_spark.domains import (
        SparkFloatColumnDescriptor,
        SparkIntegerColumnDescriptor,
        SparkRowDomain,
    )
    from tumult_core_spark.metrics import IfGroupedBy, SymmetricDifference
    from tumult_core_spark.transformations.map import (
        FlatMapByKey,
        RowsToRowsTransformation,
    )

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dom = _dom(li)
    rt = RowsToRowsTransformation(
        SparkRowDomain({"l_quantity": dom["l_quantity"]}),
        SparkRowDomain(
            {
                "n_lines": SparkIntegerColumnDescriptor(size=64),
                "max_qty": SparkFloatColumnDescriptor(size=64),
            }
        ),
        lambda rows: [
            {
                "n_lines": len(rows),
                "max_qty": max(r["l_quantity"] for r in rows) if rows else 0.0,
            }
        ],
    )
    t = FlatMapByKey(dom, IfGroupedBy("l_orderkey", SymmetricDifference()), rt)
    return t(li)


def q_replace_nulls(spark, sf_dir):
    """Left join creates nulls; ReplaceNulls fills them (events x dims)."""
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.join import PublicJoin
    from tumult_core_spark.transformations.rows import ReplaceNulls, Select

    cust = _load(spark, sf_dir, "customer")
    nat = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    ).filter("c_nationkey < 10")
    dom = _dom(cust)
    pj = PublicJoin(dom, SymmetricDifference(), nat, how="left")
    rn = ReplaceNulls(pj.output_domain, SymmetricDifference(), {"n_name": "UNKNOWN"})
    sel = Select(
        rn.output_domain, SymmetricDifference(), ["c_custkey", "n_name"]
    )
    return (pj | rn | sel)(cust)


def q_dedup_exact(spark, sf_dir):
    # Exercises the deterministic-survivor path (r15): columns is a
    # PROPER subset, so exact_dedup must keep the min(struct(doc_id))
    # row per text — the oracle pins MIN(doc_id), which an arbitrary
    # dropDuplicates survivor would fail under partition reshuffles.
    from tumult_core_spark.extensions.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")
    return exact_dedup(docs.select("doc_id", "text"), ["text"])


def _with_total_pairs(pairs, planted_filter):
    """Planted-pair projection + a ``total_pairs`` column carrying the
    size of the FULL pair set.  The projection alone would let recall
    loss or over-generation outside the planted subset go unnoticed;
    the total (deterministic: signatures, banding, and the hash-ordered
    bucket cap are all partition-invariant) is pinned as a constant in
    the oracle SQL, so any behavior change over the whole corpus flips
    the hash check."""
    total = pairs.agg(F.count(F.lit(1)).alias("total_pairs"))
    return pairs.filter(planted_filter).select("id_a", "id_b").crossJoin(total)


def q_dedup_minhash(spark, sf_dir):
    """Containment oracle: every planted exact-duplicate pair must be
    an LSH candidate; projecting the candidate set onto the planted
    pairs makes the superset property a hash-equality check, and
    ``total_pairs`` pins the full candidate-set cardinality."""
    from tumult_core_spark.extensions.dedup import minhash_lsh_candidate_pairs

    docs = _load(spark, sf_dir, "documents")
    planted = docs.filter("doc_id < 50")
    dup = planted.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    both = docs.union(dup)
    pairs = minhash_lsh_candidate_pairs(
        both, "doc_id", "text", num_hashes=32, bands=8
    )
    return _with_total_pairs(
        pairs,
        (F.col("id_b") - F.col("id_a") == 10_000_000) & (F.col("id_a") < 50),
    )


def q_dedup_simhash(spark, sf_dir):
    """Containment oracle (see q_dedup_minhash): identical docs have
    identical SimHash signatures, so every planted pair must appear."""
    from tumult_core_spark.extensions.dedup import simhash_near_duplicates

    docs = _load(spark, sf_dir, "documents")
    planted = docs.filter("doc_id < 50")
    dup = planted.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    both = docs.union(dup)
    pairs = simhash_near_duplicates(both, "doc_id", "text", max_hamming=0)
    return _with_total_pairs(
        pairs,
        (F.col("id_b") - F.col("id_a") == 10_000_000) & (F.col("id_a") < 50),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Containment oracle: planted duplicates have Jaccard 1 >= 0.99."""
    from tumult_core_spark.extensions.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents").filter("doc_id < 100")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    both = docs.union(dup)
    out = ngram_jaccard_pairs(both, "doc_id", "text", n=3, threshold=0.99)
    return _with_total_pairs(
        out,
        (F.col("id_b") - F.col("id_a") == 10_000_000) & (F.col("id_a") < 100),
    )


def q_embedding_outliers(spark, sf_dir):
    """Per-label centroid distance over the embeddings table — the
    embedding-space quality filter (vectors far from their label
    centroid are mislabeled/junk).  Centroids come from a groups x dim
    partial-aggregated shuffle and broadcast back; the corpus is
    scanned once with the distance evaluated JVM-side
    (similarity.py::embedding_outliers)."""
    from tumult_core_spark.extensions.similarity import embedding_outliers

    emb = _load(spark, sf_dir, "embeddings")
    out = embedding_outliers(emb, "vec_id", "embedding", "label")
    return out.select(
        "vec_id", "label", F.round("centroid_dist", 6).alias("centroid_dist")
    )


def q_pagerank(spark, sf_dir):
    """3 synchronous PageRank iterations over the (customer, nation)
    bipartite membership graph (ids disambiguated into even/odd
    lanes) — link-graph centrality as a corpus-curation weight
    (components.py::pagerank).  Scaled by the node count so the
    6-decimal driver rounding keeps resolution."""
    from tumult_core_spark.extensions.components import pagerank

    cust = _load(spark, sf_dir, "customer")
    edges = cust.select(
        (F.col("c_custkey") * 2).alias("id_a"),
        (F.col("c_nationkey") * 2 + 1).alias("id_b"),
    )
    pr = pagerank(edges, iterations=3)
    n = pr.count()
    return pr.select(
        "node", F.round(F.col("rank") * n, 6).alias("rank_scaled")
    )


def q_hll_distinct(spark, sf_dir):
    """Mergeable-sketch distinct counting: per-event_type approximate
    distinct users PLUS the grand total from ONE scan (the total row
    is the lossless union of the per-group sketches —
    sketches.py::hll_rollup).  Self-validating oracle form: the exact
    distinct count is emitted alongside a boolean pinning the sketch
    estimate within 2.5% of it, so the oracle replays the exact count
    and the literal TRUE — a broken sketch flips the hash.  The bound
    is a real guarantee, not a lucky draw: at lg_k=14 HLL's relative
    standard error is ~1.04/sqrt(2^14) ~= 0.81%, so 2.5% is ~3 sigma
    — a healthy sketch passes on any corpus/SF."""
    from tumult_core_spark.extensions.sketches import hll_rollup

    ev = _load(spark, sf_dir, "events")
    approx = hll_rollup(ev, "user_id", ["event_type"], lg_k=14)
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .unionByName(
            ev.agg(F.countDistinct("user_id").alias("n_users")).select(
                F.lit("__all__").alias("event_type"), "n_users"
            )
        )
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("approx_distinct") - F.col("n_users"))
            <= 0.025 * F.col("n_users")
        ).alias("hll_ok"),
    )


def q_approx_quantile_check(spark, sf_dir):
    """Sketch quantiles with their contract checked in-query: Spark's
    percentile_approx guarantees the returned element's exact rank is
    within 1/accuracy of the target (sketches.py::approx_quantiles).
    The estimate itself isn't DuckDB-replayable, so — like
    hll_distinct — the query emits the exact value count plus a
    boolean asserting the rank window [rank<(est), rank<=(est)]
    intersects [p - eps - 1/n, p + eps + 1/n]; the oracle replays the
    count and the literal TRUE, and a drifting sketch flips the hash."""
    from tumult_core_spark.extensions.sketches import approx_quantiles

    acc = 1000
    probs = [0.25, 0.5, 0.75]
    ev = _load(spark, sf_dir, "events").select("event_type", "value")
    est = approx_quantiles(
        ev, "value", probs, accuracy=acc, group_cols=["event_type"]
    )
    checked = (
        ev.join(est, "event_type")
        .groupBy("event_type", "prob")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum((F.col("value") < F.col("approx_quantile")).cast("long"))
                / F.count(F.lit(1))
            ).alias("rank_lt"),
            (
                F.sum((F.col("value") <= F.col("approx_quantile")).cast("long"))
                / F.count(F.lit(1))
            ).alias("rank_le"),
        )
    )
    eps = 1.0 / acc
    slack = eps + 1.0 / F.col("n")
    ok = (F.col("rank_lt") <= F.col("prob") + slack) & (
        F.col("rank_le") >= F.col("prob") - slack
    )
    return checked.select("event_type", "prob", "n", ok.alias("rank_ok"))


def q_ann_topk(spark, sf_dir):
    from tumult_core_spark.extensions.similarity import brute_force_knn

    embs = _load(spark, sf_dir, "embeddings")
    queries = embs.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = brute_force_knn(embs, queries, "vec_id", "qid", "embedding", k=3)
    return out.select("qid", "vec_id", "rank")


def q_token_counts(spark, sf_dir):
    from tumult_core_spark.extensions.text import token_count

    docs = _load(spark, sf_dir, "documents")
    return token_count(docs, "text").select("doc_id", "n_tokens")


def q_lang_id(spark, sf_dir):
    from tumult_core_spark.extensions.text import language_id

    docs = _load(spark, sf_dir, "documents")
    return language_id(docs, "text").select("doc_id", "lang_pred")


def q_fingerprint_distinct(spark, sf_dir):
    from tumult_core_spark.extensions.text import document_fingerprint

    docs = _load(spark, sf_dir, "documents")
    out = document_fingerprint(docs, "text")
    n = out.select("fingerprint").distinct().count()
    return spark.createDataFrame([(n,)], "n_distinct long")


def q_quality_scores(spark, sf_dir):
    from tumult_core_spark.extensions.text import quality_score

    docs = _load(spark, sf_dir, "documents")
    return quality_score(docs, "text").select(
        "doc_id", F.round("quality", 6).alias("quality")
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals; the oracle replays the
    identical (kind, item) explode -> count -> conditional-aggregate
    arithmetic in SQL, so every fraction must match bit-for-bit after
    6-dp rounding."""
    from tumult_core_spark.extensions.text import repetition_stats

    docs = _load(spark, sf_dir, "documents")
    out = repetition_stats(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round("top_bigram_char_frac", 6).alias("top_bigram_char_frac"),
        F.round("dup_trigram_char_frac", 6).alias("dup_trigram_char_frac"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        "keep",
    )


def _epoch_us(col: str):
    """Epoch microseconds of a TIMESTAMP_NTZ column, independent of the
    session time zone (parquet timestamps load as NTZ in Spark 4, and
    ``unix_micros`` rejects NTZ; DuckDB's epoch_us treats the same
    naive value as UTC)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def q_asof_join(spark, sf_dir):
    """Each 'view' event joined to the user's most recent prior
    'error' event; DuckDB's native ASOF LEFT JOIN is the oracle.
    Timestamps are emitted as epoch microseconds so both engines
    compare integers."""
    from tumult_core_spark.extensions.timeseries import asof_join

    ev = _load(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").select("event_id", "user_id", "ts")
    errors = ev.filter("event_type = 'error'").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    out = asof_join(views, errors, ["user_id"], "ts", right_prefix="err_")
    return out.select(
        "event_id",
        "user_id",
        _epoch_us("ts").alias("ts_us"),
        _epoch_us("err_ts").alias("err_ts_us"),
        "err_err_value",
    ).withColumnRenamed("err_err_value", "err_value")


def q_time_rollup(spark, sf_dir):
    """Hourly tumbling-window rollup of events by type; oracle is
    DuckDB time_bucket."""
    from tumult_core_spark.extensions.timeseries import time_rollup

    ev = _load(spark, sf_dir, "events")
    out = time_rollup(
        ev, "ts", "1 hour", group_cols=["event_type"],
        agg_exprs={"n": F.count(F.lit(1)), "sum_value": F.round(F.sum("value"), 6)},
    )
    return out.select(
        _epoch_us("bucket_start").alias("bucket_us"),
        "event_type",
        "n",
        "sum_value",
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document; oracle replays the identical
    explode -> tf -> df -> smoothed-idf arithmetic in SQL (ln and
    double division agree bitwise across engines)."""
    from tumult_core_spark.extensions.text import tfidf_top_terms

    docs = _load(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=3)
    return out.select(
        "doc_id", "term", "tf", "df", F.round("score", 6).alias("score")
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-2 language mixing (downsample dominant languages
    toward share ∝ sqrt(w)).  Thresholds are a deterministic function
    of the sf0.01 lang histogram, pinned as constants in the oracle
    (same convention as the dedup_minhash total_pairs pin)."""
    from tumult_core_spark.extensions.sampling import temperature_mix

    docs = _load(spark, sf_dir, "documents")
    return temperature_mix(docs, "lang", "doc_id", temperature=2.0, seed=11).select(
        "doc_id", "lang"
    )


def q_pca_project(spark, sf_dir):
    """Distributed-sufficient-statistics PCA projection (top-2).  The
    eigendecomposition is not SQL-expressible, so the oracle reads an
    independent pyarrow+numpy re-derivation from a fixture parquet
    (tests/fixtures/make_pca_fixture.py, no tumult_core_spark
    imports); exactness vs numpy is also pinned in TestPCA."""
    from tumult_core_spark.extensions.similarity import pca_fit, pca_project

    embs = _load(spark, sf_dir, "embeddings")
    mean, comps, _ = pca_fit(embs, "embedding", k=2)
    out = pca_project(embs, "embedding", mean, comps)
    return out.select(
        "vec_id",
        F.round(F.element_at("pca", 1), 6).alias("pc1"),
        F.round(F.element_at("pca", 2), 6).alias("pc2"),
    )


def q_unigram_logprob(spark, sf_dir):
    """Self-corpus unigram LM score; oracle replays the identical
    explode -> frequency -> join -> avg(ln) arithmetic."""
    from tumult_core_spark.extensions.text import unigram_logprob

    docs = _load(spark, sf_dir, "documents")
    out = unigram_logprob(docs)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob")
    )


def q_bigram_logprob(spark, sf_dir):
    """Self-corpus add-1-smoothed bigram LM score; oracle replays the
    identical bigram explode -> transition/context counts -> join ->
    avg(ln) arithmetic."""
    from tumult_core_spark.extensions.text import bigram_logprob

    docs = _load(spark, sf_dir, "documents")
    out = bigram_logprob(docs)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logprob", 6).alias("avg_logprob")
    )


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted Bernoulli sampling: keep probability =
    quality score; oracle replays the mix + threshold integer
    arithmetic exactly."""
    from tumult_core_spark.extensions.sampling import weighted_sample
    from tumult_core_spark.extensions.text import quality_score

    docs = quality_score(_load(spark, sf_dir, "documents"))
    return weighted_sample(docs, "doc_id", "quality", seed=23).select(
        "doc_id", F.round("quality", 6).alias("quality")
    )


def q_fuzzy_join(spark, sf_dir):
    """Typo-tolerant entity resolution: customers joined to a planted
    single-character-deletion typo table at Levenshtein distance <= 1.
    The Spark path uses deletion-neighborhood (FastSS) blocking; the
    oracle brute-forces the cross join, so a hash match PROVES the
    blocking loses no pairs."""
    from tumult_core_spark.extensions.dedup import fuzzy_join_edit1

    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    typos = cust.filter("c_custkey < 200").select(
        (F.col("c_custkey") + 1_000_000).alias("t_id"),
        F.concat(
            F.expr("substring(c_name, 1, c_custkey % length(c_name))"),
            F.expr("substring(c_name, c_custkey % length(c_name) + 2)"),
        ).alias("t_name"),
    )
    out = fuzzy_join_edit1(cust, typos, "c_name", "t_name", "c_custkey", "t_id")
    return out.select(
        F.col("c_custkey_l").alias("c_custkey"),
        F.col("t_id_r").alias("t_id"),
        "distance",
    )


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (40-token windows, 10-token
    overlap); the oracle replays the identical sequence/slice/join
    arithmetic."""
    from tumult_core_spark.extensions.text import chunk_documents

    docs = _load(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=40, overlap=10)


def q_profile_numeric(spark, sf_dir):
    """Exact numeric column stats in one scan; SQL oracle."""
    from tumult_core_spark.utils.profile import profile_numeric

    li = _load(spark, sf_dir, "lineitem")
    out = profile_numeric(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return out.select(
        "column", "n_rows", "n_nulls",
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
        F.round("mean", 6).alias("mean"),
    )


def q_chunk_pack(spark, sf_dir):
    """Composed pipeline: overlapping token-window chunking feeding
    greedy sequence packing, verified end-to-end — the oracle chains
    the chunk SQL replay into the recursive packing CTE."""
    from tumult_core_spark.extensions.packing import pack_sequences
    from tumult_core_spark.extensions.text import chunk_documents

    docs = _load(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_tokens=40, overlap=10).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        "chunk_tokens",
    )
    return pack_sequences(chunks, "chunk_id", "chunk_tokens", window=40, num_buckets=8)


def q_rolling_aggregate(spark, sf_dir):
    """Per-row trailing 1-hour count/sum per user over the events
    stream, epoch-microsecond frame; the DECIMAL-accumulated sum makes
    the result engine-exact."""
    from tumult_core_spark.extensions.timeseries import rolling_aggregate

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _load(spark, sf_dir, "events")
    out = rolling_aggregate(ev, ["user_id"], "ts", "value", 3600)
    return out.select(
        "event_id", "rolling_count", F.round("rolling_sum", 6).alias("rolling_sum")
    )


def q_sessionize_batch(spark, sf_dir):
    """Batch gap-based sessionization (islands construction), 30-minute
    gap, event_id tiebreak; oracle replays lag -> running-sum -> group
    in SQL over the same epoch-microsecond ordering."""
    from tumult_core_spark.extensions.timeseries import sessionize_batch

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _load(spark, sf_dir, "events")
    return sessionize_batch(
        ev, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id"
    )


def q_preprocess_pipeline(spark, sf_dir):
    """Four-stage preprocessing DAG verified as ONE relation
    cross-engine: length gate -> corpus-wide paragraph dedup (with
    document reassembly) -> overlapping token-window chunking ->
    greedy sequence packing.  The oracle chains the paragraph-dedup
    replay into the chunking arithmetic into the recursive packing
    CTE — any divergence anywhere in the DAG breaks the hash."""
    from tumult_core_spark.extensions.dedup import dedup_paragraphs
    from tumult_core_spark.extensions.packing import pack_sequences
    from tumult_core_spark.extensions.text import chunk_documents

    docs = _load(spark, sf_dir, "documents").filter(F.col("n_chars") >= 250)
    deduped = dedup_paragraphs(docs, separator=" table ")
    chunks = chunk_documents(deduped, max_tokens=40, overlap=10).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        "chunk_tokens",
    )
    return pack_sequences(
        chunks, "chunk_id", "chunk_tokens", window=40, num_buckets=8
    )


def q_streaming_window_counts(spark, sf_dir):
    from tumult_core_spark.streaming import (
        read_stream_parquet,
        windowed_counts,
        write_stream_memory,
    )

    # day buckets must align with the (naive/UTC) oracle regardless of
    # the driver session's timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_stream_parquet(
        spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
    )
    agg = windowed_counts(stream, "ts", "24 hours", "48 hours", ["event_type"])
    name = "q_stream_win_counts"
    q = write_stream_memory(agg, name, output_mode="complete")
    q.awaitTermination(300)
    return spark.sql(
        f"select cast(window_start as date) as day, event_type, count from {name}"
    )


def q_streaming_dedup(spark, sf_dir):
    """Streaming exactly-once keys (dropDuplicatesWithinWatermark):
    emit each (user_id, event_type) pair once.  Which ROW survives a
    dedup is arrival-order dependent, so the query projects the key
    columns only — the surviving key SET is deterministic and equals
    SELECT DISTINCT."""
    from tumult_core_spark.streaming import (
        read_stream_parquet,
        write_stream_memory,
    )
    from tumult_core_spark.streaming.ops import streaming_dedup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_stream_parquet(
        spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
    ).select("user_id", "event_type", "ts")
    deduped = streaming_dedup(
        stream, ["user_id", "event_type"], "ts", watermark="48 hours"
    ).select("user_id", "event_type")
    name = "q_stream_dedup"
    q = write_stream_memory(deduped, name, output_mode="append")
    q.awaitTermination(300)
    return spark.sql(f"select user_id, event_type from {name}")


def q_normalize_text(spark, sf_dir):
    """Unicode NFC + lowercase + whitespace-collapse + trim text
    canonicalization; DuckDB replays it with nfc_normalize/lower/
    regexp_replace/trim byte-for-byte."""
    from tumult_core_spark.extensions.text import normalize_text

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    return normalize_text(docs, "text", out_col="norm_text", unicode_form="NFC")


def q_bpe_tokens(spark, sf_dir):
    """Distributed BPE: train 30 merges from the corpus word-frequency
    table, then encode every document.  The oracle is an independent
    from-scratch BPE implementation (tests/fixtures/make_bpe_fixture.py,
    pyarrow + stdlib only) over the same corpus — train and encode must
    agree token-for-token."""
    from tumult_core_spark.extensions.text import bpe_encode, bpe_train

    docs = _load(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=30)
    # array_join: the driver's pandas canonicalizer lexsorts output
    # columns and cannot factorize list cells, so serialize the token
    # array to one canonical string on both engines.
    return bpe_encode(docs, merges=merges).select(
        "doc_id", F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
        F.array_join("bpe_tokens", " ").alias("bpe_tokens"),
    )


def q_profile_quantiles(spark, sf_dir):
    """Exact per-column quantiles (type-7 linear interpolation) in one
    aggregate; DuckDB quantile_cont shares the definition bit-for-bit."""
    from tumult_core_spark.utils.profile import profile_quantiles

    li = _load(spark, sf_dir, "lineitem")
    out = profile_quantiles(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return out.select("column", "p", F.round("value", 6).alias("value"))


def q_sq_codes(spark, sf_dir):
    """Int8 scalar quantization of the embedding column: per-dimension
    min/max fit (one Catalyst scan, no explode) + affine encode.  The
    oracle recomputes the identical bounds and rounding arithmetic in
    SQL; codes must match exactly."""
    from tumult_core_spark.extensions.similarity import sq_encode, sq_fit

    embs = _load(spark, sf_dir, "embeddings")
    lo, hi = sq_fit(embs, "embedding")
    # serialize the int8 code array to a string: the driver's pandas
    # canonicalizer cannot sort list-valued cells (see q_bpe_tokens)
    return sq_encode(embs, "vec_id", "embedding", lo, hi).select(
        "vec_id",
        F.array_join(F.col("sq_code").cast("array<string>"), " ").alias("sq_code"),
    )


def q_sq_knn(spark, sf_dir):
    """Cosine top-k over the int8-quantized corpus (fit -> encode ->
    Catalyst decode -> BLAS top-k).  The oracle replays the whole
    chain in SQL — identical bounds, rounding, decode arithmetic —
    and ranks with the same (score DESC, vec_id ASC) tie-break;
    ranks only, scores excluded from the hash as in ann_topk."""
    from tumult_core_spark.extensions.similarity import sq_knn

    embs = _load(spark, sf_dir, "embeddings")
    queries = embs.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = sq_knn(embs, queries, "vec_id", "qid", "embedding", k=3)
    return out.select("qid", "vec_id", "rank")


def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (attribution window): each 'view'
    event pairs with the same user's 'purchase' events within the next
    30 minutes.  Both sides stream from the events parquet; the oracle
    is the equivalent batch range join.  Timestamps are emitted as
    epoch seconds so both engines compare exact integers."""
    from tumult_core_spark.streaming import (
        read_stream_parquet,
        stream_interval_join,
        write_stream_memory,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_stream_parquet(
        spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
    )
    views = stream.filter("event_type = 'view'").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    )
    buys = stream.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("buy_ts"), F.col("event_id").alias("buy_id")
    )
    joined = stream_interval_join(
        views, buys, ["user_id"], "view_ts", "buy_ts", 0, 1800
    )
    name = "q_stream_ivj"
    q = write_stream_memory(joined, name)
    q.awaitTermination(300)
    return spark.sql(
        f"""select user_id, view_id, buy_id,
                   unix_micros(view_ts) as view_epoch_us,
                   unix_micros(buy_ts) as buy_epoch_us
            from {name}"""
    )


def q_multimodal_features(spark, sf_dir):
    """Stubbed (deterministic, sha256-seeded) image-feature extraction
    through the full Arrow/mapInPandas plumbing; the oracle compares
    leading feature components against a fixture produced by an
    independent pyarrow+numpy path
    (tests/fixtures/make_multimodal_fixture.py).  decoder="fake"
    explicitly: text payloads are not images, and since r14 auto mode
    yields NULLs for undecodable payloads (the unified media-operator
    contract) — the stub path this entry pins lives in fake mode."""
    from tumult_core_spark.extensions.multimodal import extract_image_features

    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = extract_image_features(media, "payload", "doc_id", dim=16, decoder="fake")
    return out.select(
        "doc_id",
        F.round(F.col("features")[0].cast("double"), 5).alias("f0"),
        F.round(F.col("features")[1].cast("double"), 5).alias("f1"),
        F.round(F.col("features")[2].cast("double"), 5).alias("f2"),
        F.size("features").alias("dim"),
    )



def q_substring_removal(spark, sf_dir):
    """The removal half of span dedup
    (dedup.py::remove_duplicate_substrings): documents rebuilt from the
    tokens outside any cross-document duplicated span, entirely in
    Catalyst array functions.  The oracle rebuilds the same strings in
    SQL (string_agg over token ordinals not covered by the replayed
    spans), so the cleaned TEXT itself is hash-compared."""
    from tumult_core_spark.extensions.dedup import remove_duplicate_substrings

    docs = _load(spark, sf_dir, "documents")
    return remove_duplicate_substrings(docs, "doc_id", "text", window_tokens=12)


def q_token_budget_mix(spark, sf_dir):
    """Cost-budget mixture sampling (sampling.py::token_budget_mix):
    keep documents so each source contributes ~ budget/n_sources of
    n_chars, by per-source hash thresholds min(1, target/total).
    Everything is plain integer/double arithmetic in a pinned operation
    order, so the oracle recomputes totals, thresholds, AND the Knuth
    mix verbatim in SQL — no fixture needed."""
    from tumult_core_spark.extensions.sampling import token_budget_mix

    docs = _load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return token_budget_mix(
        docs, "source", "doc_id", "n_chars", budget=100_000.0, seed=7
    )


def q_substring_dedup(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022-style span
    dedup, dedup.py::duplicate_substring_spans): maximal token spans
    covered by a 12-token window appearing verbatim in >= 2 documents.
    The duplicate test is min(doc) != max(doc) per window — map-side
    combinable, skew-proof for corpus-wide boilerplate.  The oracle
    replays tokenization, window decomposition, the min!=max test, and
    the island merge in pure SQL."""
    from tumult_core_spark.extensions.dedup import duplicate_substring_spans

    docs = _load(spark, sf_dir, "documents")
    return duplicate_substring_spans(
        docs, "doc_id", "text", window_tokens=12
    ).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
    )


def q_adaptive_queries(spark, sf_dir):
    """The interactive surface through the driver gate (reference
    ``interactive_measurements.py:1856``): create_adaptive_composition
    holds the data behind a queryable that answers NON-interactive
    queries against one shared budget — here a grouped count, then a
    TransformationQuery that filters the HELD data in place, then a
    grouped sum over the filtered state.  Noise-off, so both released
    DataFrames replay as plain SQL; the in-place transformation is
    what the oracle's differing WHERE clauses verify."""
    from tumult_core_spark.measures import PureDP, PureDPBudget
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_count_measurement,
        create_sum_measurement,
    )
    from tumult_core_spark.measurements.interactive import (
        MeasurementQuery,
        TransformationQuery,
        create_adaptive_composition,
    )
    from tumult_core_spark.transformations.rows import Filter

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sym = SymmetricDifference()
    derive, dom2 = _with_qty_long(li, dom)
    adaptive = create_adaptive_composition(
        dom2, sym, 1, PureDPBudget(float("inf")), PureDP()
    )
    q = adaptive(derive(li))
    count_rel = q(
        MeasurementQuery(
            create_count_measurement(
                dom2, sym, PureDP(), 1, INF,
                groupby_transformation=_flag_keys_groupby(dom2),
                count_column="count",
            )
        )
    )
    q(TransformationQuery(Filter(dom2, sym, "qty > 25")))
    sum_rel = q(
        MeasurementQuery(
            create_sum_measurement(
                dom2, sym, PureDP(), 1, INF,
                measure_column="qty", lower=0, upper=50,
                groupby_transformation=_flag_keys_groupby(dom2),
                sum_column="sum_hi",
            )
        )
    )
    return count_rel.join(sum_rel, "l_returnflag")


def q_composition_count_sum(spark, sf_dir):
    """Composition + PostProcess through the driver gate (reference
    ``measurements/composition.py``, ``postprocess.py``): one
    Composition releases a grouped count AND a grouped clipped sum from
    the same input (budgets ADD — asserted in-query via
    privacy_function), and a PostProcess joins the two frozen releases
    into a single DataFrame.  Noise-off, so the oracle replays both
    aggregates in one SQL statement."""
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.exact_number import ExactNumber
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_count_measurement,
        create_sum_measurement,
    )
    from tumult_core_spark.measurements.composition import Composition, PostProcess

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    count_m = create_count_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        groupby_transformation=_flag_keys_groupby(dom2),
        count_column="count",
    )
    sum_m = create_sum_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
        groupby_transformation=_flag_keys_groupby(dom2),
        sum_column="sum_qty",
    )
    comp = Composition([count_m, sum_m])
    # composition adds the components' losses (inf + inf here; the
    # additivity itself is pinned by finite-budget tests)
    assert comp.privacy_function(1) == ExactNumber(float("inf"))
    joined = PostProcess(
        comp, lambda outs: outs[0].join(outs[1], "l_returnflag")
    )
    return ChainTM(derive, joined)(li)


def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) clustering key over two dimensions as pure
    Catalyst bit arithmetic (sources/io.py::zorder_key) — the layout
    primitive behind multi-dimensional file/row-group skipping
    (layout_for_scan(zorder_by=...)).  The oracle replays the exact
    rank-scale + bit-interleave arithmetic in SQL, so the key values
    (not just their ordering) must agree bit-for-bit."""
    from tumult_core_spark.sources.io import zorder_key

    ev = _load(spark, sf_dir, "events").select("event_id", "value", "user_id")
    return zorder_key(ev, ["value", "user_id"], bits=16).select("event_id", "zkey")


def q_dict_pipeline(spark, sf_dir):
    """The dictionary/lift machinery exercised end-to-end through the
    driver gate (reference ``transformations/dictionary.py``): wrap
    lineitem into a one-entry dict, AUGMENT it with a filtered copy
    under a new key (create_copy_and_transform_value), transform that
    value in place (Select then Rename through create_transform_value),
    project the dict down (Subset) and extract the result (GetValue).
    Every step goes through the typed dict domains/metrics with
    stability tracking; the oracle replays the equivalent flat SQL."""
    from tumult_core_spark.domains import DictDomain
    from tumult_core_spark.metrics import DictMetric, SymmetricDifference
    from tumult_core_spark.transformations.dictionary import (
        GetValue,
        Subset,
        create_copy_and_transform_value,
        create_transform_value,
    )
    from tumult_core_spark.transformations.rows import Filter, Rename, Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sym = SymmetricDifference()

    from tumult_core_spark.transformations.dictionary import CreateDictFromValue

    wrap = CreateDictFromValue(dom, sym, "li")
    d_dom = DictDomain({"li": dom})
    d_met = DictMetric({"li": sym})
    augment = create_copy_and_transform_value(
        d_dom, d_met,
        Filter(dom, sym, "l_quantity > 45 AND l_returnflag = 'R'"),
        "li", "big",
    )
    filt_dom = augment.output_domain["big"]
    sel = Select(filt_dom, sym, ["l_orderkey", "l_quantity", "l_extendedprice"])
    ren = Rename(sel.output_domain, sym, {"l_extendedprice": "price"})
    reshape = create_transform_value(
        augment.output_domain, augment.output_metric, sel | ren, "big"
    )
    narrowed = Subset(
        reshape.output_domain, reshape.output_metric, ["big"]
    )
    extract = GetValue(narrowed.output_domain, narrowed.output_metric, "big")
    pipeline = wrap | augment | reshape | narrowed | extract
    # the dict calculus must also report the right stability end-to-end
    assert pipeline.stability_function(1) == 1
    return pipeline(li)


def q_multimodal_decode(spark, sf_dir):
    """REAL compressed-codec round-trip through the full Spark
    plumbing: per document, a deterministic test image is synthesized
    from the text bytes, encoded as a genuine baseline PNG (stdlib
    zlib DEFLATE + forward scanline filtering, cycling all five filter
    types by doc_id), then decoded back by the real stdlib PNG decoder
    and profiled (multimodal.py::synthesize_png_images + image_stats).
    The oracle replays the expected stats from the pixel arrays alone
    (fixture computed with numpy, no PNG anywhere —
    tests/fixtures/make_png_fixture.py), so any defect in the
    encode/filter/inflate/unfilter path flips the value hash."""
    from tumult_core_spark.extensions.multimodal import (
        image_stats,
        synthesize_png_images,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_png_images(docs, "text", "doc_id")
    stats = image_stats(
        payloads, "payload", "doc_id", decoder="real", position_checksum=True
    )
    return stats.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_value", 5).alias("mean_value"),
        F.round("pos_checksum", 5).alias("pos_checksum"),
    )


def q_multimodal_jpeg(spark, sf_dir):
    """REAL from-scratch JPEG codec round-trip through the full Spark
    plumbing: per document, a deterministic grayscale constant-block
    test image is synthesized from the text bytes, encoded as genuine
    JFIF at quality 100 (all-ones quant tables — constant 8x8 blocks
    excite only DC coefficients, so the round-trip is EXACT; restart
    intervals cycled by doc_id exercise RSTn resync, and odd doc_ids
    encode PROGRESSIVE (SOF2) so the successive-approximation scan
    machinery is driver-verified too), then decoded back by the real
    T.81 Huffman+IDCT decoder and profiled
    (multimodal.py::synthesize_jpeg_images + image_stats, jpeg.py).
    The oracle replays the expected stats from the pixel arrays alone
    (fixture computed with numpy, no JPEG anywhere —
    tests/fixtures/make_jpeg_fixture.py), so any defect in the
    DCT/quantize/Huffman/entropy path flips the value hash."""
    from tumult_core_spark.extensions.multimodal import (
        image_stats,
        synthesize_jpeg_images,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_jpeg_images(docs, "text", "doc_id")
    stats = image_stats(
        payloads, "payload", "doc_id", decoder="real", position_checksum=True
    )
    return stats.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_value", 5).alias("mean_value"),
        F.round("pos_checksum", 5).alias("pos_checksum"),
    )


def q_multimodal_flac(spark, sf_dir):
    """REAL from-scratch FLAC codec round-trip through the full Spark
    plumbing: per document, deterministic int16 test audio (two
    sha-derived sine partials + noise) is synthesized from the text
    bytes, encoded as genuine FLAC (fixed-predictor / verbatim /
    constant subframes, Rice residuals, correct CRC-8/16 and stream
    MD5; mono/stereo and all four decorrelation modes cycled by
    doc_id), decoded back by the real Rice+predictor decoder (which
    also verifies the embedded MD5), mixed to mono, and featurized
    (multimodal.py::synthesize_flac_audio + audio_features, flac.py).
    FLAC is lossless, so the oracle replays expected features from the
    a-priori sample arrays alone (fixture computed with numpy, no
    FLAC anywhere — tests/fixtures/make_flac_fixture.py): any defect
    in the Rice/predictor/decorrelation path flips the value hash."""
    from tumult_core_spark.extensions.multimodal import (
        audio_features,
        synthesize_flac_audio,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_flac_audio(docs, "text", "doc_id")
    out = audio_features(payloads, "payload", "doc_id", dim=8, decoder="real")
    return out.select(
        "doc_id",
        F.round(F.col("features")[0].cast("double"), 5).alias("f0"),
        F.round(F.col("features")[1].cast("double"), 5).alias("f1"),
        F.round(F.col("features")[2].cast("double"), 5).alias("f2"),
        "duration_ms",
    )


def q_multimodal_gif(spark, sf_dir):
    """REAL from-scratch GIF (LZW) round-trip through the full Spark
    plumbing: per document, a deterministic palette image (palette
    sizes walk 2..256) is synthesized from the text bytes, LZW-encoded
    as genuine GIF89a (interlacing alternated by doc_id), decoded back
    by the real LZW decoder, and profiled
    (multimodal.py::synthesize_gif_images + image_stats).  GIF is
    lossless, so the oracle replays expected stats from
    ``palette[idx]`` alone (fixture computed with numpy, no GIF
    anywhere — tests/fixtures/make_gif_fixture.py)."""
    from tumult_core_spark.extensions.multimodal import (
        image_stats,
        synthesize_gif_images,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_gif_images(docs, "text", "doc_id")
    stats = image_stats(
        payloads, "payload", "doc_id", decoder="real", position_checksum=True
    )
    return stats.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_value", 5).alias("mean_value"),
        F.round("pos_checksum", 5).alias("pos_checksum"),
    )


def q_multimodal_video(spark, sf_dir):
    """REAL AVI/MJPEG video frame sampling through the full Spark
    plumbing: per document, a 4-frame MJPEG clip (grayscale
    constant-block quality-100 JFIF frames, sequential/progressive
    alternating) is synthesized from the text bytes, two evenly spaced
    frames are sampled by the real RIFF-walk + JPEG decode path and
    re-emitted as P5, then profiled (multimodal.py::
    synthesize_mjpeg_videos + sample_video_frames + image_stats).
    Constant blocks at quality 100 round-trip exactly, so the oracle
    replays per-frame stats from the a-priori pixels (fixture computed
    with numpy, no codec anywhere —
    tests/fixtures/make_video_fixture.py)."""
    from tumult_core_spark.extensions.multimodal import (
        image_stats,
        sample_video_frames,
        synthesize_mjpeg_videos,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_mjpeg_videos(docs, "text", "doc_id", num_frames=4)
    frames = sample_video_frames(payloads, "payload", "doc_id", num_frames=2,
                                 decoder="real")
    keyed = frames.withColumn(
        "rid", F.col("doc_id") * F.lit(10) + F.col("frame_index")
    )
    stats = image_stats(
        keyed, "frame", "rid", decoder="real", position_checksum=True
    )
    return stats.select(
        (F.col("rid") / 10).cast("long").alias("doc_id"),
        (F.col("rid") % 10).cast("int").alias("frame_index"),
        "width", "height",
        F.round("mean_value", 5).alias("mean_value"),
        F.round("pos_checksum", 5).alias("pos_checksum"),
    )


def q_multimodal_tiff(spark, sf_dir):
    """REAL from-scratch TIFF round-trip through the full Spark
    plumbing: per document, deterministic RGB pixels are synthesized
    from the text bytes, written as genuine TIFF cycling the
    compression by doc_id (uncompressed / LZW with and without the
    horizontal-differencing predictor / PackBits), decoded back by the
    real TIFF 6.0 strip decoder, and profiled
    (multimodal.py::synthesize_tiff_images + image_stats).  TIFF is
    lossless, so the oracle replays expected stats from the pixel
    arrays alone (fixture computed with numpy, no TIFF anywhere —
    tests/fixtures/make_tiff_fixture.py)."""
    from tumult_core_spark.extensions.multimodal import (
        image_stats,
        synthesize_tiff_images,
    )

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = synthesize_tiff_images(docs, "text", "doc_id")
    stats = image_stats(
        payloads, "payload", "doc_id", decoder="real", position_checksum=True
    )
    return stats.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_value", 5).alias("mean_value"),
        F.round("pos_checksum", 5).alias("pos_checksum"),
    )


def q_media_sniffing(spark, sf_dir):
    """Magic-byte media triage as pure Catalyst (multimodal.py::
    detect_media_format): per document a payload is built by
    prefixing the text bytes with one of 8 format magics (PNG, JPEG,
    GIF, FLAC, RIFF/WAVE, RIFF/AVI, ftyp-MP4, or none) selected by
    doc_id, then classified by the hex-prefix when-chain — JVM-side,
    zero Python, zero shuffle.  The oracle replays BOTH the payload
    construction and the full ordered rule chain in DuckDB SQL over
    hex(payload) — no fixture, a complete logic replay."""
    from tumult_core_spark.extensions.multimodal import detect_media_format

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    body = F.encode(F.col("text"), "UTF-8")
    prefixes = {
        0: "89504E470D0A1A0A",          # PNG
        1: "FFD8",                      # JPEG SOI
        2: "474946383961",              # GIF89a
        3: "664C6143",                  # fLaC
        4: "524946460000000057415645",  # RIFF....WAVE
        5: "524946460000000041564920",  # RIFF....AVI(space)
        6: "0000001866747970",          # ....ftyp
    }
    m = F.col("doc_id") % 8
    payload = None
    for k, hexstr in prefixes.items():
        cond = m == k
        built = F.concat(F.unhex(F.lit(hexstr)), body)
        payload = F.when(cond, built) if payload is None else payload.when(cond, built)
    payload = payload.otherwise(body)
    out = detect_media_format(docs.withColumn("payload", payload), "payload")
    return out.select("doc_id", "media_format", "media_type")


def q_zcdp_groupby_count(spark, sf_dir):
    """Grouped count under zCDP (discrete Gaussian path, noise off)."""
    from tumult_core_spark.measures import RhoZCDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_count_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    m = create_count_measurement(
        dom, SymmetricDifference(), RhoZCDP(), 1, INF,
        groupby_transformation=_flag_keys_groupby(dom, use_l2=True),
        count_column="count",
    )
    return m(li)


def q_approxdp_groupby_count(spark, sf_dir):
    """Grouped count under ApproxDP with delta > 0: routes through the
    zCDP discrete-Gaussian core with the Bun-Steinke-matched rho and
    converts back via RhoZCDPToApproxDP (a surface the reference
    declares unsupported, aggregations.py:929-939).  Noise off
    (eps = inf) for determinism; the delta > 0 accounting itself is
    pinned by tests/test_measurements2.py."""
    from tumult_core_spark.measures import ApproxDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_count_measurement

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    m = create_count_measurement(
        dom, SymmetricDifference(), ApproxDP(), 1, (INF, "1/1000000"),
        groupby_transformation=_flag_keys_groupby(dom, use_l2=True),
        count_column="count",
    )
    return m(li)


def q_groupby_sum_cents(spark, sf_dir):
    """Float-money sum made exact: clip, convert to integer cents, sum."""
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.domains import SparkIntegerColumnDescriptor
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_sum_measurement
    from tumult_core_spark.transformations.derive import DeriveColumn

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive = DeriveColumn(
        dom, SymmetricDifference(), "price_cents",
        "cast(round(least(greatest(l_extendedprice, 0.0), 10000.0) * 100) as long)",
        SparkIntegerColumnDescriptor(size=64),
    )
    m = create_sum_measurement(
        derive.output_domain, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="price_cents", lower=0, upper=1000000,
        groupby_transformation=_flag_keys_groupby(derive.output_domain),
        sum_column="sum_cents",
    )
    return ChainTM(derive, m)(li)


def q_groupby_column_domains(spark, sf_dir):
    """Keys = Cartesian product of per-column value domains."""
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import create_count_measurement
    from tumult_core_spark.transformations.groupby import (
        create_groupby_from_column_domains,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    gb = create_groupby_from_column_domains(
        dom, SymmetricDifference(), False,
        {"l_returnflag": ["A", "N", "R", "X"], "l_linestatus": ["F", "O"]},
    )
    m = create_count_measurement(
        dom, SymmetricDifference(), PureDP(), 1, INF,
        groupby_transformation=gb,
    )
    return m(li)


def q_drop_nulls_nans(spark, sf_dir):
    """Derive null/NaN values, then DropNulls + DropNaNs."""
    from tumult_core_spark.base import ChainTT
    from tumult_core_spark.domains import SparkFloatColumnDescriptor
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.derive import DeriveColumn
    from tumult_core_spark.transformations.rows import DropNaNs, DropNulls, Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    d1 = DeriveColumn(
        dom, SymmetricDifference(), "v1",
        "CASE WHEN l_quantity > 40 THEN NULL ELSE l_quantity END",
        SparkFloatColumnDescriptor(size=64, allow_null=True),
    )
    d2 = DeriveColumn(
        d1.output_domain, SymmetricDifference(), "v2",
        "CASE WHEN l_quantity < 10 THEN cast('NaN' as double) ELSE l_quantity END",
        SparkFloatColumnDescriptor(size=64, allow_nan=True),
    )
    dn = DropNulls(d2.output_domain, SymmetricDifference(), ["v1"])
    dnan = DropNaNs(dn.output_domain, SymmetricDifference(), ["v2"])
    sel = Select(dnan.output_domain, SymmetricDifference(), ["l_orderkey", "v1", "v2"])
    t = ChainTT(ChainTT(ChainTT(ChainTT(d1, d2), dn), dnan), sel)
    return t(li)


def q_replace_nans_infs(spark, sf_dir):
    """Derive NaN/Inf values, then ReplaceNaNs + ReplaceInfs."""
    from tumult_core_spark.base import ChainTT
    from tumult_core_spark.domains import SparkFloatColumnDescriptor
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.derive import DeriveColumn
    from tumult_core_spark.transformations.rows import ReplaceInfs, ReplaceNaNs, Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    d1 = DeriveColumn(
        dom, SymmetricDifference(), "v",
        "CASE WHEN l_quantity < 5 THEN cast('NaN' as double) "
        "WHEN l_quantity > 45 THEN cast('Infinity' as double) "
        "ELSE l_quantity END",
        SparkFloatColumnDescriptor(size=64, allow_nan=True, allow_inf=True),
    )
    rn = ReplaceNaNs(d1.output_domain, SymmetricDifference(), {"v": 0.0})
    ri = ReplaceInfs(rn.output_domain, SymmetricDifference(), {"v": (-50.0, 50.0)})
    sel = Select(ri.output_domain, SymmetricDifference(), ["l_orderkey", "v"])
    return ChainTT(ChainTT(ChainTT(d1, rn), ri), sel)(li)


def q_flatmap_explode(spark, sf_dir):
    """FlatMap each row into min(l_linenumber, 3) indexed rows."""
    from tumult_core_spark.domains import (
        SparkIntegerColumnDescriptor,
        SparkRowDomain,
    )
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.map import (
        FlatMap,
        RowToRowsTransformation,
    )
    from tumult_core_spark.transformations.rows import Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(dom, SymmetricDifference(), ["l_orderkey", "l_linenumber"])
    rt = RowToRowsTransformation(
        SparkRowDomain(dict(sel.output_domain.schema)),
        SparkRowDomain(
            {
                "l_orderkey": sel.output_domain["l_orderkey"],
                "idx": SparkIntegerColumnDescriptor(size=64),
            }
        ),
        lambda row: [
            {"l_orderkey": row["l_orderkey"], "idx": i}
            for i in range(row["l_linenumber"])
        ],
    )
    fm = FlatMap(SymmetricDifference(), rt, max_num_rows=3)
    return (sel | fm)(li)


def q_grouping_flatmap(spark, sf_dir):
    """GroupingFlatMap: replicate each row under 2 distinct replica ids,
    then count per replica (equals table count each)."""
    from tumult_core_spark.domains import (
        SparkIntegerColumnDescriptor,
        SparkRowDomain,
    )
    from tumult_core_spark.metrics import RootSumOfSquared, SymmetricDifference
    from tumult_core_spark.transformations.map import (
        GroupingFlatMap,
        RowToRowsTransformation,
    )
    from tumult_core_spark.transformations.rows import Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(dom, SymmetricDifference(), ["l_orderkey"])
    rt = RowToRowsTransformation(
        SparkRowDomain(dict(sel.output_domain.schema)),
        SparkRowDomain(
            {
                "l_orderkey": sel.output_domain["l_orderkey"],
                "replica": SparkIntegerColumnDescriptor(size=64),
            }
        ),
        lambda row: [{"replica": 0}, {"replica": 1}],
        augment=True,
    )
    gfm = GroupingFlatMap(RootSumOfSquared(SymmetricDifference()), rt, 2)
    out = (sel | gfm)(li)
    return out.groupBy("replica").agg(F.count(F.lit(1)).alias("n"))


def q_add_unique_column(spark, sf_dir):
    """AddUniqueColumn assigns distinct ids even to duplicate rows."""
    from tumult_core_spark.transformations.rows import AddUniqueColumn, Select
    from tumult_core_spark.metrics import SymmetricDifference

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    sel = Select(dom, SymmetricDifference(), ["l_returnflag"])  # heavy dups
    t = AddUniqueColumn(sel.output_domain, "row_id")
    out = t(sel(li))
    n = out.select("row_id").distinct().count()
    return spark.createDataFrame([(n,)], "n_unique long")


def q_join_on_nulls(spark, sf_dir):
    """PublicJoin with null-safe key equality on a derived nullable key."""
    from tumult_core_spark.base import ChainTT
    from tumult_core_spark.domains import SparkStringColumnDescriptor
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.transformations.derive import DeriveColumn
    from tumult_core_spark.transformations.join import PublicJoin
    from tumult_core_spark.transformations.rows import Select

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    d = DeriveColumn(
        dom, SymmetricDifference(), "flag_or_null",
        "CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END",
        SparkStringColumnDescriptor(allow_null=True),
    )
    sel = Select(d.output_domain, SymmetricDifference(), ["l_orderkey", "flag_or_null"])
    pub = spark.createDataFrame(
        [("A", "accepted"), (None, "none"), ("R", "returned")],
        "flag_or_null string, label string",
    )
    pj = PublicJoin(
        sel.output_domain, SymmetricDifference(), pub, join_on_nulls=True
    )
    return ChainTT(ChainTT(d, sel), pj)(li)


def q_ann_ivf(spark, sf_dir):
    """IVF ANN probing every cell == exact brute-force result."""
    from tumult_core_spark.extensions.similarity import ivf_knn

    embs = _load(spark, sf_dir, "embeddings")
    queries = embs.filter("vec_id < 20").select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_knn(
        embs, queries, "vec_id", "qid", "embedding",
        k=3, num_centroids=8, nprobe=8,
    )
    return out.select("qid", "vec_id", "rank")


def q_sessionize(spark, sf_dir):
    # rows-only: session window assembly over the events stream
    from tumult_core_spark.streaming import (
        read_stream_parquet,
        sessionize,
        write_stream_memory,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_stream_parquet(
        spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
    )
    sess = sessionize(stream, "user_id", "ts", gap="30 minutes")
    name = "q_sessions"
    q = write_stream_memory(sess, name, output_mode="complete")
    q.awaitTermination(300)
    return spark.sql(f"select user_id, n_events from {name}")



def q_private_join_on_key(spark, sf_dir):
    """Inner join of two private tables under AddRemoveKeys."""
    from tumult_core_spark.domains import DictDomain
    from tumult_core_spark.metrics import AddRemoveKeys
    from tumult_core_spark.transformations.join import PrivateJoinOnKey

    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    cust = _load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    dd = DictDomain({"o": _dom(orders), "c": _dom(cust)})
    metric = AddRemoveKeys({"o": "custkey", "c": "custkey"})
    t = PrivateJoinOnKey(dd, metric, "o", "c", "oc")
    out = t({"o": orders, "c": cust})["oc"]
    return out.select("custkey", "o_orderkey", "o_totalprice", "c_name")


def q_limit_rows_per_key_per_group(spark, sf_dir):
    """Per-(group, key) truncation; per-group row counts are invariant
    to the hash ordering, so they oracle-check."""
    from tumult_core_spark.metrics import IfGroupedBy, SymmetricDifference
    from tumult_core_spark.transformations.truncation import (
        LimitRowsPerKeyPerGroup,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    t = LimitRowsPerKeyPerGroup(
        dom, IfGroupedBy("l_returnflag", SymmetricDifference()), "l_orderkey", 2
    )
    out = t(li)
    return out.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


def q_connected_components(spark, sf_dir):
    """Components of the nation<-customer<-orders graph: every order
    and customer connects (multi-hop) to its nation node, so each
    component's min — and therefore its label — is the nation key.
    Exercises the alternating large-star/small-star rounds on a real
    3-level hierarchy from the test tables."""
    from tumult_core_spark.extensions.components import connected_components

    cust = _load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("id_a"),
        F.col("c_nationkey").cast("long").alias("id_b"),
    )
    orders = _load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + F.lit(2_000_000)).alias("id_a"),
        (F.col("o_custkey") + F.lit(1_000_000)).alias("id_b"),
    )
    return connected_components(cust.unionByName(orders))


def q_connected_components_dist(spark, sf_dir):
    """Same nation<-customer<-orders component graph as
    ``connected_components``, but with ``local_finish_edges=0`` so the
    DISTRIBUTED alternating large-star/small-star rounds run even at
    oracle scale.  Output is path-independent by design (component =
    minimum id either way); this entry exists so the star machinery —
    the path that actually runs at 100 TB — keeps driver-side oracle
    evidence after the r17 size-gated local finish made the default
    path resolve locally at every shipped SF."""
    from tumult_core_spark.extensions.components import connected_components

    cust = _load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("id_a"),
        F.col("c_nationkey").cast("long").alias("id_b"),
    )
    orders = _load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + F.lit(2_000_000)).alias("id_a"),
        (F.col("o_custkey") + F.lit(1_000_000)).alias("id_b"),
    )
    return connected_components(
        cust.unionByName(orders), local_finish_edges=0
    )


def q_dedup_connected(spark, sf_dir):
    """Canonical-doc selection over verified near-dup pairs: three
    identical copies of each base doc form a 3-clique; the canonical
    id of every copy is the base doc id (cluster minimum)."""
    from tumult_core_spark.extensions.components import canonical_duplicates
    from tumult_core_spark.extensions.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents").filter("doc_id < 100")
    both = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    ).unionByName(docs.withColumn("doc_id", F.col("doc_id") + 20_000_000))
    pairs = ngram_jaccard_pairs(both, "doc_id", "text", n=3, threshold=0.99)
    return canonical_duplicates(pairs)


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by multiplicative
    hashing: the oracle recomputes the identical arithmetic in SQL."""
    from tumult_core_spark.extensions.sampling import hash_split

    docs = _load(spark, sf_dir, "documents")
    out = hash_split(
        docs, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], seed=7
    )
    return out.select("doc_id", "split")


def q_stratified_sample(spark, sf_dir):
    """Per-language quota capping (training-mix balancing): keep at
    most 50 docs per lang, chosen by deterministic hash order."""
    from tumult_core_spark.extensions.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", "doc_id", 50, seed=3).select(
        "lang", "doc_id"
    )


def q_global_shuffle(spark, sf_dir):
    """Deterministic seed-keyed global permutation of the corpus (the
    reproducible shuffle a training pipeline runs to fix example
    order); positions are dense in [0, n) and the oracle replays the
    same integer mix as ROW_NUMBER() OVER (ORDER BY mix, id)."""
    from tumult_core_spark.extensions.sampling import global_shuffle

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    return global_shuffle(docs, "doc_id", seed=17)


def q_pack_sequences(spark, sf_dir):
    """Greedy sequence packing of documents (by n_chars) into 4096-char
    windows across 16 hash buckets; the oracle replays the same serial
    scan as a recursive CTE."""
    from tumult_core_spark.extensions.packing import pack_sequences

    docs = _load(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "n_chars", window=4096, num_buckets=16)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: 30 holdout docs are verbatim copies
    of training docs 50..79; the inverted-gram-index join must flag
    exactly those training docs (and no cross pairs at 0.99)."""
    from tumult_core_spark.extensions.dedup import decontaminate

    train = _load(spark, sf_dir, "documents").filter("doc_id < 100")
    holdout = (
        train.filter("doc_id >= 50 AND doc_id < 80")
        .withColumn("doc_id", F.col("doc_id") + 5_000_000)
    )
    out = decontaminate(train, holdout, "doc_id", "text", n=3, threshold=0.99)
    return out.select(
        "train_id", "holdout_id", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_paragraphs(spark, sf_dir):
    """Corpus-wide exact paragraph dedup with document reassembly
    (MassiveText/CCNet pass).  The synthetic documents have no blank
    lines, so the unit separator here is the literal ``" table "`` —
    arbitrary but deterministic; the spans between occurrences repeat
    across documents, which is exactly what the pass must cut.  The
    oracle replays the identical split / first-occurrence-wins /
    reassemble arithmetic."""
    from tumult_core_spark.extensions.dedup import dedup_paragraphs

    docs = _load(spark, sf_dir, "documents")
    return dedup_paragraphs(docs, separator=" table ")


def q_redact_pii(spark, sf_dir):
    """PII scrubbing: plant an email/IP/phone per document, redact with
    the Catalyst regexp chain, and compare the transformed text and
    per-kind counts byte-for-byte against DuckDB replaying the same
    RE2-safe patterns."""
    from tumult_core_spark.extensions.text import redact_pii

    docs = _load(spark, sf_dir, "documents").filter("doc_id < 200")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0.7 or +1 555-123-4567"),
        ).alias("text"),
    )
    out = redact_pii(planted, "text")
    return out.select("doc_id", "redacted", "n_email", "n_ipv4", "n_phone")


def q_profile_table(spark, sf_dir):
    """Exact one-scan column profile of orders (nullable column
    included via o_comment)."""
    from tumult_core_spark.utils.profile import profile_table

    orders = _load(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )


def q_training_mix(spark, sf_dir):
    """End-to-end training-data pipeline COMPOSITION, verified as one
    relation: length gate -> exact dedup (canonical = min doc_id per
    identical text) -> per-language quota (deterministic hash order)
    -> train/val/test assignment.  Every stage is an engine operator;
    the oracle replays the whole pipeline in SQL."""
    from pyspark.sql.window import Window

    from tumult_core_spark.extensions.sampling import hash_split, stratified_sample

    docs = _load(spark, sf_dir, "documents")
    filtered = docs.filter(F.col("n_chars") >= 200)
    w = Window.partitionBy("text").orderBy("doc_id")
    canon = (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    quota = stratified_sample(canon, "lang", "doc_id", 100, seed=11)
    out = hash_split(
        quota, "doc_id", [("train", 0.9), ("val", 0.05), ("test", 0.05)], seed=13
    )
    return out.select("doc_id", "lang", "split")


def q_groupby_stddev(spark, sf_dir):
    from tumult_core_spark.base import ChainTM
    from tumult_core_spark.measures import PureDP
    from tumult_core_spark.metrics import SymmetricDifference
    from tumult_core_spark.measurements.aggregations import (
        create_standard_deviation_measurement,
    )

    li = _load(spark, sf_dir, "lineitem")
    dom = _dom(li)
    derive, dom2 = _with_qty_long(li, dom)
    m = create_standard_deviation_measurement(
        dom2, SymmetricDifference(), PureDP(), 1, INF,
        measure_column="qty", lower=0, upper=50,
        groupby_transformation=_flag_keys_groupby(dom2),
        standard_deviation_column="std_qty",
    )
    out = ChainTM(derive, m)(li)
    return out.select("l_returnflag", F.round("std_qty", 6).alias("std_qty"))


def q_embedding_near_dups(spark, sf_dir):
    """Hyperplane-LSH cosine near-dups: duplicated vectors must pair."""
    from tumult_core_spark.extensions.similarity import embedding_near_duplicates

    embs = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = embs.withColumn("vec_id", F.col("vec_id") + 1000000)
    both = embs.union(dup)
    out = embedding_near_duplicates(
        both, "vec_id", "embedding", threshold=0.999, num_planes=32, bands=4
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING IS A ROTATION SCHEDULE, not alphabetical and not build
    # order.  The per-round driver checks roughly the first 50 of the
    # 102 registry entries against the DuckDB oracle, so each round the
    # entries with the least-fresh driver evidence go FIRST:
    #   r19 front block = bounds and quantile_median FIRST (the two
    #   entries the r18 50-entry batch did not reach — and exactly the
    #   paths carrying r18's biggest optimizations, the SVT
    #   driver-release and the fused grouped apply; the r18 verdict's
    #   ordered item #1), then the 50 entries whose latest driver-green
    #   row is r17, in their r17 order.  The tail = the 50 entries
    #   CORRECTNESS_r18 checked, in their r18 order.  The front is 52
    #   entries, so with a 50-entry driver batch the last TWO front
    #   entries (fused_moments, embedding_outliers — both r17-green)
    #   may slip; they are the least-stale available slip.
    #   r20+: rotate again — whatever this round's batch does not
    #   reach goes back to the front.
    return {
        # --- r19 front: the two entries the r18 driver batch missed
        # --- (the most-optimized r18 paths: SVT driver-release freeze,
        # --- fused single-stage grouped apply)
        "bounds": q_bounds,
        "quantile_median": q_quantile_median,
        # --- then the 50 entries last driver-checked in r17 ---
        "partition_by_keys": q_partition_by_keys,
        "map_revenue": q_map_derive,
        "flatmap_by_key": q_flatmap_by_key,
        "multimodal_decode": q_multimodal_decode,
        "dict_pipeline": q_dict_pipeline,
        "zorder_key": q_zorder_key,
        "composition_count_sum": q_composition_count_sum,
        "adaptive_queries": q_adaptive_queries,
        "substring_dedup": q_substring_dedup,
        "substring_removal": q_substring_removal,
        "token_budget_mix": q_token_budget_mix,
        "profile_table": q_profile_table,
        "profile_numeric": q_profile_numeric,
        "json_extract": q_json_extract,
        "sq_codes": q_sq_codes,
        "bpe_tokens": q_bpe_tokens,
        "replace_nulls": q_replace_nulls,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_topk": q_ann_topk,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "fingerprint_distinct": q_fingerprint_distinct,
        "quality_scores": q_quality_scores,
        "repetition_stats": q_repetition_stats,
        "asof_join": q_asof_join,
        "time_rollup": q_time_rollup,
        "tfidf_top_terms": q_tfidf_top_terms,
        "global_shuffle": q_global_shuffle,
        "temperature_mix": q_temperature_mix,
        "pca_project": q_pca_project,
        "unigram_logprob": q_unigram_logprob,
        "weighted_sample": q_weighted_sample,
        "fuzzy_join": q_fuzzy_join,
        "chunk_documents": q_chunk_documents,
        "chunk_pack": q_chunk_pack,
        "streaming_window_counts": q_streaming_window_counts,
        "multimodal_features": q_multimodal_features,
        "zcdp_groupby_count": q_zcdp_groupby_count,
        "approxdp_groupby_count": q_approxdp_groupby_count,
        "groupby_sum_cents": q_groupby_sum_cents,
        "groupby_column_domains": q_groupby_column_domains,
        "drop_nulls_nans": q_drop_nulls_nans,
        "replace_nans_infs": q_replace_nans_infs,
        "flatmap_explode": q_flatmap_explode,
        "grouping_flatmap": q_grouping_flatmap,
        "fused_moments": q_fused_moments,
        "embedding_outliers": q_embedding_outliers,
        # --- tail: the 50 entries CORRECTNESS_r18 checked, in
        # --- their r18 order ---
        "pagerank": q_pagerank,
        "connected_components_dist": q_connected_components_dist,
        "hll_distinct": q_hll_distinct,
        "approx_quantile_check": q_approx_quantile_check,
        "multimodal_jpeg": q_multimodal_jpeg,
        "multimodal_flac": q_multimodal_flac,
        "multimodal_gif": q_multimodal_gif,
        "multimodal_video": q_multimodal_video,
        "media_sniffing": q_media_sniffing,
        "multimodal_tiff": q_multimodal_tiff,
        "connected_components": q_connected_components,
        "dedup_connected": q_dedup_connected,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "training_mix": q_training_mix,
        "decontaminate": q_decontaminate,
        "dedup_paragraphs": q_dedup_paragraphs,
        "bigram_logprob": q_bigram_logprob,
        "stream_interval_join": q_stream_interval_join,
        "profile_quantiles": q_profile_quantiles,
        "preprocess_pipeline": q_preprocess_pipeline,
        "rolling_aggregate": q_rolling_aggregate,
        "sessionize_batch": q_sessionize_batch,
        "redact_pii": q_redact_pii,
        "variance_intermediates": q_variance_intermediates,
        "streaming_dedup": q_streaming_dedup,
        "sq_knn": q_sq_knn,
        "normalize_text": q_normalize_text,
        "add_unique_column": q_add_unique_column,
        "join_on_nulls": q_join_on_nulls,
        "ann_ivf": q_ann_ivf,
        "sessionize": q_sessionize,
        "embedding_near_dups": q_embedding_near_dups,
        "private_join_on_key": q_private_join_on_key,
        "limit_rows_per_key_per_group": q_limit_rows_per_key_per_group,
        "groupby_stddev": q_groupby_stddev,
        "filter_select": q_filter_select,
        "rename": q_rename,
        "groupby_count": q_groupby_count,
        "groupby_count_distinct": q_groupby_count_distinct,
        "groupby_sum": q_groupby_sum,
        "total_counts": q_total_counts,
        "average": q_average,
        "variance": q_variance,
        "public_join": q_public_join,
        "private_join_drop": q_private_join_drop,
        "limit_rows_per_group": q_limit_rows_per_group,
        "limit_keys_per_group": q_limit_keys_per_group,
        "partition_selection": q_partition_selection,
    }
