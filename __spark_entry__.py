"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship DP query; ``queries`` exposes one entry
per implemented operator family (SURVEY.md §2 + extensions), each
deterministic (noise scale 0 / infinite budget) so the DuckDB oracle
in ``oracle_sql`` hash-matches.  Non-SQL-expressible pipelines are
still oracled: hash/signature-based dedup pins the planted pairs plus
the full deterministic pair count, and the multimodal stub compares
against a fixture produced by an independent pyarrow+numpy path.
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
    from tumult_core_spark.extensions.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")
    return exact_dedup(docs.select("text"), ["text"])


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


def q_bpe_tokens(spark, sf_dir):
    """Distributed BPE: train 30 merges from the corpus word-frequency
    table, then encode every document.  The oracle is an independent
    from-scratch BPE implementation (tests/fixtures/make_bpe_fixture.py,
    pyarrow + stdlib only) over the same corpus — train and encode must
    agree token-for-token."""
    from tumult_core_spark.extensions.text import bpe_encode, bpe_train

    docs = _load(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=30)
    return bpe_encode(docs, merges=merges).select(
        "doc_id", F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
        "bpe_tokens",
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
    return sq_encode(embs, "vec_id", "embedding", lo, hi)


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
    (tests/fixtures/make_multimodal_fixture.py)."""
    from tumult_core_spark.extensions.multimodal import extract_image_features

    docs = _load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = extract_image_features(media, "payload", "doc_id", dim=16)
    return out.select(
        "doc_id",
        F.round(F.col("features")[0].cast("double"), 5).alias("f0"),
        F.round(F.col("features")[1].cast("double"), 5).alias("f1"),
        F.round(F.col("features")[2].cast("double"), 5).alias("f2"),
        F.size("features").alias("dim"),
    )



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
    # order.  The per-round driver checks roughly the first 50 registry
    # entries against the DuckDB oracle, so each round the entries with
    # the least-fresh driver evidence go FIRST:
    #   r5 front block = the 18 queries never driver-checked in any
    #   round + the 8 queries last checked in r3 + profile_numeric
    #   (r4's one red row, now fixed via decimal-mean accumulation).
    #   The tail = r4-green entries, freshest last.  r6: rotate again —
    #   move whatever the r5 batch did not reach back to the front.
    return {
        # --- never driver-checked before r5 (local-green since r4) ---
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
        "sq_codes": q_sq_codes,
        "profile_quantiles": q_profile_quantiles,
        "bpe_tokens": q_bpe_tokens,
        "preprocess_pipeline": q_preprocess_pipeline,
        "rolling_aggregate": q_rolling_aggregate,
        "sessionize_batch": q_sessionize_batch,
        "redact_pii": q_redact_pii,
        "profile_table": q_profile_table,
        # --- fixed after r4's hash flake (decimal-mean) ---
        "profile_numeric": q_profile_numeric,
        # --- last driver-checked in r3 ---
        "add_unique_column": q_add_unique_column,
        "join_on_nulls": q_join_on_nulls,
        "ann_ivf": q_ann_ivf,
        "sessionize": q_sessionize,
        "embedding_near_dups": q_embedding_near_dups,
        "private_join_on_key": q_private_join_on_key,
        "limit_rows_per_key_per_group": q_limit_rows_per_key_per_group,
        "groupby_stddev": q_groupby_stddev,
        # --- r4-green (rotate back to the front in r6 as they stale) ---
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
        "bounds": q_bounds,
        "quantile_median": q_quantile_median,
        "partition_by_keys": q_partition_by_keys,
        "map_revenue": q_map_derive,
        "flatmap_by_key": q_flatmap_by_key,
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
    }


_EN = "['the','and','of','to','in','is','that','with','for','was']"
_DE = "['der','die','und','das','ist','nicht','mit','ein','von','zu']"
_FR = "['le','la','les','et','des','est','une','dans','que','pour']"
_ES = "['el','la','los','que','de','en','una','es','por','con']"


def oracle_sql() -> dict[str, str]:
    flags_cte = "keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X'))"
    # absolute path: the multimodal oracle reads a precomputed fixture
    # (independent pyarrow+numpy rendering of the deterministic fake
    # decode; regenerate with tests/fixtures/make_multimodal_fixture.py)
    mm_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "multimodal_expected_sf001.parquet",
    )
    # same pattern for PCA: the eigendecomposition is not
    # SQL-expressible, so the oracle is an independent pyarrow+numpy
    # re-derivation (tests/fixtures/make_pca_fixture.py — same
    # covariance and sign conventions, no tumult_core_spark imports)
    pca_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "pca_expected_sf001.parquet",
    )
    # independent from-scratch BPE (train + encode) fixture — the merge
    # loop is iterative and not SQL-expressible
    # (tests/fixtures/make_bpe_fixture.py, pyarrow + stdlib only)
    bpe_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "bpe_expected_sf001.parquet",
    )
    return {
        "multimodal_features": f"""
            SELECT doc_id, f0, f1, f2, dim
            FROM '{mm_fixture}'
        """,
        "pca_project": f"""
            SELECT vec_id, pc1, pc2 FROM '{pca_fixture}'
        """,
        "rolling_aggregate": """
            SELECT event_id,
                   COUNT(*) OVER w AS rolling_count,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER w
                              AS DOUBLE), 6) AS rolling_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING
                               AND CURRENT ROW)
        """,
        "sessionize_batch": """
            WITH o AS (
                SELECT user_id, event_id, epoch_us(ts) AS t,
                       LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev
                FROM events),
            m AS (
                SELECT user_id, t,
                       SUM(CASE WHEN prev IS NULL
                                     OR t - prev > 1800000000
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id
                                 ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM o)
            SELECT user_id, MIN(t) AS session_start_us,
                   MAX(t) AS session_end_us,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM m GROUP BY user_id, sid
        """,
        "preprocess_pipeline": """
            WITH RECURSIVE g AS (
                SELECT doc_id, text FROM documents WHERE n_chars >= 250),
            u AS (
                SELECT doc_id,
                       unnest(string_split(text, ' table ')) AS unit,
                       generate_subscripts(string_split(text, ' table '), 1)
                           - 1 AS pos
                FROM g),
            w AS (
                SELECT unit, MIN(doc_id * 1000000 + pos) AS win
                FROM u GROUP BY unit),
            k AS (
                SELECT u.doc_id, u.pos, u.unit,
                       (u.doc_id * 1000000 + u.pos) = w.win AS keep
                FROM u JOIN w ON u.unit = w.unit),
            dd AS (
                SELECT doc_id,
                       COALESCE(array_to_string(
                           list(unit ORDER BY pos) FILTER (WHERE keep),
                           ' table '), '') AS text
                FROM k GROUP BY doc_id),
            t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM dd),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(toks), 1) + 1, 30),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(range(1, greatest(len(toks), 1) + 1,
                                                 30), 1) - 1 AS chunk_idx
                FROM t),
            d AS (
                SELECT doc_id * 1000 + chunk_idx AS chunk_id,
                       (doc_id * 1000 + chunk_idx) % 8 AS bucket,
                       LEAST(CASE WHEN chunk_text = '' THEN 0
                                  ELSE len(string_split(chunk_text, ' '))
                             END, 40) AS tok,
                       ROW_NUMBER() OVER (
                           PARTITION BY (doc_id * 1000 + chunk_idx) % 8
                           ORDER BY doc_id * 1000 + chunk_idx) AS rn
                FROM c),
            packed AS (
                SELECT bucket, rn, chunk_id, tok, 0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.chunk_id, x.tok,
                       CASE WHEN p.fill + x.tok > 40
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 40
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT chunk_id, bucket, bin FROM packed
        """,
        "bpe_tokens": f"""
            SELECT doc_id, CAST(n_bpe_tokens AS INTEGER) AS n_bpe_tokens,
                   bpe_tokens
            FROM '{bpe_fixture}'
        """,
        "filter_select": (
            "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity < 25"
        ),
        "rename": "SELECT l_orderkey, l_returnflag AS flag FROM lineitem",
        "groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_count_distinct": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_distinct
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_sum": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_qty
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "total_counts": """
            SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS n_distinct
        """,
        "average": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s,
                         COUNT(*) AS n
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag,
                   CAST(COALESCE(c.s, 0) - 25 * COALESCE(c.n, 0) AS DOUBLE)
                       / GREATEST(COALESCE(c.n, 0), 1) + 25 AS avg_qty
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "variance": """
            WITH b AS (SELECT LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50) - 25 AS d
                       FROM lineitem),
            s AS (SELECT SUM(d) AS sod, SUM(d * d) AS sos, COUNT(*) AS n FROM b)
            SELECT ROUND(CAST(sos AS DOUBLE) / n
                         - (CAST(sod AS DOUBLE) / n) * (CAST(sod AS DOUBLE) / n),
                         6) AS var_qty
            FROM s
        """,
        "public_join": """
            SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "private_join_drop": """
            WITH lk AS (SELECT l_orderkey AS okey, l_linenumber FROM lineitem),
            ok AS (SELECT o_orderkey AS okey, o_orderpriority FROM orders),
            keep_l AS (SELECT okey FROM lk GROUP BY okey HAVING COUNT(*) <= 4),
            keep_r AS (SELECT okey FROM ok GROUP BY okey HAVING COUNT(*) <= 2)
            SELECT lk.okey, lk.l_linenumber, ok.o_orderpriority
            FROM lk JOIN keep_l USING (okey) JOIN ok USING (okey) JOIN keep_r USING (okey)
        """,
        "limit_rows_per_group": """
            SELECT l_orderkey, CAST(LEAST(COUNT(*), 3) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        """,
        "limit_rows_per_key_per_group": """
            WITH c AS (SELECT l_returnflag, l_orderkey, COUNT(*) AS c
                       FROM lineitem GROUP BY 1, 2)
            SELECT l_returnflag, CAST(SUM(LEAST(c, 2)) AS BIGINT) AS n
            FROM c GROUP BY 1
        """,
        "private_join_on_key": """
            SELECT o.o_custkey AS custkey, o.o_orderkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "groupby_stddev": """
            WITH keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            b AS (SELECT l_returnflag,
                         LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50) - 25 AS d
                  FROM lineitem),
            s AS (SELECT l_returnflag, SUM(d) AS sod, SUM(d * d) AS sos,
                         COUNT(*) AS n
                  FROM b GROUP BY 1),
            j AS (SELECT k.l_returnflag,
                         COALESCE(s.sod, 0) AS sod, COALESCE(s.sos, 0) AS sos,
                         GREATEST(COALESCE(s.n, 0), 1) AS n
                  FROM keys k LEFT JOIN s USING (l_returnflag))
            SELECT l_returnflag,
                   ROUND(SQRT(GREATEST(
                       CAST(sos AS DOUBLE) / n
                       - (CAST(sod AS DOUBLE) / n) * (CAST(sod AS DOUBLE) / n),
                       0)), 6) AS std_qty
            FROM j
        """,
        "quantile_median": """
            WITH vals AS (
                SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v,
                       COUNT(*) AS c
                FROM lineitem GROUP BY 1, 2),
            ranked AS (
                SELECT g, v, c,
                       COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
                       SUM(c) OVER (PARTITION BY g) AS n
                FROM vals),
            intervals AS (
                SELECT g, LEAST(GREATEST(v, 0.0), 50.0) AS lo,
                       COALESCE(LEAD(LEAST(GREATEST(v, 0.0), 50.0))
                           OVER (PARTITION BY g ORDER BY v), 50.0) AS hi,
                       before + c AS rank, n
                FROM ranked
                UNION ALL
                SELECT g, 0.0 AS lo, MIN(LEAST(GREATEST(v, 0.0), 50.0)) AS hi,
                       0 AS rank, MAX(n) AS n
                FROM ranked GROUP BY g)
            SELECT g AS l_returnflag, lo AS q_lo, hi AS q_hi
            FROM intervals WHERE hi > lo
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY g
                ORDER BY ABS(rank - 0.5 * n) ASC, lo DESC) = 1
        """,
        "sessionize": """
            WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            f AS (SELECT user_id, ts,
                         CASE WHEN LAG(ts) OVER w IS NULL
                                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END AS brk
                  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT user_id,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM f)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "quality_scores": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            m AS (
                SELECT doc_id,
                       CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                       CAST(len(toks) AS DOUBLE) AS n_tokens,
                       CAST(LENGTH(regexp_replace(text, '[\\w\\s]', '', 'g'))
                            AS DOUBLE) AS n_punct,
                       CAST(len(list_filter(list_distinct(toks),
                           x -> list_contains(
                               ['the','and','of','to','in','is','that','with','for','was'],
                               x))) AS DOUBLE) AS n_stop
                FROM t)
            SELECT m.doc_id,
                   ROUND(
                       LEAST(n_chars / 1000.0, 1.0) * 0.3
                       + (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 3
                                    AND n_chars / GREATEST(n_tokens, 1.0) <= 12
                               THEN 1.0 ELSE 0.3 END) * 0.2
                       + (CASE WHEN n_punct / GREATEST(n_chars, 1.0) < 0.2 THEN 1.0
                               ELSE GREATEST(1.0 - (n_punct / GREATEST(n_chars, 1.0)
                                                    - 0.2) * 2, 0.0) END) * 0.2
                       + LEAST(n_stop / GREATEST(LEAST(n_tokens, 10.0), 1.0),
                               1.0) * 0.3,
                       6) AS quality
            FROM m
        """,
        "tfidf_top_terms": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            tfc AS (
                SELECT doc_id, unnest(toks) AS term FROM t),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM tfc GROUP BY 1, 2),
            dfreq AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS nn FROM documents),
            scored AS (
                SELECT doc_id, term, tf, df,
                       tf * (ln((nn + 1) / (df + 1)) + 1.0) AS score
                FROM tf JOIN dfreq USING (term) CROSS JOIN n)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, ROUND(score, 6) AS score
            FROM scored
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC) <= 3
        """,
        "temperature_mix": """
            -- thresholds = temperature_thresholds(sf0.01 lang counts,
            -- T=2), pinned (valid at the sf0.01 gate only)
            SELECT doc_id, lang FROM documents
            WHERE (((2654435761 * CAST((((doc_id + 11) % 4294967296) - ((doc_id + 11) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 11) % 4294967296) % 65536)) % 4294967296 <
                  CASE lang
                      WHEN 'de' THEN 4106774230
                      WHEN 'en' THEN 2327135125
                      WHEN 'es' THEN 4021503195
                      WHEN 'fr' THEN 4294967296
                      WHEN 'zh' THEN 3967520839
                  END
        """,
        "unigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
            freqs AS (SELECT term, COUNT(*) AS tf FROM occ GROUP BY 1),
            total AS (SELECT COUNT(*) AS tt FROM occ)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(AVG(ln(tf / tt)), 6) AS avg_logprob
            FROM occ JOIN freqs USING (term) CROSS JOIN total
            GROUP BY doc_id
        """,
        "weighted_sample": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            m AS (
                SELECT doc_id,
                       CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                       CAST(len(toks) AS DOUBLE) AS n_tokens,
                       CAST(LENGTH(regexp_replace(text, '[\\w\\s]', '', 'g'))
                            AS DOUBLE) AS n_punct,
                       CAST(len(list_filter(list_distinct(toks),
                           x -> list_contains(
                               ['the','and','of','to','in','is','that','with','for','was'],
                               x))) AS DOUBLE) AS n_stop
                FROM t),
            q AS (
                SELECT doc_id,
                       LEAST(n_chars / 1000.0, 1.0) * 0.3
                       + (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 3
                                    AND n_chars / GREATEST(n_tokens, 1.0) <= 12
                               THEN 1.0 ELSE 0.3 END) * 0.2
                       + (CASE WHEN n_punct / GREATEST(n_chars, 1.0) < 0.2 THEN 1.0
                               ELSE GREATEST(1.0 - (n_punct / GREATEST(n_chars, 1.0)
                                                    - 0.2) * 2, 0.0) END) * 0.2
                       + LEAST(n_stop / GREATEST(LEAST(n_tokens, 10.0), 1.0),
                               1.0) * 0.3 AS quality
                FROM m)
            SELECT doc_id, ROUND(quality, 6) AS quality FROM q
            WHERE (((2654435761 * CAST((((doc_id + 23) % 4294967296) - ((doc_id + 23) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 23) % 4294967296) % 65536)) % 4294967296
                  < CAST(FLOOR(LEAST(GREATEST(quality, 0.0), 1.0)
                               * 4294967296.0) AS BIGINT)
        """,
        "fuzzy_join": """
            WITH typos AS (
                SELECT c_custkey + 1000000 AS t_id,
                       substring(c_name, 1, c_custkey % length(c_name))
                       || substring(c_name, c_custkey % length(c_name) + 2)
                           AS t_name
                FROM customer WHERE c_custkey < 200)
            SELECT c.c_custkey, t.t_id,
                   CAST(levenshtein(c.c_name, t.t_name) AS BIGINT) AS distance
            FROM customer c CROSS JOIN typos t
            WHERE levenshtein(c.c_name, t.t_name) <= 1
        """,
        "chunk_documents": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(toks), 1) + 1, 30),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(range(1, greatest(len(toks), 1) + 1,
                                                 30), 1) - 1 AS chunk_idx
                FROM t)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text,
                   CAST(CASE WHEN chunk_text = '' THEN 0
                             ELSE len(string_split(chunk_text, ' '))
                        END AS INTEGER) AS chunk_tokens
            FROM c
        """,
        "profile_numeric": """
            WITH m AS (SELECT COUNT(*) AS n FROM lineitem)
            SELECT col AS column, n AS n_rows, n_nulls,
                   ROUND(mn, 6) AS min, ROUND(mx, 6) AS max,
                   ROUND(mean, 6) AS mean
            FROM m, (
                SELECT 'l_quantity' AS col,
                       SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS n_nulls,
                       CAST(MIN(l_quantity) AS DOUBLE) AS mn,
                       CAST(MAX(l_quantity) AS DOUBLE) AS mx,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_quantity) AS mean FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice',
                       SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
                       CAST(MIN(l_extendedprice) AS DOUBLE),
                       CAST(MAX(l_extendedprice) AS DOUBLE),
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_extendedprice) FROM lineitem
                UNION ALL
                SELECT 'l_discount',
                       SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END),
                       CAST(MIN(l_discount) AS DOUBLE),
                       CAST(MAX(l_discount) AS DOUBLE),
                       CAST(SUM(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_discount) FROM lineitem
            )
        """,
        "chunk_pack": """
            WITH RECURSIVE t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(toks), 1) + 1, 30),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(range(1, greatest(len(toks), 1) + 1,
                                                 30), 1) - 1 AS chunk_idx
                FROM t),
            d AS (
                SELECT doc_id * 1000 + chunk_idx AS chunk_id,
                       (doc_id * 1000 + chunk_idx) % 8 AS bucket,
                       LEAST(CASE WHEN chunk_text = '' THEN 0
                                  ELSE len(string_split(chunk_text, ' '))
                             END, 40) AS tok,
                       ROW_NUMBER() OVER (
                           PARTITION BY (doc_id * 1000 + chunk_idx) % 8
                           ORDER BY doc_id * 1000 + chunk_idx) AS rn
                FROM c),
            packed AS (
                SELECT bucket, rn, chunk_id, tok, 0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.chunk_id, x.tok,
                       CASE WHEN p.fill + x.tok > 40
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 40
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT chunk_id, bucket, bin FROM packed
        """,
        "asof_join": """
            SELECT l.event_id, l.user_id,
                   epoch_us(l.ts) AS ts_us,
                   epoch_us(r.ts) AS err_ts_us,
                   r.value AS err_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'error') r
            ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "time_rollup": """
            SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "repetition_stats": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents),
            items AS (
                SELECT doc_id, 'L' AS kind, unnest(lines) AS item FROM t
                UNION ALL
                SELECT doc_id, 'B' AS kind,
                       unnest(list_transform(range(1, greatest(len(toks), 1)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS item
                FROM t
                UNION ALL
                SELECT doc_id, 'T' AS kind,
                       unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                             i -> toks[i] || ' ' || toks[i+1]
                                                  || ' ' || toks[i+2])) AS item
                FROM t),
            counted AS (
                SELECT doc_id, kind, item, COUNT(*) AS cnt
                FROM items GROUP BY 1, 2, 3),
            per_kind AS (
                SELECT doc_id, kind,
                       SUM(cnt) AS total,
                       COUNT(*) AS distinct_n,
                       SUM(cnt * length(item)) AS total_chars,
                       SUM(CASE WHEN cnt > 1 THEN cnt * length(item)
                                ELSE 0 END) AS dup_chars,
                       MAX(cnt * length(item)) AS top_chars
                FROM counted GROUP BY 1, 2),
            stats AS (
                SELECT doc_id,
                       CAST(MAX(CASE WHEN kind = 'L' THEN total END) AS BIGINT)
                           AS n_lines,
                       CAST((MAX(CASE WHEN kind = 'L' THEN total END)
                             - MAX(CASE WHEN kind = 'L' THEN distinct_n END))
                            AS DOUBLE)
                           / MAX(CASE WHEN kind = 'L' THEN total END)
                           AS dup_line_frac,
                       CAST(MAX(CASE WHEN kind = 'L' THEN dup_chars END)
                            AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'L'
                                               THEN total_chars END), 1)
                           AS dup_line_char_frac,
                       COALESCE(CAST(MAX(CASE WHEN kind = 'B' THEN top_chars END)
                                     AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'B'
                                               THEN total_chars END), 1), 0.0)
                           AS top_bigram_char_frac,
                       COALESCE(CAST(MAX(CASE WHEN kind = 'T' THEN dup_chars END)
                                     AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'T'
                                               THEN total_chars END), 1), 0.0)
                           AS dup_trigram_char_frac
                FROM per_kind GROUP BY 1),
            sym AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\.{3}|…|#'))
                            AS DOUBLE)
                           / GREATEST(len(list_filter(
                                 string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '')), 1) AS symbol_word_ratio
                FROM documents)
            SELECT s.doc_id, s.n_lines,
                   ROUND(s.dup_line_frac, 6) AS dup_line_frac,
                   ROUND(s.dup_line_char_frac, 6) AS dup_line_char_frac,
                   ROUND(s.top_bigram_char_frac, 6) AS top_bigram_char_frac,
                   ROUND(s.dup_trigram_char_frac, 6) AS dup_trigram_char_frac,
                   ROUND(y.symbol_word_ratio, 6) AS symbol_word_ratio,
                   (s.dup_line_frac <= 0.30 AND s.dup_line_char_frac <= 0.20
                    AND s.top_bigram_char_frac <= 0.20
                    AND s.dup_trigram_char_frac <= 0.30
                    AND y.symbol_word_ratio <= 0.10) AS keep
            FROM stats s JOIN sym y USING (doc_id)
        """,
        # total_pairs constants below are regression pins: the full
        # candidate/pair set is not SQL-expressible (it depends on the
        # minhash/simhash signatures), but it IS a deterministic,
        # partition-invariant function of the sf0.01 corpus, verified
        # by re-running under different parallelism.  A recall or
        # over-generation change anywhere in the corpus flips them.
        "dedup_minhash": """
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(2461 AS BIGINT) AS total_pairs
            FROM documents WHERE doc_id < 50
        """,
        "dedup_simhash": """
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(55 AS BIGINT) AS total_pairs
            FROM documents WHERE doc_id < 50
        """,
        "ngram_jaccard": """
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(100 AS BIGINT) AS total_pairs
            FROM documents WHERE doc_id < 100
        """,
        "limit_keys_per_group": """
            SELECT o_custkey, CAST(LEAST(COUNT(DISTINCT o_orderkey), 2) AS BIGINT) AS n_keys
            FROM orders GROUP BY 1
        """,
        "partition_selection": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS count
            FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= 20
        """,
        "bounds": """
            WITH bins AS (
                SELECT CAST(LEAST(GREATEST(
                    CASE WHEN l_partkey = 0 THEN 0
                         ELSE CEIL(LOG2(ABS(CAST(l_partkey AS DOUBLE)))) END,
                    0), 62) AS INTEGER) AS r, COUNT(*) AS n
                FROM lineitem GROUP BY 1),
            t AS (SELECT SUM(n) AS total FROM bins),
            c AS (SELECT r, SUM(n) OVER (ORDER BY r) AS prefix FROM bins),
            pick AS (SELECT MIN(r) AS r FROM c, t WHERE c.prefix >= 0.95 * t.total)
            SELECT CAST(-POWER(2, r) AS BIGINT) AS lower,
                   CAST(POWER(2, r) AS BIGINT) AS upper FROM pick
        """,
        "partition_by_keys": """
            SELECT l_returnflag, COUNT(*) AS n FROM lineitem
            WHERE l_returnflag IN ('A','N','R') GROUP BY 1
        """,
        "map_revenue": """
            SELECT l_orderkey,
                   ROUND(l_extendedprice * (1.0 - l_discount), 4) AS revenue
            FROM lineitem
        """,
        "flatmap_by_key": """
            SELECT l_orderkey, COUNT(*) AS n_lines, MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1
        """,
        "replace_nulls": """
            SELECT c.c_custkey,
                   COALESCE(CASE WHEN n.n_nationkey < 10 THEN n.n_name END,
                            'UNKNOWN') AS n_name
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "dedup_exact": "SELECT DISTINCT text FROM documents",
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qvec
                       FROM embeddings WHERE vec_id < 20),
            scored AS (
                SELECT q.qid, e.vec_id,
                       list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e),
            ranked AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS INTEGER) AS n_tokens
            FROM documents
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id,
                              list_filter(string_split_regex(lower(text), '\\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
            h AS (SELECT doc_id,
                         len(list_intersect(list_distinct(toks), {_EN})) AS he,
                         len(list_intersect(list_distinct(toks), {_DE})) AS hd,
                         len(list_intersect(list_distinct(toks), {_FR})) AS hf,
                         len(list_intersect(list_distinct(toks), {_ES})) AS hs
                  FROM t)
            SELECT doc_id,
                   CASE WHEN GREATEST(he, hd, hf, hs) = 0 THEN 'unknown'
                        WHEN he >= hd AND he >= hf AND he >= hs THEN 'en'
                        WHEN hd >= hf AND hd >= hs THEN 'de'
                        WHEN hf >= hs THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM h
        """,
        "fingerprint_distinct": (
            "SELECT COUNT(DISTINCT text) AS n_distinct FROM documents"
        ),
        "streaming_window_counts": """
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                   COUNT(*) AS count
            FROM events GROUP BY 1, 2
        """,
        "zcdp_groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "approxdp_groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_sum_cents": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(CAST(ROUND(LEAST(GREATEST(l_extendedprice, 0.0), 10000.0) * 100) AS BIGINT)) AS s
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_cents
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_column_domains": """
            WITH flags(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            stats(l_linestatus) AS (VALUES ('F'),('O')),
            keys AS (SELECT * FROM flags CROSS JOIN stats),
            c AS (SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                  FROM lineitem GROUP BY 1, 2)
            SELECT k.l_returnflag, k.l_linestatus,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag, l_linestatus)
        """,
        "drop_nulls_nans": """
            SELECT l_orderkey,
                   l_quantity AS v1,
                   l_quantity AS v2
            FROM lineitem WHERE l_quantity <= 40 AND l_quantity >= 10
        """,
        "replace_nans_infs": """
            SELECT l_orderkey,
                   CASE WHEN l_quantity < 5 THEN 0.0
                        WHEN l_quantity > 45 THEN 50.0
                        ELSE l_quantity END AS v
            FROM lineitem
        """,
        "flatmap_explode": """
            SELECT l_orderkey, CAST(u.i AS BIGINT) AS idx
            FROM lineitem, UNNEST(range(LEAST(l_linenumber, 3))) AS u(i)
        """,
        "grouping_flatmap": """
            SELECT CAST(r.replica AS BIGINT) AS replica, COUNT(*) AS n
            FROM lineitem CROSS JOIN (VALUES (0), (1)) AS r(replica)
            GROUP BY 1
        """,
        "add_unique_column": "SELECT COUNT(*) AS n_unique FROM lineitem",
        "join_on_nulls": """
            WITH d AS (SELECT l_orderkey,
                              CASE WHEN l_returnflag = 'N' THEN NULL
                                   ELSE l_returnflag END AS flag_or_null
                       FROM lineitem),
            pub(flag_or_null, label) AS (
                VALUES ('A', 'accepted'), (NULL, 'none'), ('R', 'returned'))
            SELECT d.flag_or_null, d.l_orderkey, pub.label
            FROM d JOIN pub ON d.flag_or_null IS NOT DISTINCT FROM pub.flag_or_null
        """,
        "ann_ivf": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qvec
                       FROM embeddings WHERE vec_id < 20),
            scored AS (
                SELECT q.qid, e.vec_id,
                       list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e),
            ranked AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "embedding_near_dups": """
            WITH both_sets AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS c
                FROM both_sets a JOIN both_sets b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, ROUND(c, 6) AS cosine
            FROM pairs WHERE c >= 0.999
        """,
        "profile_quantiles": """
            SELECT 'l_quantity' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_quantity' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_quantity' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.75), 6) AS value
            FROM lineitem
        """,
        "sq_codes": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
            dims AS (
                SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi
                FROM e, unnest(generate_series(1, len(v))) AS t(i)
                GROUP BY i),
            enc AS (
                SELECT e.vec_id, d.i,
                       CAST(least(greatest(round(
                           (v[d.i] - d.lo)
                           / (CASE WHEN d.hi > d.lo THEN d.hi - d.lo
                                   ELSE 1.0 END)
                           * 255), 0), 255) AS INTEGER) - 128 AS code
                FROM e, dims d)
            SELECT vec_id, list(code ORDER BY i) AS sq_code
            FROM enc GROUP BY vec_id
        """,
        "stream_interval_join": """
            WITH v AS (
                SELECT user_id, ts AS view_ts, event_id AS view_id
                FROM events WHERE event_type = 'view'),
            b AS (
                SELECT user_id, ts AS buy_ts, event_id AS buy_id
                FROM events WHERE event_type = 'purchase')
            SELECT v.user_id, v.view_id, b.buy_id,
                   epoch_us(v.view_ts) AS view_epoch_us,
                   epoch_us(b.buy_ts) AS buy_epoch_us
            FROM v JOIN b ON v.user_id = b.user_id
            WHERE b.buy_ts >= v.view_ts
              AND b.buy_ts <= v.view_ts + INTERVAL 1800 SECONDS
        """,
        "bigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            occ AS (
                SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(1, len(toks)),
                               i -> struct_pack(w1 := toks[i],
                                                w2 := toks[i + 1]))) AS b
                    FROM t WHERE len(toks) >= 2)),
            c1 AS (
                SELECT term, COUNT(*) AS c1 FROM (
                    SELECT unnest(toks) AS term FROM t) GROUP BY term),
            v AS (SELECT COUNT(DISTINCT term) AS v FROM (
                    SELECT unnest(toks) AS term FROM t)),
            c2 AS (
                SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY w1, w2),
            s AS (
                SELECT occ.doc_id, COUNT(*) AS n_bigrams,
                       AVG(ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * v.v))) AS alp
                FROM occ
                JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
                JOIN c1 ON occ.w1 = c1.term
                CROSS JOIN v
                GROUP BY occ.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_bigrams, 0) AS INTEGER) AS n_bigrams,
                   ROUND(s.alp, 6) AS avg_logprob
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """,
        # first-occurrence-wins is min over (doc_id, pos) lexicographic;
        # the arithmetic encoding below equals that ordering because
        # pos < 1e6 for every document at any test SF
        "dedup_paragraphs": """
            WITH u AS (
                SELECT doc_id,
                       unnest(string_split(text, ' table ')) AS unit,
                       generate_subscripts(string_split(text, ' table '), 1)
                           - 1 AS pos
                FROM documents),
            w AS (
                SELECT unit, MIN(doc_id * 1000000 + pos) AS win
                FROM u GROUP BY unit),
            k AS (
                SELECT u.doc_id, u.pos, u.unit,
                       (u.doc_id * 1000000 + u.pos) = w.win AS keep
                FROM u JOIN w ON u.unit = w.unit)
            SELECT doc_id,
                   COALESCE(array_to_string(
                       list(unit ORDER BY pos) FILTER (WHERE keep),
                       ' table '), '') AS text,
                   CAST(COUNT(*) AS INTEGER) AS n_units,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER)
                       AS n_kept
            FROM k GROUP BY doc_id
        """,
        # components of nation<-customer<-orders: each cluster's min id
        # is its (raw, < 1e6) nation key
        "connected_components": """
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS node,
                   CAST(c_nationkey AS BIGINT) AS component
            FROM customer
            UNION ALL
            SELECT c_custkey + 1000000, CAST(c_nationkey AS BIGINT)
            FROM customer
            UNION ALL
            SELECT o.o_orderkey + 2000000, CAST(c.c_nationkey AS BIGINT)
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        # three identical copies per base doc form a 3-clique; the
        # canonical of each copy is the base doc id (cluster min)
        "dedup_connected": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(doc_id AS BIGINT) AS canonical_id
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT doc_id + 10000000, CAST(doc_id AS BIGINT)
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT doc_id + 20000000, CAST(doc_id AS BIGINT)
            FROM documents WHERE doc_id < 100
        """,
        # identical Knuth multiplicative-hash arithmetic as
        # extensions/sampling.py (seed 7; bounds = floor(0.8*2^32),
        # floor(0.9*2^32))
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN (((2654435761 * CAST((((doc_id + 7) % 4294967296) - ((doc_id + 7) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 7) % 4294967296) % 65536)) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN (((2654435761 * CAST((((doc_id + 7) % 4294967296) - ((doc_id + 7) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 7) % 4294967296) % 65536)) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY (((2654435761 * CAST((((doc_id + 3) % 4294967296) - ((doc_id + 3) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 3) % 4294967296) % 65536)) % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 50
        """,
        # serial greedy packing per bucket, replayed as a recursive CTE
        "pack_sequences": """
            WITH RECURSIVE d AS (
                SELECT doc_id, doc_id % 16 AS bucket,
                       LEAST(n_chars, 4096) AS tok,
                       ROW_NUMBER() OVER (PARTITION BY doc_id % 16
                                          ORDER BY doc_id) AS rn
                FROM documents),
            packed AS (
                SELECT bucket, rn, doc_id, tok,
                       0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.doc_id, x.tok,
                       CASE WHEN p.fill + x.tok > 4096
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 4096
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT doc_id, bucket, bin FROM packed
        """,
        # planted verbatim copies: flagged pairs are exactly the 30
        # (train doc, its +5M clone) pairs at jaccard 1
        "decontaminate": """
            SELECT doc_id AS train_id, doc_id + 5000000 AS holdout_id,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM documents WHERE doc_id >= 50 AND doc_id < 80
        """,
        # the full pipeline replayed in SQL: length gate -> min-id
        # dedup per text -> per-lang quota (seed 11) -> split (seed 13;
        # bounds floor(0.9*2^32), floor(0.95*2^32))
        "training_mix": """
            WITH f AS (
                SELECT doc_id, lang, text FROM documents
                WHERE n_chars >= 200),
            c AS (
                SELECT doc_id, lang FROM (
                    SELECT doc_id, lang,
                           ROW_NUMBER() OVER (PARTITION BY text
                                              ORDER BY doc_id) AS rn
                    FROM f) WHERE rn = 1),
            q AS (
                SELECT doc_id, lang FROM (
                    SELECT doc_id, lang,
                           ROW_NUMBER() OVER (
                               PARTITION BY lang
                               ORDER BY (((2654435761 * CAST((((doc_id + 11) % 4294967296) - ((doc_id + 11) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 11) % 4294967296) % 65536)) % 4294967296, doc_id) AS rn
                    FROM c) WHERE rn <= 100)
            SELECT doc_id, lang,
                   CASE WHEN (((2654435761 * CAST((((doc_id + 13) % 4294967296) - ((doc_id + 13) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 13) % 4294967296) % 65536)) % 4294967296
                             < 3865470566 THEN 'train'
                        WHEN (((2654435761 * CAST((((doc_id + 13) % 4294967296) - ((doc_id + 13) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2654435761 * (((doc_id + 13) % 4294967296) % 65536)) % 4294967296
                             < 4080218931 THEN 'val'
                        ELSE 'test' END AS split
            FROM q
        """,
        # same RE2-safe patterns as extensions/text.py PII_PATTERNS,
        # applied in the same order (counts measured on the
        # progressively redacted text, like the operator)
        "redact_pii": """
            WITH planted AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com at 10.0.0.7 or +1 555-123-4567'
                           AS text
                FROM documents WHERE doc_id < 200),
            s1 AS (
                SELECT doc_id,
                       len(string_split_regex(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) - 1 AS n_email,
                       regexp_replace(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
                FROM planted),
            s2 AS (
                SELECT doc_id, n_email,
                       len(string_split_regex(t1, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) - 1 AS n_ipv4,
                       regexp_replace(t1, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IPV4]', 'g') AS t2
                FROM s1),
            s3 AS (
                SELECT doc_id, n_email, n_ipv4,
                       len(string_split_regex(t2, '\\+?[0-9]{1,3}[ .\\-]?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}\\b')) - 1 AS n_phone,
                       regexp_replace(t2, '\\+?[0-9]{1,3}[ .\\-]?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}\\b', '[PHONE]', 'g') AS redacted
                FROM s2)
            SELECT doc_id, redacted, CAST(n_email AS BIGINT) AS n_email,
                   CAST(n_ipv4 AS BIGINT) AS n_ipv4,
                   CAST(n_phone AS BIGINT) AS n_phone
            FROM s3
        """,
        "profile_table": """
            SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
                   COUNT(DISTINCT o_orderkey) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_custkey' AS column, COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
                   COUNT(DISTINCT o_custkey) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus' AS column, COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS n_nulls,
                   COUNT(DISTINCT o_orderstatus) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_totalprice' AS column, COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS n_nulls,
                   COUNT(DISTINCT o_totalprice) AS n_distinct
            FROM orders
        """,
    }
