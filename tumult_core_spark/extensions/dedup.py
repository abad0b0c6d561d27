"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (no dedup exists in tumult-core); these
follow the standard corpus-dedup playbook:

* exact dedup — hash-groupBy on content;
* MinHash + LSH — shingle -> minhash signature -> band buckets ->
  candidate pairs.  Everything up to pair generation is built-in Spark
  (``sequence``/``transform``/``xxhash64``/``array_min``), i.e. one
  shuffle on band keys, no Python;
* SimHash — 64-bit signatures via a vectorized pandas UDF, near-dup =
  small Hamming distance;
* n-gram Jaccard verification of candidate pairs via
  ``array_intersect`` / ``array_union``.

Scale notes: LSH banding keys the only shuffle; hot bands (boilerplate
text) are capped by ``max_band_bucket`` to keep the pair join from
exploding quadratically — the cap is applied per bucket with a window,
mirroring the truncation utilities.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """Keep one row per distinct value of ``columns`` (all if None).

    Implemented as a hash-groupBy (``dropDuplicates``): one map-side
    combined shuffle on the dedup key.
    """
    return df.dropDuplicates(columns) if columns else df.dropDuplicates()


def _shingle_expr(text_col: str, shingle_size: int) -> F.Column:
    """Array of distinct character shingles of the lowercased text.

    Pure JVM: ``sequence`` over start offsets + ``transform`` +
    ``substring`` — no Python crossing.
    """
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(lower(`{text_col}`)) - "
            f"{shingle_size - 1}, 1)), i -> substring(lower(`{text_col}`), i, "
            f"{shingle_size}))"
        )
    )


def word_ngrams(text_col: str, n: int = 3) -> F.Column:
    """Array of distinct word n-grams (whitespace tokenization), JVM-side."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(size(split(lower(`{text_col}`), "
            f"'\\\\s+')) - {n - 1}, 1)), i -> array_join(slice(split(lower("
            f"`{text_col}`), '\\\\s+'), i, {n}), ' '))"
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 5,
) -> DataFrame:
    """(id, signature array<long>) — minhash over character shingles.

    minhash_i = min over shingles of xxhash64(shingle, seed=i); each
    hash is a JVM expression, the whole signature is one project.
    """
    # Hash each shingle string ONCE to a long, then derive the k
    # signature components by re-hashing the longs — k string hashes
    # per document instead of k per shingle (~shingle_count x cheaper).
    shingles = _shingle_expr(text_col, shingle_size)
    base = F.transform(shingles, lambda s: F.xxhash64(s)).alias("__h")
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("__h"), lambda h, i=i: F.xxhash64(h, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    ).alias("minhash")
    return df.select(F.col(id_col), base).select(F.col(id_col), sig)


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    max_band_bucket: int = 50,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    Docs sharing any band signature become candidates.  Buckets larger
    than ``max_band_bucket`` are truncated (boilerplate guard) so the
    per-bucket self-join stays bounded.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col("minhash")[i * rows_per_band + j]
                            for j in range(rows_per_band)
                        ]
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    w = Window.partitionBy("band", "band_key").orderBy(id_col)
    capped = (
        banded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_band_bucket)
        .drop("__rn")
    )
    left = capped.alias("l")
    right = capped.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard >= threshold.

    With ``candidates`` (e.g. from LSH) the exact similarity is only
    computed on those pairs; without, all pairs are compared (test
    scale only — quadratic).
    """
    grams = df.select(
        F.col(id_col), word_ngrams(text_col, n).alias("__grams")
    )
    if candidates is None:
        a = grams.alias("a")
        b = grams.alias("b")
        joined = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        a = grams.alias("a")
        b = grams.alias("b")
        joined = (
            candidates.join(a, candidates["id_a"] == F.col(f"a.{id_col}"))
            .join(b, candidates["id_b"] == F.col(f"b.{id_col}"))
        )
    inter = F.size(F.array_intersect(F.col("a.__grams"), F.col("b.__grams")))
    union = F.size(F.array_union(F.col("a.__grams"), F.col("b.__grams")))
    jac = (inter / F.greatest(union, F.lit(1))).alias("jaccard")
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac,
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over whitespace tokens.

    Token hashing and the 64 bit-plane majority votes run vectorized
    in NumPy inside an Arrow-batched ``mapInPandas``.
    """
    out_schema = f"{id_col} long, simhash long"

    def compute(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sigs = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col].astype(str)):
                tokens = text.lower().split()
                if not tokens:
                    sigs[i] = 0
                    continue
                hashes = np.array(
                    [hash(t) & 0xFFFFFFFFFFFFFFFF for t in tokens], dtype=np.uint64
                )
                bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                sig = np.bitwise_or.reduce(
                    (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
                )
                sigs[i] = sig.astype(np.int64)
            yield pd.DataFrame({id_col: ids, "simhash": sigs})

    return df.select(id_col, text_col).mapInPandas(compute, schema=out_schema)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit signature into 4 16-bit
    bands; any pair within Hamming <= 3 shares at least one exact
    band, so candidates = band-bucket join, verified by popcount.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    for i in range(64 // band_bits)
                ]
            )
        ).alias("band", "band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
