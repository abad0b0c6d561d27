"""Generate the SF-keyed pinned-constants fixture.

Four oracle entries carry constants that are deterministic,
partition-invariant functions of a specific ``documents`` corpus and
used to be hard-pinned at sf0.01 (failing as ordinary mismatches at
any other SF).  This script computes them for every shipped SF and
writes one long-form fixture ``pinned_constants.parquet`` with columns
``(sf_key, name, key, value)``:

* ``temperature_mix`` — one row per language: the integer hash-space
  threshold from the temperature-2 mixing rule, computed from a DuckDB
  lang histogram with no tumult_core_spark imports.  NOTE: while the
  histogram comes from DuckDB, the formula itself (q_s ∝
  (n_s/total)^((1-T)/T), max-normalized, truncated to int, scaled to
  2^32) is the SAME formula sampling.py uses — this guards against
  transcription drift in the oracle SQL, not against an error in the
  shared formula.  As a true independent anchor, ``main`` asserts two
  hand-derivable properties of the formula: the rarest language's
  threshold is exactly 2^32 (its q is the max, so max-normalization
  makes it 1.0), and thresholds are monotone non-increasing in
  language frequency (the exponent (1-T)/T is negative for T=2).
* ``dedup_minhash`` / ``dedup_simhash`` / ``ngram_jaccard`` — one row
  each (``key='total_pairs'``): regression pins of the full LSH /
  SimHash / n-gram candidate-set cardinality.  The signature pipeline
  is not SQL-expressible, so these are produced by running the repo's
  own entry queries once per SF (pin semantics: any recall or
  over-generation change flips them) and are verified
  partition-invariant by the conformance suite.

``sf_key`` = DuckDB's ``bit_xor(hash(doc_id, text))`` fingerprint of
the source documents table (see make_multimodal_fixture.py).  Oracle
SQL joins on it and raises a loud DuckDB error() when the table it
runs against matches no block.

Run:  python tests/fixtures/make_pinned_constants.py [sf_dir ...]
"""

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pinned_constants.parquet")

_MOD = 2**32

# Independently verified sf0.01 candidate-set cardinalities (the values
# that were hand-checked against partition-shuffled reruns before the
# fixture existed).  Regeneration MUST reproduce them — this stops a
# future recall/over-generation regression in the signature pipelines
# from being silently laundered into the fixture by a rerun.
_VERIFIED_SF001_PAIRS = {
    "dedup_minhash": 2461,
    "dedup_simhash": 55,
    "ngram_jaccard": 100,
}


def temperature_rows(sf_dir: str, temperature: float = 2.0):
    counts = dict(
        duckdb.sql(
            f"SELECT lang, COUNT(*) FROM '{sf_dir}/documents.parquet' "
            "WHERE lang IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    total = sum(counts.values())
    ex = (1.0 - temperature) / temperature
    qraw = {s: (n / total) ** ex for s, n in counts.items()}
    m = max(qraw.values())
    rows = [
        ("temperature_mix", s, min(_MOD, int((q / m) * _MOD)))
        for s, q in sorted(qraw.items())
    ]
    # Hand-derivable anchors (see module docstring): rarest lang pins
    # the scale at exactly 2^32; thresholds fall as frequency rises.
    thr = {s: v for _, s, v in rows}
    rarest = min(counts, key=counts.get)
    assert thr[rarest] == _MOD, (sf_dir, rarest, thr[rarest])
    by_freq = sorted(counts, key=counts.get)
    for a, b in zip(by_freq, by_freq[1:]):
        assert thr[a] >= thr[b], (sf_dir, a, b, thr[a], thr[b])
    return rows


def total_pairs_rows(spark, sf_dir: str):
    sys.path.insert(0, "/root/repo")
    import entry_queries as eq

    out = []
    for name, fn in [
        ("dedup_minhash", eq.q_dedup_minhash),
        ("dedup_simhash", eq.q_dedup_simhash),
        ("ngram_jaccard", eq.q_ngram_jaccard),
    ]:
        n = int(fn(spark, sf_dir).select("total_pairs").first()[0])
        # Loudly refuse to overwrite the independently verified sf0.01
        # values — a mismatch here is a pipeline regression, not a
        # fixture that needs "refreshing".
        if sf_dir.rstrip("/").endswith("sf0.01") and n != _VERIFIED_SF001_PAIRS[name]:
            raise AssertionError(
                f"{name} at sf0.01 produced total_pairs={n}, but the "
                f"independently verified historical value is "
                f"{_VERIFIED_SF001_PAIRS[name]}.  This is a regression in "
                f"the signature pipeline; do NOT regenerate the fixture "
                f"over it."
            )
        out.append((name, "total_pairs", n))
    return out


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("make_pinned_constants")
        .getOrCreate()
    )
    keys, names, kcol, vals = [], [], [], []
    for sf_dir in SF_DIRS:
        sf_key = duckdb.sql(
            f"SELECT bit_xor(hash(doc_id, text)) FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        rows = temperature_rows(sf_dir) + total_pairs_rows(spark, sf_dir)
        for name, key, value in rows:
            keys.append(sf_key)
            names.append(name)
            kcol.append(key)
            vals.append(value)
        print(f"{sf_dir}: sf_key={sf_key} rows={len(rows)}")
    t = pa.table(
        {
            "sf_key": pa.array(keys, pa.uint64()),
            "name": pa.array(names, pa.string()),
            "key": pa.array(kcol, pa.string()),
            "value": pa.array(vals, pa.int64()),
        }
    )
    pq.write_table(t, OUT)
    print(f"wrote {OUT}: {t.num_rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()
