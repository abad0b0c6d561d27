"""Dedup / similarity / text / multimodal / streaming extensions on the
driver's documents + embeddings + events tables."""

import pytest
from pyspark.sql import functions as F

from tumult_core_spark.extensions.dedup import (
    exact_dedup,
    minhash_lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from tumult_core_spark.extensions.similarity import (
    brute_force_knn,
    ivf_knn,
)
from tumult_core_spark.extensions.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from tumult_core_spark.extensions.multimodal import (
    attach_media_metadata,
    audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup(self, spark, docs):
        doubled = docs.union(docs)
        out = exact_dedup(doubled, ["text"])
        assert out.count() == docs.select("text").distinct().count()

    def test_exact_dedup_deterministic_survivor(self, spark):
        """Subset-key dedup keeps the min(struct(non-key...)) row —
        identical output under any partitioning (r14 verdict nit #1)."""
        rows = [(i % 7, i, f"payload-{i}") for i in range(200)]
        df = spark.createDataFrame(rows, ["k", "id", "payload"])
        expected = {(k, min(i for kk, i, _ in rows if kk == k)) for k in range(7)}
        for par in (1, 5, 32):
            out = exact_dedup(df.repartition(par), ["k"])
            got = {(r["k"], r["id"]) for r in out.collect()}
            assert got == expected
            # survivor's other columns ride along from the same row
            assert all(
                r["payload"] == f"payload-{r['id']}" for r in out.collect()
            )

    def test_exact_dedup_null_payload_sorts_first(self, spark):
        """min(struct) convention: NULL field values sort FIRST, so the
        NULL-payload candidate wins — pinned so the survivor rule never
        silently changes with a Spark upgrade."""
        df = spark.createDataFrame(
            [(1, None, "x"), (1, 5, "y"), (2, None, "z")],
            "k int, v int, s string",
        )
        for par in (1, 2, 4):
            out = sorted(
                tuple(r) for r in exact_dedup(df.repartition(par), ["k"]).collect()
            )
            assert out == [(1, None, "x"), (2, None, "z")]

    def test_exact_dedup_keep_any_and_map_guard(self, spark):
        df = spark.createDataFrame(
            [(1, {"a": 1}), (1, {"b": 2})], ["k", "m"]
        )
        # map-typed non-key column: keep='min' refuses loudly
        import pytest as _pytest

        with _pytest.raises(ValueError, match="map-typed"):
            exact_dedup(df, ["k"]).collect()
        assert exact_dedup(df, ["k"], keep="any").count() == 1

    def test_minhash_signatures_deterministic(self, spark, docs):
        s1 = minhash_signatures(docs.limit(50), "doc_id", "text", num_hashes=16)
        a = {r["doc_id"]: tuple(r["minhash"]) for r in s1.collect()}
        b = {r["doc_id"]: tuple(r["minhash"]) for r in s1.collect()}
        assert a == b
        assert all(len(v) == 16 for v in a.values())

    def test_minhash_lsh_finds_exact_dups(self, spark, docs):
        base = docs.limit(30)
        dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
        both = base.union(dup)
        pairs = minhash_lsh_candidate_pairs(
            both, "doc_id", "text", num_hashes=32, bands=8
        )
        found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        expected = {
            (r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()
        }
        assert expected <= found  # every exact duplicate pair is a candidate

    def test_minhash_cross_pairs_incremental(self, spark, docs):
        """New-batch-vs-indexed-corpus dedup: duplicates of corpus docs
        arriving in a new batch are flagged via the persisted band
        index without re-signing the corpus."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(100)
        index = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        # new batch: 20 duplicates of corpus docs + 10 fresh docs
        dups = corpus.filter("doc_id < 20").withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
        fresh = docs.filter("doc_id >= 200 and doc_id < 210").withColumn(
            "doc_id", F.col("doc_id") + 9_000_000
        )
        batch = dups.union(fresh)
        pairs = minhash_lsh_cross_pairs(batch, index, "doc_id", "text", 32, 8)
        found = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
        expected = {(i + 5_000_000, i) for i in range(20)}
        assert expected <= found
        # fresh docs don't match themselves (they're not in the corpus)
        assert all(n < 9_000_000 or c < 200 for n, c in found)

    def test_minhash_cross_pairs_over_cap_duplicates_rescued(self, spark, docs):
        """An arriving batch with MORE copies of a corpus page than
        max_band_bucket: the evicted copies must still be flagged
        (they inherit their bucket anchor's corpus matches) — the
        plain cap silently reported them unique (r15 review fix)."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        base = docs.filter("doc_id = 3").select("doc_id", "text")
        corpus = base.union(
            docs.filter("doc_id >= 100 and doc_id < 120").select("doc_id", "text")
        )
        index = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        # 12 identical copies of corpus doc 3, cap 8: 4 copies are
        # evicted from EVERY band bucket (hash-of-id order is the same
        # across bands)
        batch = None
        for i in range(12):
            part = base.withColumn("doc_id", F.lit(7_000_000 + i))
            batch = part if batch is None else batch.union(part)
        pairs = minhash_lsh_cross_pairs(
            batch, index, "doc_id", "text", 32, 8, max_band_bucket=8
        )
        flagged = {r["new_id"] for r in pairs.collect() if r["corpus_id"] == 3}
        assert flagged == {7_000_000 + i for i in range(12)}, flagged

    def test_cap_hot_buckets_null_keyed_bucket(self, spark):
        """A NULL bucket key over the cap must be capped like any other
        bucket — the null-unsafe join let it through uncapped."""
        from tumult_core_spark.extensions.dedup import cap_hot_buckets

        rows = [(i, None if i < 50 else "k") for i in range(60)]
        df = spark.createDataFrame(rows, "id long, b string")
        out = cap_hot_buckets(df, ["b"], "id", cap=10)
        got = out.groupBy("b").count().collect()
        counts = {r["b"]: r["count"] for r in got}
        assert counts == {None: 10, "k": 10}, counts

    def test_ngram_jaccard(self, spark, docs):
        base = docs.limit(20)
        dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
        both = base.union(dup)
        pairs = ngram_jaccard_pairs(both, "doc_id", "text", n=3, threshold=0.99)
        found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        expected = {(r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()}
        assert expected <= found

    def test_simhash_near_dups(self, spark, docs):
        base = docs.limit(30)
        dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
        both = base.union(dup)
        sigs = simhash_signatures(both, "doc_id", "text")
        assert sigs.count() == both.count()
        pairs = simhash_near_duplicates(both, "doc_id", "text", max_hamming=0)
        found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        expected = {(r["doc_id"], r["doc_id"] + 1_000_000) for r in base.collect()}
        assert expected <= found

    def test_simhash_signatures_repartition_invariant(self, spark, docs):
        # Deterministic token hashing: signatures must not depend on
        # which executor/partition computed them (regression for the
        # per-process-salted builtin hash() bug).
        base = docs.limit(50)
        s1 = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(base.repartition(1), "doc_id", "text").collect()
        }
        s16 = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(base.repartition(16), "doc_id", "text").collect()
        }
        assert s1 == s16
        assert any(v != 0 for v in s1.values())

    def test_simhash_band_bucket_cap(self, spark, docs):
        # A degenerate corpus (every doc identical) must stay bounded
        # (cap keeps the bucket self-join at O(cap^2)) while the
        # rescue edges keep every evicted member connected to the
        # bucket anchor at Hamming 0 — the bare cap silently evicted
        # 35 of the 40 docs from every band and reported them unique.
        same = docs.limit(40).withColumn("text", F.lit("same same same"))
        pairs = simhash_near_duplicates(
            same, "doc_id", "text", max_hamming=0, max_band_bucket=5
        )
        n = pairs.count()
        # bounded: survivors' C(5,2) + 35 linear rescue edges, never
        # the quadratic C(40,2)
        assert 35 < n < 40 * 39 // 2, n
        covered = pairs.select(
            F.explode(F.array("id_a", "id_b")).alias("i")
        ).distinct()
        assert covered.count() == 40  # nobody silently pairless
        assert pairs.filter("hamming != 0").count() == 0

    def test_minhash_hot_group_recall_under_cap(self, spark):
        # 200 exact text duplicates with a cap of 10: rescue edges
        # must keep every member paired (the bare membership cap
        # evicted 190 docs from all bands identically — same
        # hash-of-id order per band — and reported them unique), and
        # the output stays linear in the evicted rows, never C(200,2).
        same = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.lit("the very same boilerplate body in every document").alias(
                "text"
            ),
        )
        pairs = minhash_lsh_candidate_pairs(
            same, "doc_id", "text", max_band_bucket=10
        )
        n = pairs.count()
        assert 190 <= n < 1000, n  # C(10,2)*bands dedup + 190 rescues
        covered = pairs.select(
            F.explode(F.array("id_a", "id_b")).alias("i")
        ).distinct()
        assert covered.count() == 200

    def test_signatures_skip_null_text(self, spark):
        # NULL text yields NO signature: absence is not equality.
        # astype(str) would otherwise hash the literal "None" and pair
        # all NULL-text docs with each other (and with a doc whose
        # text really is "None").
        from tumult_core_spark.extensions.dedup import (
            minhash_signatures,
            simhash_signatures,
        )

        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "None"), (4, "an actual document")],
            "doc_id long, text string",
        )
        assert minhash_signatures(df, "doc_id", "text").count() == 2
        assert simhash_signatures(df, "doc_id", "text").count() == 2
        assert simhash_near_duplicates(df, "doc_id", "text").count() == 0

    def test_simhash_rejects_pigeonhole_violation(self, spark, docs):
        # 4 bands of 16 bits guarantee recall only to Hamming 3: a
        # larger max_hamming would silently miss pairs, so it raises.
        with pytest.raises(ValueError, match="pigeonhole"):
            simhash_near_duplicates(
                docs, "doc_id", "text", max_hamming=4, band_bits=16
            )

    def test_decontaminate_stop_gram_consistent_jaccard(self, spark):
        # When a stop set exists, the jaccard is over the SURVIVING
        # vocabulary: an exact copy must still score 1.0 even though
        # its boilerplate gram was dropped from the index (counting
        # stop grams in the union but not the intersection would
        # underestimate and silently retain contaminated docs).
        from tumult_core_spark.extensions.dedup import decontaminate

        hold = spark.createDataFrame(
            [
                (10, "x y z p q r"),
                (11, "x y z s t u"),
                (12, "x y z v w a"),
            ],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [(1, "x y z p q r")], "doc_id long, text string"
        )
        out = decontaminate(
            train, hold, "doc_id", "text", n=3, threshold=0.9,
            max_gram_doc_freq=2,  # "x y z" is in all 3 holdout docs
        ).collect()
        hits = {(r.train_id, r.holdout_id): r.jaccard for r in out}
        assert hits == {(1, 10): 1.0}, hits

    def test_embedding_lsh_planes_are_distinct(self, spark):
        # Regression for the PySpark HOF arity trap: binding the plane
        # index via a lambda DEFAULT (`lambda i, p=p`) makes PySpark
        # treat the lambda as (element, index) and every plane computes
        # the SAME projection — one effective hyperplane, bucket
        # collapse, near-total recall loss under the cap.  Planted
        # (non-identical) near-dup pairs must all be found.
        from tumult_core_spark.extensions.similarity import (
            embedding_near_duplicates,
        )

        import numpy as np

        rng = np.random.default_rng(0)
        rows = []
        vid = 0
        for _ in range(20):
            b = rng.normal(size=16)
            b /= np.linalg.norm(b)
            p = b + rng.normal(size=16) * 0.01
            p /= np.linalg.norm(p)
            rows.append((vid, [float(x) for x in b]))
            rows.append((vid + 1, [float(x) for x in p]))
            vid += 2
        for _ in range(40):
            r = rng.normal(size=16)
            r /= np.linalg.norm(r)
            rows.append((vid, [float(x) for x in r]))
            vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.99, num_planes=32,
            bands=8,
        )
        got = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in out.collect()
        }
        planted = {(2 * k, 2 * k + 1) for k in range(20)}
        assert planted <= got, planted - got

    def test_embedding_near_dup_bucket_cap(self, spark, embs):
        from tumult_core_spark.extensions.similarity import embedding_near_duplicates

        # identical vectors pre-group exactly: star mode keeps the
        # output linear even though the group dwarfs the bucket cap
        zeros = embs.limit(30).withColumn(
            "embedding", F.expr("transform(embedding, x -> cast(0.0 as float))")
        )
        out = embedding_near_duplicates(
            zeros, "vec_id", "embedding", threshold=-1.0, max_band_bucket=4,
            exact_pairs="star",
        )
        assert out.count() == 29  # min-id representative star

    def test_embedding_near_dup_hot_bucket_recall(self, spark):
        # 1000 identical vectors -> every one of the C(1000,2) true
        # pairs must be found even with a tiny bucket cap (the old
        # membership cap silently dropped all pairs for evicted rows);
        # the LSH index only ever sees ONE representative, so no
        # quadratic bucket join happens.
        from tumult_core_spark.extensions.similarity import embedding_near_duplicates

        base = spark.range(1000).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 16), i -> cast(i as double))"
            ).alias("embedding"),
        )
        out = embedding_near_duplicates(
            base, "vec_id", "embedding", threshold=0.999, max_band_bucket=8
        )
        assert out.count() == 1000 * 999 // 2

    def test_embedding_near_dup_cross_group_recall(self, spark):
        # two distinct near-parallel vectors, each duplicated 50x:
        # cross-group pairs must survive a cap far below the group
        # size, because the cap applies to distinct-vector buckets
        from tumult_core_spark.extensions.similarity import embedding_near_duplicates

        v1 = "array(1.0d, 0.0d, 0.0d, 0.0d, 1.0d, 0.0d, 0.0d, 0.0d)"
        v2 = "array(1.0d, 0.001d, 0.0d, 0.0d, 1.0d, 0.0d, 0.0d, 0.0d)"
        base = spark.range(100).select(
            F.col("id").alias("vec_id"),
            F.expr(f"if(id % 2 = 0, {v1}, {v2})").alias("embedding"),
        )
        out = embedding_near_duplicates(
            base, "vec_id", "embedding", threshold=0.99, max_band_bucket=4
        )
        # all C(100,2) pairs: 2x C(50,2) within + 50*50 cross
        assert out.count() == 100 * 99 // 2
        # spot-check: a cross pair carries the representative cosine
        cross = out.filter("id_a % 2 != id_b % 2").limit(1).collect()
        assert cross and cross[0]["cosine"] > 0.999

    def test_embedding_near_dup_star_cross_group_linear(self, spark):
        # star mode must stay linear for CROSS-group near-dups too: two
        # 20-member identical-vector groups that are mutually parallel
        # yield 19+19 within-star edges plus ONE rep-to-rep edge (which
        # preserves connectivity for component-based dedup), not 400
        # exploded member pairs
        from tumult_core_spark.extensions.similarity import embedding_near_duplicates

        base = spark.range(40).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 8), i -> cast(if(id < 20, 1.0, 2.0) as double))"
            ).alias("embedding"),
        )
        out = embedding_near_duplicates(
            base, "vec_id", "embedding", threshold=0.99, exact_pairs="star"
        )
        assert out.count() == 19 + 19 + 1
        # the single cross edge links the two groups' representatives
        cross = out.filter("(id_a < 20) != (id_b < 20)").collect()
        assert len(cross) == 1
        assert (cross[0]["id_a"], cross[0]["id_b"]) == (0, 20)


class TestSubstringDedup:
    """duplicate_substring_spans / remove_duplicate_substrings — exact
    cross-document duplicated-span detection via stride-1 token windows
    (Lee et al. 2022-style), pure Catalyst."""

    ROWS = [
        (1, "alpha beta gamma delta epsilon zeta eta theta unique one tail"),
        (2, "prefix two alpha beta gamma delta epsilon zeta eta theta suffix"),
        (3, "totally different text with no overlap at all whatsoever here"),
        # the shared passage appears TWICE, separated by y: two islands
        (4, "x alpha beta gamma delta epsilon zeta eta theta y "
            "alpha beta gamma delta epsilon zeta eta theta z"),
    ]

    def test_planted_passage_spans(self, spark):
        from tumult_core_spark.extensions.dedup import duplicate_substring_spans

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicate_substring_spans(df, "doc_id", "text", 8).collect()
        }
        # overlapping stride-1 windows merge into ONE maximal span per
        # occurrence; doc 3 is untouched; doc 4 keeps two islands
        assert got == {(1, 0, 7), (2, 2, 9), (4, 1, 8), (4, 10, 17)}

    def test_removal_rebuilds_survivors(self, spark):
        from tumult_core_spark.extensions.dedup import remove_duplicate_substrings

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {
            r.doc_id: r.cleaned
            for r in remove_duplicate_substrings(df, "doc_id", "text", 8).collect()
        }
        assert got[1] == "unique one tail"
        assert got[2] == "prefix two suffix"
        assert got[3] == self.ROWS[2][1]  # untouched
        assert got[4] == "x y z"

    def test_within_doc_repeat_alone_is_not_flagged(self, spark):
        from tumult_core_spark.extensions.dedup import duplicate_substring_spans

        # the same window twice in ONE doc only: min(doc)==max(doc),
        # so nothing is flagged (within-doc repetition belongs to
        # repetition_stats, not cross-doc dedup)
        rows = [(1, "a b c d e f a b c d e f"), (2, "totally different words here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert duplicate_substring_spans(df, "doc_id", "text", 6).count() == 0

    def test_fuzz_matches_bruteforce_reference(self, spark):
        """Random small corpora vs an O(docs^2 * len^2) brute-force:
        every window occurring in >=2 docs, merged greedily — the
        independent restatement of the operator's contract."""
        import random

        from tumult_core_spark.extensions.dedup import duplicate_substring_spans

        k = 4
        for seed in range(6):
            rnd = random.Random(seed)
            vocab = [f"w{j}" for j in range(8)]  # tiny vocab -> collisions
            docs = {
                d: [rnd.choice(vocab) for _ in range(rnd.randint(2, 30))]
                for d in range(6)
            }
            # brute force
            from collections import defaultdict

            owners = defaultdict(set)
            for d, toks in docs.items():
                for i in range(len(toks) - k + 1):
                    owners[tuple(toks[i:i + k])].add(d)
            expected = set()
            for d, toks in docs.items():
                starts = sorted(
                    i for i in range(len(toks) - k + 1)
                    if len(owners[tuple(toks[i:i + k])]) >= 2
                )
                cur = None
                for i in starts:
                    if cur and i <= cur[1] + 1:
                        cur = (cur[0], max(cur[1], i + k - 1))
                    else:
                        if cur:
                            expected.add((d, cur[0], cur[1]))
                        cur = (i, i + k - 1)
                if cur:
                    expected.add((d, cur[0], cur[1]))
            df = spark.createDataFrame(
                [(d, " ".join(t)) for d, t in docs.items()],
                "doc_id long, text string",
            )
            got = {
                (r.doc_id, r.span_start, r.span_end)
                for r in duplicate_substring_spans(df, "doc_id", "text", k).collect()
            }
            assert got == expected, f"seed {seed}: {got ^ expected}"

    def test_window_sweep_coarse_spans_contained_in_fine(self, spark):
        """Discretization guard for the docstring's window argument: a
        duplicated W-token window's subwindows of length w < W are
        duplicated too, so every span found at a coarser window must
        be contained in some span found at any finer window (coverage
        is monotone as the window shrinks).  Swept at 10/12/20 on a
        planted corpus."""
        import random

        from tumult_core_spark.extensions.dedup import duplicate_substring_spans

        rnd = random.Random(7)
        vocab = [f"t{j}" for j in range(500)]  # big vocab: no accidental dups
        shared_a = [rnd.choice(vocab) for _ in range(25)]
        shared_b = [rnd.choice(vocab) for _ in range(40)]
        docs = []
        for d in range(6):
            toks = [rnd.choice(vocab) for _ in range(rnd.randint(30, 60))]
            if d % 2 == 0:
                pos = rnd.randint(0, len(toks))
                toks = toks[:pos] + shared_a + toks[pos:]
            if d % 3 == 0:
                pos = rnd.randint(0, len(toks))
                toks = toks[:pos] + shared_b + toks[pos:]
            docs.append((d, " ".join(toks)))
        df = spark.createDataFrame(docs, "doc_id long, text string")

        by_window = {}
        for w in (10, 12, 20):
            per_doc = {}
            for r in duplicate_substring_spans(df, "doc_id", "text", w).collect():
                per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
            by_window[w] = per_doc
        # the planted 25/40-token inserts are found at every window
        assert by_window[20], "planted duplicates not found at w=20"
        for coarse, fine in ((20, 12), (20, 10), (12, 10)):
            for doc_id, coarse_spans in by_window[coarse].items():
                fine_spans = by_window[fine].get(doc_id, [])
                for cs, ce in coarse_spans:
                    assert any(
                        fs <= cs and ce <= fe for fs, fe in fine_spans
                    ), (
                        f"span ({cs},{ce}) at w={coarse} for doc {doc_id} "
                        f"not contained in any w={fine} span {fine_spans}"
                    )

    def test_stays_jvm_side(self, spark):
        from tumult_core_spark.extensions.dedup import (
            duplicate_substring_spans,
            remove_duplicate_substrings,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        for out in (
            duplicate_substring_spans(df, "doc_id", "text", 8),
            remove_duplicate_substrings(df, "doc_id", "text", 8),
        ):
            plan = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "formatted"
            )
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" not in plan
        # exchange budget of the spans path: the duplicate test must be
        # map-side combined before its ONE hash exchange, the island
        # pass adds one exchange by doc — a plan that shuffles raw
        # windows more than that regressed the design
        spans_plan = (
            duplicate_substring_spans(df, "doc_id", "text", 8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_min" in spans_plan  # map-side combine
        assert spans_plan.count("Exchange hashpartitioning") <= 3, spans_plan


class TestParagraphDedup:
    def test_first_occurrence_wins_and_reassembly(self, spark):
        from tumult_core_spark.extensions.dedup import dedup_paragraphs

        rows = [
            (1, "alpha\n\nshared\n\nbeta"),
            (2, "shared\n\ngamma"),
            (3, "shared"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
        assert out[1]["text"] == "alpha\n\nshared\n\nbeta"
        assert (out[1]["n_units"], out[1]["n_kept"]) == (3, 3)
        # doc 2 loses "shared" (first seen in doc 1) but keeps order
        assert out[2]["text"] == "gamma"
        assert (out[2]["n_units"], out[2]["n_kept"]) == (2, 1)
        # doc 3 collapses to empty rather than disappearing
        assert out[3]["text"] == ""
        assert (out[3]["n_units"], out[3]["n_kept"]) == (1, 0)

    def test_null_text_does_not_vanish(self, spark):
        from tumult_core_spark.extensions.dedup import dedup_paragraphs

        df = spark.createDataFrame(
            [(1, "alpha"), (2, None)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
        assert set(out) == {1, 2}
        assert out[2]["text"] == "" and out[2]["n_units"] == 1

    def test_hot_paragraph_skew(self, spark):
        """Corpus-wide boilerplate: 150k documents all sharing one
        paragraph (plus a unique one each).  The winner aggregation
        must map-side combine (no single-task blowup) and exactly one
        copy of the boilerplate survives."""
        from tumult_core_spark.extensions.dedup import dedup_paragraphs

        df = spark.range(150_000).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("shared boilerplate\n\nuniq"), F.col("id").cast("string")
            ).alias("text"),
        )
        out = dedup_paragraphs(df)
        agg = out.agg(
            F.sum("n_kept").alias("k"), F.sum("n_units").alias("u")
        ).first()
        assert agg["u"] == 300_000
        assert agg["k"] == 150_000 + 1
        winner = out.filter(F.col("text").contains("shared boilerplate"))
        assert winner.count() == 1
        assert winner.first()["doc_id"] == 0

    def test_partitioning_independent(self, spark):
        from tumult_core_spark.extensions.dedup import dedup_paragraphs

        rows = [(i, f"p{i % 7}\n\np{(i * 3) % 7}\n\nuniq{i}") for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = sorted(map(tuple, dedup_paragraphs(df).collect()))
        b = sorted(map(tuple, dedup_paragraphs(df.repartition(13)).collect()))
        assert a == b
        # each distinct paragraph survives exactly once corpus-wide
        import itertools

        kept = sum(r[3] for r in a)
        units = itertools.chain.from_iterable(t.split("\n\n") for _, t in rows)
        assert kept == len(set(units))


class TestFuzzyJoin:
    def test_edit1_matches_brute_force(self, spark):
        """Random short strings: FastSS blocking + levenshtein verify
        must equal the brute-force distance-<=1 pair set (insertions,
        deletions, substitutions, and exact matches all covered)."""
        import itertools
        import random

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a):
                cur = [i + 1]
                for j, cb in enumerate(b):
                    cur.append(
                        min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        from tumult_core_spark.extensions.dedup import fuzzy_join_edit1

        rnd = random.Random(3)
        base = ["".join(rnd.choices("abc", k=rnd.randint(1, 6))) for _ in range(40)]
        left = [(i, s) for i, s in enumerate(base)]
        # rights: originals, deletions, insertions, substitutions
        rights = []
        for i, s in enumerate(base):
            rights.append((1000 + i, s))
            if len(s) > 1:
                rights.append((2000 + i, s[1:]))
            rights.append((3000 + i, "z" + s))
            rights.append((4000 + i, "q" + s[1:]))
        L = spark.createDataFrame(left, ["lid", "ls"])
        R = spark.createDataFrame(rights, ["rid", "rs"])
        got = {
            (r["lid_l"], r["rid_r"], r["distance"])
            for r in fuzzy_join_edit1(L, R, "ls", "rs", "lid", "rid").collect()
        }
        expected = {
            (li, ri, lev(ls, rs))
            for (li, ls), (ri, rs) in itertools.product(left, rights)
            if lev(ls, rs) <= 1
        }
        assert got == expected and len(expected) > len(base)


class TestRedactPII:
    def test_redacts_and_counts(self, spark):
        from tumult_core_spark.extensions.text import redact_pii

        rows = [
            (0, "mail a@b.com and c.d+x@e.org end"),
            (1, "server 192.168.0.1 and 10.0.0.255"),
            (2, "call +1 555-123-4567 now"),
            (3, "clean text with no pii at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
        assert got[0]["redacted"] == "mail [EMAIL] and [EMAIL] end"
        assert got[0]["n_email"] == 2
        assert got[1]["redacted"] == "server [IPV4] and [IPV4]"
        assert got[1]["n_ipv4"] == 2 and got[1]["n_email"] == 0
        assert got[2]["redacted"] == "call [PHONE] now"
        assert got[2]["n_phone"] == 1
        assert got[3]["redacted"] == rows[3][1]
        assert (
            got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0
        )


class TestDecontaminate:
    def test_flags_only_contaminated_and_stop_grams_dont_change_values(
        self, spark, docs
    ):
        from tumult_core_spark.extensions.dedup import decontaminate

        train = docs.filter("doc_id < 60")
        holdout = train.filter("doc_id < 20").withColumn(
            "doc_id", F.col("doc_id") + 900000
        )
        out = decontaminate(train, holdout, "doc_id", "text", threshold=0.99)
        got = {(r["train_id"], r["holdout_id"]): r["jaccard"] for r in out.collect()}
        assert got == {(d, d + 900000): 1.0 for d in range(20)}
        # a tiny stop-gram bound may drop candidates but NEVER changes
        # a surviving pair's verified jaccard
        out2 = decontaminate(
            train, holdout, "doc_id", "text", threshold=0.99, max_gram_doc_freq=1
        )
        got2 = {(r["train_id"], r["holdout_id"]): r["jaccard"] for r in out2.collect()}
        assert set(got2) <= set(got)
        for k, v in got2.items():
            assert v == got[k]

    def test_partial_overlap_jaccard_value(self, spark):
        from tumult_core_spark.extensions.dedup import decontaminate

        # 6 tokens -> 4 distinct 3-grams; sharing the last 5 tokens
        # gives 3 shared grams, union 5 -> jaccard 0.6
        t = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        h = spark.createDataFrame(
            [(2, "z b c d e f")], "doc_id long, text string"
        )
        out = decontaminate(t, h, "doc_id", "text", n=3, threshold=0.5).collect()
        assert len(out) == 1 and abs(out[0]["jaccard"] - 0.6) < 1e-12
        none = decontaminate(t, h, "doc_id", "text", n=3, threshold=0.7).collect()
        assert none == []


class TestKMeansIVF:
    def test_lloyd_reduces_quantization_error(self, spark, embs):
        import numpy as np

        from tumult_core_spark.extensions.similarity import (
            kmeans_centroids,
            sample_centroids,
        )

        corpus = embs.limit(400).select(
            F.col("embedding").cast("array<double>").alias("__v")
        )

        def sse(cents_df):
            cents = np.array([r["__centroid"] for r in cents_df.collect()])
            vecs = np.array([r["__v"] for r in corpus.collect()])
            d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return float(d.min(axis=1).sum())

        init = sample_centroids(corpus, "__v", 8)
        trained = kmeans_centroids(corpus, "__v", 8, iterations=3)
        assert sse(trained) < sse(init)
        # deterministic
        again = kmeans_centroids(corpus, "__v", 8, iterations=3)
        a = sorted(map(tuple, (r["__centroid"] for r in trained.collect())))
        b = sorted(map(tuple, (r["__centroid"] for r in again.collect())))
        assert a == b

    def test_ivf_full_probe_exact_with_training(self, spark, embs):
        from tumult_core_spark.extensions.similarity import brute_force_knn, ivf_knn

        corpus = embs.limit(150)
        queries = corpus.limit(8).withColumnRenamed("vec_id", "qid")
        exact = {
            (r["qid"], r["rank"]): r["vec_id"]
            for r in brute_force_knn(
                corpus, queries, "vec_id", "qid", "embedding", k=3
            ).collect()
        }
        approx = {
            (r["qid"], r["rank"]): r["vec_id"]
            for r in ivf_knn(
                corpus, queries, "vec_id", "qid", "embedding", k=3,
                num_centroids=6, nprobe=6, train_iterations=2,
            ).collect()
        }
        assert exact == approx


class TestSampling:
    def test_temperature_thresholds(self):
        from tumult_core_spark.extensions.sampling import (
            _MOD,
            temperature_thresholds,
        )

        counts = {"en": 800, "fr": 100, "de": 100}
        # T=1: no reweighting, everything kept
        assert set(temperature_thresholds(counts, 1.0).values()) == {_MOD}
        t2 = temperature_thresholds(counts, 2.0)
        # smallest sources kept in full; dominant source downsampled by
        # sqrt(w_min/w_en) = sqrt(100/800)
        assert t2["fr"] == _MOD and t2["de"] == _MOD
        assert t2["en"] == int((100 / 800) ** 0.5 * _MOD)
        # higher temperature flattens harder
        t5 = temperature_thresholds(counts, 5.0)
        assert t5["en"] < t2["en"]
        with pytest.raises(ValueError):
            temperature_thresholds(counts, 0.0)

    def test_temperature_mix_flattens_and_is_deterministic(self, spark, docs):
        from tumult_core_spark.extensions.sampling import temperature_mix

        out = temperature_mix(docs, "lang", "doc_id", 2.0, seed=11)
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in temperature_mix(
                docs.repartition(16), "lang", "doc_id", 2.0, seed=11
            ).collect()
        )
        assert a == b and 0 < len(a) < docs.count()
        before = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
        after = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
        # the rarest language survives untouched; the dominant one shrinks
        rare = min(before, key=before.get)
        dom = max(before, key=before.get)
        assert after[rare] == before[rare]
        assert after[dom] < before[dom]

    def test_token_budget_mix_hits_targets(self, spark):
        from tumult_core_spark.extensions.sampling import (
            token_budget_mix,
            token_budget_thresholds,
        )

        # source a: 10k docs x 100 chars = 1M; source b: 400 x 100 = 40k
        rows = [(i, "a" if i < 10_000 else "b", 100) for i in range(10_400)]
        df = spark.createDataFrame(rows, "doc_id long, source string, cost long")
        out = token_budget_mix(df, "source", "doc_id", "cost", budget=240_000.0)
        got = {
            r["source"]: r["c"]
            for r in out.groupBy("source").agg(F.sum("cost").alias("c")).collect()
        }
        # target per source = 120k: a downsamples to ~120k (hash
        # sampling concentration), b (inventory 40k < target) kept WHOLE
        assert got["b"] == 40_000
        assert abs(got["a"] - 120_000) < 18_000
        # determinism + thresholds are a pure function
        again = token_budget_mix(df, "source", "doc_id", "cost", budget=240_000.0)
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )
        t = token_budget_thresholds({"a": 1_000_000, "b": 40_000}, 240_000.0)
        assert t["b"] == 1 << 32 and 0 < t["a"] < 1 << 32
        # empty input passes through (like temperature_mix), no error
        empty = spark.createDataFrame([], "doc_id long, source string, cost long")
        assert token_budget_mix(empty, "source", "doc_id", "cost", 100.0).count() == 0
        # scan-side filter: no shuffle on the data path
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan

    def test_token_budget_mix_all_null_sources_dropped(self, spark):
        """The docstring contract 'NULL sources are dropped' must hold
        even when EVERY source is NULL: the empty-thresholds early
        return previously passed the whole frame through, NULLs
        included."""
        from tumult_core_spark.extensions.sampling import token_budget_mix

        all_null = spark.createDataFrame(
            [(i, None, 10) for i in range(5)],
            "doc_id long, source string, cost long",
        )
        assert token_budget_mix(all_null, "source", "doc_id", "cost", 100.0).count() == 0
        # mixed: NULL rows dropped, the real source honored
        mixed = spark.createDataFrame(
            [(0, None, 10), (1, "a", 10), (2, "a", 10)],
            "doc_id long, source string, cost long",
        )
        out = token_budget_mix(mixed, "source", "doc_id", "cost", 1000.0)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]

    def test_temperature_mix_null_sources_dropped(self, spark):
        from tumult_core_spark.extensions.sampling import temperature_mix

        docs = spark.createDataFrame(
            [(1, "en"), (2, None), (3, "fr")], "doc_id long, lang string"
        )
        kept = sorted(
            r["doc_id"]
            for r in temperature_mix(docs, "lang", "doc_id", 1.0).collect()
        )
        assert kept == [1, 3]

    def test_hash_split_deterministic_and_partition_independent(self, spark, docs):
        from tumult_core_spark.extensions.sampling import hash_split

        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
        a = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs, "doc_id", splits, seed=1).collect()
        }
        b = {
            r["doc_id"]: r["split"]
            for r in hash_split(
                docs.repartition(16), "doc_id", splits, seed=1
            ).collect()
        }
        assert a == b
        # every row lands in exactly one split; proportions roughly hold
        n = len(a)
        from collections import Counter

        c = Counter(a.values())
        assert set(c) <= {"train", "val", "test"}
        assert c["train"] > 0.6 * n
        # different seed reshuffles the assignment
        d = {
            r["doc_id"]: r["split"]
            for r in hash_split(docs, "doc_id", splits, seed=2).collect()
        }
        assert a != d

    def test_hash_sample_is_subset_and_nested(self, spark, docs):
        # fraction f1 < f2 => sample(f1) is a SUBSET of sample(f2)
        # (consecutive hash-space intervals), enabling consistent
        # corpus thinning across experiments
        from tumult_core_spark.extensions.sampling import hash_sample

        s20 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed=5).collect()}
        s50 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, seed=5).collect()}
        assert s20 <= s50
        n = docs.count()
        assert 0.05 * n < len(s20) < 0.4 * n

    def test_stratified_sample_quota(self, spark, docs):
        from tumult_core_spark.extensions.sampling import stratified_sample

        out = stratified_sample(docs, "lang", "doc_id", 7, seed=0)
        counts = {r["lang"]: r["cnt"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        full = {r["lang"]: r["cnt"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        for lang, c in counts.items():
            assert c == min(full[lang], 7)
        # deterministic under repartition
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in stratified_sample(
                docs.repartition(16), "lang", "doc_id", 7, seed=0
            ).collect()
        )
        assert a == b

    def test_global_shuffle_is_a_permutation(self, spark, docs):
        from tumult_core_spark.extensions.sampling import global_shuffle

        n = docs.count()
        out = global_shuffle(docs, "doc_id", seed=3)
        assert out.columns == docs.columns + ["pos"]
        positions = [r["pos"] for r in out.select("pos").collect()]
        assert sorted(positions) == list(range(n))

    def test_global_shuffle_string_ids_and_null_drop(self, spark):
        """String ids mix via xxhash64 (deterministically, under any
        partitioning); NULL ids are dropped — an earlier version lost
        uncastable ids SILENTLY through the offsets join."""
        from tumult_core_spark.extensions.sampling import global_shuffle

        df = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(40)] + [(None,)], "sid string"
        )
        base = {
            (r["sid"], r["pos"])
            for r in global_shuffle(df, "sid", seed=3).collect()
        }
        assert len(base) == 40 and all(s is not None for s, _ in base)
        assert sorted(p for _, p in base) == list(range(40))
        again = {
            (r["sid"], r["pos"])
            for r in global_shuffle(df.repartition(7), "sid", seed=3).collect()
        }
        assert again == base

    def test_token_budget_mix_fractional_costs(self, spark):
        """A source whose per-row costs are all < 1 must NOT vanish:
        the old per-row long cast truncated every cost to 0, summed to
        zero inventory, and dropped the source outright."""
        from tumult_core_spark.extensions.sampling import token_budget_mix

        rows = [(i, "frac", 0.8) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string, cost double")
        out = token_budget_mix(
            df, "source", "doc_id", "cost", budget=1_000_000.0
        )
        # budget >> inventory: the whole source is kept
        assert out.count() == 100

    def test_global_shuffle_partitioning_independent(self, spark, docs):
        from tumult_core_spark.extensions.sampling import global_shuffle

        base = {
            (r["doc_id"], r["pos"])
            for r in global_shuffle(docs, "doc_id", seed=3)
            .select("doc_id", "pos")
            .collect()
        }
        for variant in (docs.repartition(17), docs.orderBy(F.rand(9))):
            alt = {
                (r["doc_id"], r["pos"])
                for r in global_shuffle(variant, "doc_id", seed=3)
                .select("doc_id", "pos")
                .collect()
            }
            assert alt == base

    def test_global_shuffle_bucket_count_invariant(self, spark, docs):
        """The released permutation is the global (mix, id) order
        whatever the bucket parallelism — including buckets far
        exceeding the row count (empty buckets) and a single bucket
        (one global window)."""
        from tumult_core_spark.extensions.sampling import global_shuffle

        base = {
            (r["doc_id"], r["pos"])
            for r in global_shuffle(docs, "doc_id", seed=1, buckets=1)
            .select("doc_id", "pos")
            .collect()
        }
        for b in (7, 1024, 65536):
            alt = {
                (r["doc_id"], r["pos"])
                for r in global_shuffle(docs, "doc_id", seed=1, buckets=b)
                .select("doc_id", "pos")
                .collect()
            }
            assert alt == base

    def test_global_shuffle_seed_changes_order(self, spark, docs):
        from tumult_core_spark.extensions.sampling import global_shuffle

        a = {
            (r["doc_id"], r["pos"])
            for r in global_shuffle(docs, "doc_id", seed=0)
            .select("doc_id", "pos")
            .collect()
        }
        b = {
            (r["doc_id"], r["pos"])
            for r in global_shuffle(docs, "doc_id", seed=1)
            .select("doc_id", "pos")
            .collect()
        }
        assert a != b
        assert {x[0] for x in a} == {x[0] for x in b}

    def test_global_shuffle_rejects_existing_position_col(self, spark, docs):
        from tumult_core_spark.extensions.sampling import global_shuffle

        with pytest.raises(ValueError, match="already exists"):
            global_shuffle(docs, "doc_id", position_col="doc_id")
        with pytest.raises(ValueError, match="buckets"):
            global_shuffle(docs, "doc_id", buckets=0)

    def test_global_shuffle_empty_input(self, spark, docs):
        from tumult_core_spark.extensions.sampling import global_shuffle

        assert global_shuffle(docs.limit(0), "doc_id").count() == 0


class TestPacking:
    def test_pack_respects_window_and_greedy_order(self, spark):
        from tumult_core_spark.extensions.packing import pack_sequences

        rows = [(i, s) for i, s in enumerate([100, 50, 80, 120, 10, 90, 200, 60])]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        out = pack_sequences(df, "doc_id", "n", window=200, num_buckets=1)
        got = {r["doc_id"]: r["bin"] for r in out.collect()}
        # greedy by id: [100,50]=150 | +80 overflow -> bin1 [80,120]=200
        # | +10 overflow -> bin2 [10,90]=100 | +200 overflow -> bin3
        # [200] | +60 -> bin4
        assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 4}
        # per-bin totals never exceed the window
        sizes = dict(rows)
        fills = {}
        for d, b in got.items():
            fills[b] = fills.get(b, 0) + min(sizes[d], 200)
        assert all(v <= 200 for v in fills.values())

    def test_pack_deterministic_and_clamps_oversize(self, spark):
        from tumult_core_spark.extensions.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, 5000 if i % 3 == 0 else 1000) for i in range(60)],
            "doc_id long, n long",
        )
        a = sorted(map(tuple, pack_sequences(df, "doc_id", "n", 4096, 4).collect()))
        b = sorted(
            map(
                tuple,
                pack_sequences(df.repartition(16), "doc_id", "n", 4096, 4).collect(),
            )
        )
        assert a == b
        # an oversize (clamped) doc occupies a bin by itself
        out = {r["doc_id"]: (r["bucket"], r["bin"]) for r in
               pack_sequences(df, "doc_id", "n", 4096, 4).collect()}
        big_bins = {out[i] for i in range(0, 60, 3)}
        small_bins = {out[i] for i in range(60) if i % 3 != 0}
        assert big_bins.isdisjoint(small_bins)


class TestConnectedComponents:
    @staticmethod
    def _uf(edges):
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent.setdefault(parent[x], parent[x])
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups = {}
        for n in list(parent):
            groups.setdefault(find(n), []).append(n)
        return {n: min(ms) for ms in groups.values() for n in ms}

    def test_random_graph_matches_union_find(self, spark):
        import random

        from tumult_core_spark.extensions.components import connected_components

        rnd = random.Random(7)
        nodes = rnd.sample(range(10**6), 300)
        edges = [
            (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(250)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = self._uf(edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == want

    def test_null_endpoints_never_surface(self, spark):
        """A NULL endpoint (or uncastable id) must not yield a spurious
        (NULL, NULL) output row via the self-loop-singleton join."""
        from tumult_core_spark.extensions.components import connected_components

        df = spark.createDataFrame(
            [(1, 2), (None, 3), (4, None), (5, 5)],
            "id_a long, id_b long",
        )
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        # 3 and 4 appear only opposite a NULL: singletons of themselves;
        # 5's only edge is a self-loop: singleton; no NULL node anywhere
        assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}

    def test_long_path_converges_logarithmically(self, spark):
        # a 120-node path is the adversarial case for naive label
        # propagation (O(n) rounds); alternating star must finish
        # inside the round cap (O(log n))
        from tumult_core_spark.extensions.components import connected_components

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(120)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, local_finish_edges=0).collect()
        }
        assert got == {i: 0 for i in range(121)}

    def test_no_checkpoint_block_accumulation(self, spark):
        # each fixpoint round localCheckpoints twice; consumed rounds
        # must release their blocks immediately (free_local_checkpoint)
        # rather than pile up until py4j GC — the multi-round path
        # (long path graph => several rounds) must end with at most
        # the final round's checkpoint still stored
        from tumult_core_spark.extensions.components import connected_components

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(120)], "id_a long, id_b long"
        )
        baseline = len(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        connected_components(df, local_finish_edges=0).count()
        after = len(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        assert after - baseline <= 1, (baseline, after)

    def test_reliable_checkpoint_opt_in_converges(self, spark, tmp_path):
        # checkpoint_dir switches every round's lineage cut from
        # localCheckpoint (blocks die with their executor) to a
        # reliable checkpoint() that survives executor loss at cluster
        # scale; the fixpoint must be unchanged and the directory must
        # actually receive the round snapshots
        import os

        from tumult_core_spark.extensions.components import connected_components

        cdir = str(tmp_path / "ckpt")
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(120)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                df, checkpoint_dir=cdir, local_finish_edges=0
            ).collect()
        }
        assert got == {i: 0 for i in range(121)}
        rdd_dirs = [
            f
            for root, dirs, _ in os.walk(cdir)
            for f in dirs
            if f.startswith("rdd-")
        ]
        assert rdd_dirs, "no reliable checkpoint was written"

    def test_checkpoint_dir_reaches_through_pipeline_helper(self, spark, tmp_path):
        # checkpoint_dir must be reachable from the public dedup-facing
        # helper without touching extension internals, and a dir whose
        # path contains another as a PREFIX must still be re-set (the
        # old substring test silently kept the previous location)
        import os

        from tumult_core_spark.extensions.components import canonical_duplicates

        d1 = str(tmp_path / "ckpt")
        d2 = str(tmp_path / "ckpt2")  # d1 is a prefix of d2
        pairs = spark.createDataFrame(
            [(1, 5), (5, 9), (2, 4)], "id_a long, id_b long"
        )
        got = {
            r["doc_id"]: r["canonical_id"]
            for r in canonical_duplicates(
                pairs, checkpoint_dir=d1, local_finish_edges=0
            ).collect()
        }
        assert got == {1: 1, 5: 1, 9: 1, 2: 2, 4: 2}
        got2 = {
            r["doc_id"]: r["canonical_id"]
            for r in canonical_duplicates(
                pairs, checkpoint_dir=d2, local_finish_edges=0
            ).collect()
        }
        assert got2 == got
        for d in (d1, d2):
            rdds = [
                f
                for root, dirs, _ in os.walk(d)
                for f in dirs
                if f.startswith("rdd-")
            ]
            assert rdds, f"no reliable checkpoint written under {d}"

    def test_canonical_duplicates_drop_set(self, spark):
        from tumult_core_spark.extensions.components import canonical_duplicates

        # two 3-cliques {1,5,9} and {2,4}; canonical = cluster min
        pairs = spark.createDataFrame(
            [(1, 5), (5, 9), (1, 9), (2, 4)], "id_a long, id_b long"
        )
        got = {r["doc_id"]: r["canonical_id"] for r in canonical_duplicates(pairs).collect()}
        assert got == {1: 1, 5: 1, 9: 1, 2: 2, 4: 2}


class TestSimilarity:
    def test_brute_force_string_ids(self, spark, embs):
        """id columns keep their input types — a hardcoded long schema
        used to crash Arrow on string doc ids (r15 review fix)."""
        corpus = embs.limit(20).select(
            F.concat(F.lit("doc-"), F.col("vec_id")).alias("sid"), "embedding"
        )
        queries = corpus.limit(3).withColumnRenamed("sid", "qid")
        out = brute_force_knn(corpus, queries, "sid", "qid", "embedding", k=1)
        rows = out.collect()
        assert all(
            isinstance(r["qid"], str) and r["qid"].startswith("doc-")
            for r in rows
        )
        assert {r["qid"] for r in rows} == {r["sid"] for r in rows}

    def test_kmeans_centroids_frozen_per_iteration(self, spark, embs):
        """Each Lloyd iteration freezes its centroids as a local
        relation: left lazy, iteration i's collect re-executed every
        earlier iteration's corpus aggregation (O(iterations^2) corpus
        scans — the r15 review finding)."""
        from tumult_core_spark.extensions.similarity import kmeans_centroids

        cents = kmeans_centroids(
            embs.limit(200).select("embedding"), "embedding", 4, iterations=2
        )
        plan = cents._sc._jvm.PythonSQLUtils.explainString(
            cents._jdf.queryExecution(), "simple"
        )
        assert (
            "LocalTableScan" in plan
            or "LocalRelation" in plan
            or "ExistingRDD" in plan
        ), plan
        assert "parquet" not in plan.lower() and "mapinpandas" not in plan.lower(), plan

    def test_brute_force_self_top1(self, spark, embs):
        corpus = embs.limit(100)
        queries = corpus.limit(10).withColumnRenamed("vec_id", "qid")
        out = brute_force_knn(
            corpus, queries, "vec_id", "qid", "embedding", k=3
        )
        top1 = {r["qid"]: r["vec_id"] for r in out.filter("rank = 1").collect()}
        # each query's nearest neighbour is itself (cosine 1.0)
        assert all(q == c for q, c in top1.items())
        assert out.filter("rank <= 3").groupBy("qid").count().filter(
            "count != 3"
        ).count() == 0

    def test_brute_force_query_guard(self, spark, embs):
        corpus = embs.limit(100)
        queries = corpus.limit(10).withColumnRenamed("vec_id", "qid")
        with pytest.raises(ValueError, match="max_queries"):
            brute_force_knn(
                corpus, queries, "vec_id", "qid", "embedding", k=3, max_queries=5
            )

    def test_ivf_recall_of_self(self, spark, embs):
        corpus = embs.limit(200)
        queries = corpus.limit(10).withColumnRenamed("vec_id", "qid")
        out = ivf_knn(
            corpus, queries, "vec_id", "qid", "embedding",
            k=3, num_centroids=8, nprobe=8,  # probe all cells -> exact
        )
        top1 = {r["qid"]: r["vec_id"] for r in out.filter("rank = 1").collect()}
        assert all(q == c for q, c in top1.items())


class TestSQ:
    def test_ragged_vectors_rejected(self, spark):
        """sq_fit validates uniform dimensionality in the fit scan:
        ragged input raises instead of silently producing NULL-skewed
        bounds and variable-length codes."""
        import pytest as _pytest

        from tumult_core_spark.extensions.similarity import sq_fit

        ragged = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0]), (3, [0.0, 1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
        with _pytest.raises(ValueError, match="ragged"):
            sq_fit(ragged, "embedding")

    def test_codes_match_numpy(self, spark, embs):
        import numpy as np

        from tumult_core_spark.extensions.similarity import sq_encode, sq_fit

        corpus = embs.limit(100)
        lo, hi = sq_fit(corpus, "embedding")
        rows = corpus.collect()
        got = {
            r["vec_id"]: r["sq_code"]
            for r in sq_encode(corpus, "vec_id", "embedding", lo, hi).collect()
        }
        spans = np.where(hi > lo, hi - lo, 1.0)
        for r in rows:
            x = np.asarray(r["embedding"], dtype=np.float64)
            # Spark F.round is HALF_UP (away from zero for these
            # non-negative scaled values); np.round is half-to-even,
            # so use floor(x + 0.5) as the reference
            exp = (
                np.clip(np.floor((x - lo) / spans * 255 + 0.5), 0, 255).astype(int)
                - 128
            )
            assert list(exp) == got[r["vec_id"]], r["vec_id"]

    def test_knn_recall_vs_exact(self, spark, embs):
        from tumult_core_spark.extensions.similarity import brute_force_knn, sq_knn

        corpus = embs
        queries = embs.limit(10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = brute_force_knn(corpus, queries, "vec_id", "query_id", k=10)
        approx = sq_knn(corpus, queries, "vec_id", "query_id", k=10)
        e = {}
        for r in exact.collect():
            e.setdefault(r["query_id"], set()).add(r["vec_id"])
        a = {}
        for r in approx.collect():
            a.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall = sum(len(e[q] & a[q]) for q in e) / sum(len(e[q]) for q in e)
        assert recall >= 0.8, recall

    def test_deterministic_under_repartition(self, spark, embs):
        from tumult_core_spark.extensions.similarity import sq_encode, sq_fit

        lo, hi = sq_fit(embs, "embedding")
        a = sorted(
            (r["vec_id"], tuple(r["sq_code"]))
            for r in sq_encode(embs, "vec_id", "embedding", lo, hi).collect()
        )
        b = sorted(
            (r["vec_id"], tuple(r["sq_code"]))
            for r in sq_encode(
                embs.repartition(7), "vec_id", "embedding", lo, hi
            ).collect()
        )
        assert a == b


class TestPQ:
    @pytest.fixture(scope="class")
    def fitted(self, spark, sf_dir):
        from tumult_core_spark.extensions.similarity import pq_encode, pq_fit

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = pq_fit(embs, "embedding", num_subvectors=8, num_centroids=64)
        codes = pq_encode(embs, "vec_id", "embedding", books)
        return embs, books, codes

    def test_dimension_mismatch_fails_loudly(self, spark, fitted):
        """Codebooks fit at one embedding dim must REFUSE longer
        vectors: numpy slicing would silently encode only a prefix —
        wrong neighbors with no crash (r15 review fix)."""
        embs, books, _ = fitted
        from tumult_core_spark.extensions.similarity import pq_encode

        wide = embs.select(
            "vec_id",
            F.concat("embedding", "embedding").alias("embedding"),
        )
        from pyspark.errors import PythonException

        with pytest.raises(PythonException, match="refit pq codebooks"):
            pq_encode(wide, "vec_id", "embedding", books).collect()

    def test_codebook_shape_and_determinism(self, spark, sf_dir, fitted):
        import numpy as np

        from tumult_core_spark.extensions.similarity import pq_fit

        embs, books, _ = fitted
        assert books.shape == (8, 64, 8)  # 64-dim / 8 subvectors
        again = pq_fit(
            embs.repartition(16), "embedding", num_subvectors=8, num_centroids=64
        )
        np.testing.assert_allclose(books, again, rtol=1e-9)

    def test_encode_matches_numpy(self, fitted):
        import numpy as np

        embs, books, codes = fitted
        got = {r["vec_id"]: list(r["pq_code"]) for r in codes.collect()}
        sample = embs.limit(30).collect()
        for r in sample:
            x = np.asarray(r["embedding"], dtype=np.float64)
            expect = []
            for j in range(8):
                seg = x[j * 8 : (j + 1) * 8]
                d2 = ((books[j] - seg) ** 2).sum(axis=1)
                expect.append(int(np.argmin(d2)))
            assert got[r["vec_id"]] == expect

    def test_ivfpq_index_and_probe(self, spark, fitted):
        """IVF-PQ: every query returns k results from its probed
        cells; full probe (nprobe = num_cells) reproduces plain
        pq_knn exactly."""
        from tumult_core_spark.extensions.similarity import (
            ivfpq_index,
            ivfpq_knn,
            pq_knn,
        )

        embs, books, codes = fitted
        index_df, cents = ivfpq_index(
            embs, "vec_id", "embedding", books, num_cells=8, train_iterations=1
        )
        assert index_df.count() == embs.count()
        queries = embs.filter("vec_id < 10").select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        partial = ivfpq_knn(
            index_df, queries, books, cents, "vec_id", "qid", "embedding",
            k=5, nprobe=2,
        )
        by_q = {}
        for r in partial.collect():
            by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        assert set(by_q) == set(range(10))
        assert all(len(v) == 5 for v in by_q.values())
        full = ivfpq_knn(
            index_df, queries, books, cents, "vec_id", "qid", "embedding",
            k=5, nprobe=8,
        )
        plain = pq_knn(codes, queries, books, "vec_id", "qid", "embedding", k=5)
        a = sorted(map(tuple, full.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b

    def test_adc_topk_recall(self, spark, fitted):
        """Identical vectors share codes (ADC distance ties at the
        query's own quantization error), and PQ top-10 must overlap
        substantially with exact L2 top-10."""
        import numpy as np

        from tumult_core_spark.extensions.similarity import pq_knn

        embs, books, codes = fitted
        queries = embs.filter("vec_id < 20").select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        top = pq_knn(codes, queries, books, "vec_id", "qid", "embedding", k=10)
        by_q = {}
        for r in top.collect():
            by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        assert set(by_q) == set(range(20))
        # exact L2 neighbors via numpy for recall measurement
        all_rows = embs.collect()
        ids = np.array([r["vec_id"] for r in all_rows])
        X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
        recalls = []
        for q in range(20):
            qv = X[ids == q][0]
            d2 = ((X - qv) ** 2).sum(axis=1)
            exact10 = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
            recalls.append(len(exact10 & set(by_q[q])) / 10)
        # synthetic near-uniform embeddings are PQ's worst case (all
        # pairs nearly equidistant): mean recall ~0.45 here vs 0.02
        # chance; gate well above chance without overfitting the seed
        assert sum(recalls) / len(recalls) >= 0.3, recalls
        # the query vector itself (distance 0) must always be retrieved
        for q in range(20):
            assert q in by_q[q]


class TestPCA:
    def test_pca_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from tumult_core_spark.extensions.similarity import pca_fit, pca_project

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        mean, comps, var = pca_fit(embs, "embedding", k=4)
        x = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in embs.collect()]
        )
        np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9)
        cov = np.cov(x, rowvar=False, bias=True)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:4]
        np.testing.assert_allclose(var, w[order], rtol=1e-7)
        for i, col in enumerate(order):
            ev = v[:, col]
            j = int(np.argmax(np.abs(comps[i])))
            if ev[j] < 0:
                ev = -ev
            np.testing.assert_allclose(comps[i], ev, rtol=1e-6, atol=1e-9)
        # variances decreasing, projection reproduces numpy matmul
        assert all(var[i] >= var[i + 1] for i in range(len(var) - 1))
        out = pca_project(embs.limit(50), "embedding", mean, comps)
        got = {r["vec_id"]: np.asarray(r["pca"]) for r in out.collect()}
        for r in embs.limit(50).collect():
            e = (np.asarray(r["embedding"], dtype=np.float64) - mean) @ comps.T
            np.testing.assert_allclose(got[r["vec_id"]], e, rtol=1e-9)

    def test_pca_deterministic_under_repartition(self, spark, sf_dir):
        import numpy as np

        from tumult_core_spark.extensions.similarity import pca_fit

        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = pca_fit(embs, "embedding", k=2)
        b = pca_fit(embs.repartition(16), "embedding", k=2)
        np.testing.assert_allclose(a[0], b[0], rtol=1e-12)
        np.testing.assert_allclose(a[1], b[1], rtol=1e-9)


class TestText:
    def test_token_count(self, spark, docs):
        out = token_count(docs.limit(20), "text")
        rows = out.select("text", "n_tokens").collect()
        for r in rows:
            assert r["n_tokens"] == len(r["text"].split())

    def test_language_id_and_quality(self, spark, docs):
        out = language_id(quality_score(docs.limit(50)))
        rows = out.select("quality", "lang_pred").collect()
        assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
        assert all(r["lang_pred"] is not None for r in rows)

    def test_fingerprint_stability(self, spark, docs):
        out = document_fingerprint(docs.limit(20))
        a = {r["doc_id"]: (r["fingerprint"], r["fingerprint_robust"]) for r in out.collect()}
        b = {r["doc_id"]: (r["fingerprint"], r["fingerprint_robust"]) for r in out.collect()}
        assert a == b

    def test_bigram_logprob_hand_case(self, spark):
        import math

        from tumult_core_spark.extensions.text import bigram_logprob

        # corpus: "a b a b" + "a b c" + "x" (no bigrams)
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
        # V = 4 (a b c x); c(a)=3 c(b)=3 c(c)=1 c(x)=1
        # bigram counts: (a,b)=3 (b,a)=1 (b,c)=1
        V = 4.0
        lp = lambda c2, c1: math.log((c2 + 1.0) / (c1 + V))
        exp1 = (lp(3, 3) + lp(1, 3) + lp(3, 3)) / 3  # a-b, b-a, a-b
        exp2 = (lp(3, 3) + lp(1, 3)) / 2  # a-b, b-c
        assert out[1]["n_bigrams"] == 3
        assert abs(out[1]["avg_logprob"] - exp1) < 1e-9
        assert out[2]["n_bigrams"] == 2
        assert abs(out[2]["avg_logprob"] - exp2) < 1e-9
        assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None

    def test_bpe_train_hand_case(self, spark):
        from tumult_core_spark.extensions.text import bpe_train

        # "low" x5, "lower" x2: first merges follow max-count with
        # lexicographic tie-break on the (a, b) pair
        df = spark.createDataFrame(
            [(1, "low low low low low"), (2, "lower lower")], ["doc_id", "text"]
        )
        merges = bpe_train(df, num_merges=3)
        # pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
        # (e,r)=2, (r,</w>)=2 -> tie (l,o) vs (o,w) -> 'l\x00o' < 'o\x00w'
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")

    def test_bpe_distributed_path_matches_driver(self, spark, docs):
        from tumult_core_spark.extensions.text import bpe_train

        sub = docs.limit(50)
        a = bpe_train(sub, num_merges=8)
        b = bpe_train(sub, num_merges=8, driver_vocab_threshold=0)
        assert a == b and len(a) == 8

    def test_bpe_distributed_reliable_checkpoint(self, spark, docs, tmp_path):
        # the checkpoint_dir opt-in (reliable checkpoint per merge
        # round instead of localCheckpoint) must not change the merges
        from tumult_core_spark.extensions.text import bpe_train

        sub = docs.limit(50)
        a = bpe_train(sub, num_merges=8)
        c = bpe_train(
            sub,
            num_merges=8,
            driver_vocab_threshold=0,
            checkpoint_dir=str(tmp_path / "bpe_ckpt"),
        )
        assert a == c and len(c) == 8

    def test_bpe_encode_roundtrip_and_memo(self, spark, docs):
        from tumult_core_spark.extensions.text import bpe_encode, bpe_train

        sub = docs.limit(30)
        merges = bpe_train(sub, num_merges=12)
        out = bpe_encode(sub, merges=merges)
        texts = {r["doc_id"]: r["text"] for r in sub.collect()}
        for r in out.collect():
            rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
            assert rebuilt == " ".join(texts[r["doc_id"]].lower().split())
            assert r["n_bpe_tokens"] == len(r["bpe_tokens"])

    def test_bpe_exotic_whitespace_and_nul_tokens(self, spark):
        """Train and encode must agree on word boundaries: U+00A0 is
        NOT a separator (Java \\s is ASCII-only), so 'foo\\u00a0bar'
        is ONE word in both.  Tokens containing NUL bytes must not
        break the distributed pair-counting path (struct keys, not
        string packing)."""
        from tumult_core_spark.extensions.text import bpe_encode, bpe_train

        df = spark.createDataFrame(
            [(1, "foo bar foo bar baz"), (2, "a\x00b a\x00b")],
            ["doc_id", "text"],
        )
        m_driver = bpe_train(df, num_merges=5)
        m_dist = bpe_train(df, num_merges=5, driver_vocab_threshold=0)
        assert m_driver == m_dist
        out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges=m_driver).collect()}
        # encode sees the same single word the vocabulary was built on:
        # rebuilding doc 1 yields exactly two ASCII-space-separated words
        rebuilt = "".join(out[1]).replace("</w>", " ").strip()
        assert rebuilt == "foo bar foo bar baz"
        rebuilt2 = "".join(out[2]).replace("</w>", " ").strip()
        assert rebuilt2 == "a\x00b a\x00b"

    def test_repetition_stats_hand_cases(self, spark):
        from tumult_core_spark.extensions.text import repetition_stats

        df = spark.createDataFrame(
            [
                # 3 lines, 'line two' twice; tokens span the newlines
                (0, "a b a b c\nline two\nline two"),
                (1, "x"),          # 1 token: no grams
                (2, ""),           # empty: 1 empty line, no tokens
                (3, "rep rep rep rep rep ... ### hmm"),
                (4, "one two"),    # exactly one bigram, no trigram
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
        r0 = out[0]
        assert r0["n_lines"] == 3
        assert abs(r0["dup_line_frac"] - 1 / 3) < 1e-12
        # 'line two' (8 chars) twice over 9+8+8 line chars
        assert abs(r0["dup_line_char_frac"] - 16 / 25) < 1e-12
        # tokens [a b a b c line two line two]: top bigram 'line two'
        # covers 2*8 of 42 bigram chars
        assert abs(r0["top_bigram_char_frac"] - 16 / 42) < 1e-12
        assert not r0["keep"]
        assert out[1]["top_bigram_char_frac"] == 0.0
        assert out[1]["keep"]
        assert out[2]["n_lines"] == 1 and out[2]["keep"]
        r3 = out[3]
        # 'rep rep' x4 of 8 bigrams -> dup trigram 'rep rep rep' x3 of 7
        assert r3["symbol_word_ratio"] == pytest.approx(4 / 8)
        assert r3["dup_trigram_char_frac"] > 0.3 and not r3["keep"]
        assert out[4]["top_bigram_char_frac"] == 1.0 and not out[4]["keep"]

    def test_tfidf_hand_case(self, spark):
        import math

        from tumult_core_spark.extensions.text import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (0, "apple apple banana"),
                (1, "banana cherry"),
                (2, "cherry cherry cherry durian"),
            ],
            ["doc_id", "text"],
        )
        out = {
            (r["doc_id"], r["term"]): r
            for r in tfidf_top_terms(df, k=10).collect()
        }
        n = 3

        def idf(dfreq):
            return math.log((n + 1) / (dfreq + 1)) + 1.0

        r = out[(0, "apple")]
        assert r["tf"] == 2 and r["df"] == 1
        assert r["score"] == pytest.approx(2 * idf(1))
        assert out[(2, "cherry")]["score"] == pytest.approx(3 * idf(2))
        # banana and cherry both have df=2 and tf=1 in doc 1: equal
        # scores, so the deterministic tie-break (term asc) must hold
        assert out[(1, "banana")]["score"] == out[(1, "cherry")]["score"]

    def test_repetition_stats_vs_python_reference(self, spark):
        """Randomized corpus vs an independent pure-Python computation
        of every signal (different algorithm: per-doc Counters instead
        of the tagged-explode two-aggregation plan)."""
        import random
        from collections import Counter

        from tumult_core_spark.extensions.text import repetition_stats

        rnd = random.Random(42)
        words = ["alpha", "beta", "gamma", "x", "yy", "...", "#tag", "…", "d1"]
        docs = []
        for i in range(60):
            n_lines = rnd.randint(1, 6)
            lines = [
                " ".join(rnd.choices(words, k=rnd.randint(0, 8)))
                for _ in range(n_lines)
            ]
            if rnd.random() < 0.4 and lines:
                lines.append(rnd.choice(lines))  # force duplicate lines
            docs.append((i, "\n".join(lines)))

        def ref(text):
            lines = text.split("\n")
            toks = [t for t in text.lower().split() if t]
            bi = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            tri = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            lc, bc, tc = Counter(lines), Counter(bi), Counter(tri)
            total_lc = sum(len(l) * c for l, c in lc.items())
            out = {
                "n_lines": len(lines),
                "dup_line_frac": (len(lines) - len(lc)) / len(lines),
                "dup_line_char_frac": sum(
                    len(l) * c for l, c in lc.items() if c > 1
                ) / max(total_lc, 1),
            }
            bchars = sum(len(g) * c for g, c in bc.items())
            # Gopher rule: chars of the MOST FREQUENT bigram (argmax
            # by count, ties toward larger coverage), NOT the max of
            # count*chars over all bigrams
            if bc:
                top_chars = max(
                    (c * len(g) for g, c in bc.items()
                     if c == max(bc.values()))
                )
                out["top_bigram_char_frac"] = top_chars / max(bchars, 1)
            else:
                out["top_bigram_char_frac"] = 0.0
            tchars = sum(len(g) * c for g, c in tc.items())
            out["dup_trigram_char_frac"] = (
                sum(len(g) * c for g, c in tc.items() if c > 1)
                / max(tchars, 1) if tc else 0.0
            )
            import re

            out["symbol_word_ratio"] = len(
                re.findall(r"\.{3}|…|#", text)
            ) / max(len(toks), 1)
            return out

        got = {
            r["doc_id"]: r.asDict()
            for r in repetition_stats(
                spark.createDataFrame(docs, ["doc_id", "text"])
            ).collect()
        }
        assert len(got) == 60
        for i, text in docs:
            e = ref(text)
            g = got[i]
            for key, val in e.items():
                assert g[key] == pytest.approx(val, abs=1e-12), (i, key, text)

    def test_chunk_documents(self, spark):
        from tumult_core_spark.extensions.text import chunk_documents

        words = [f"w{i}" for i in range(25)]
        df = spark.createDataFrame(
            [(0, " ".join(words)), (1, "solo"), (2, "")], ["doc_id", "text"]
        )
        out = chunk_documents(df, max_tokens=10, overlap=4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # stride 6: raw starts 0,6,12,18,24 — but the chunk at 18
        # already reaches the 25-token document end, so start 24
        # (whose chunk would be a strict SUBSET of it) is dropped
        c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
        assert len(c0) == 4
        assert c0[0]["chunk_text"].split() == words[0:10]
        assert c0[1]["chunk_text"].split() == words[6:16]  # 4-token overlap
        assert c0[3]["chunk_text"].split() == words[18:]
        assert all(r["chunk_tokens"] == len(r["chunk_text"].split()) for r in c0)
        # no chunk's token span is contained in another's
        spans = []
        start = 0
        for r in c0:
            spans.append((start, start + r["chunk_tokens"]))
            start += 6
        for i, a in enumerate(spans):
            for j, b in enumerate(spans):
                assert i == j or not (b[0] <= a[0] and a[1] <= b[1]), spans
        assert by_doc[1][0]["chunk_text"] == "solo"
        # empty doc still yields one (empty) chunk
        assert by_doc[2][0]["chunk_text"] == "" and by_doc[2][0]["chunk_tokens"] == 0
        with pytest.raises(ValueError):
            chunk_documents(df, max_tokens=5, overlap=5)

    def test_repetition_stats_no_python_udf(self, spark, docs):
        from tumult_core_spark.extensions.text import repetition_stats

        out = repetition_stats(docs.limit(100))
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # both aggregations must partial-aggregate before the shuffle
        assert "partial_count" in plan or "HashAggregate" in plan


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [(i, bytes([i % 256]) * 100) for i in range(20)]
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_metadata_and_features(self, spark, media):
        tagged = attach_media_metadata(media, "payload", "image", "image/png")
        assert "payload_meta" in tagged.columns
        # auto mode: undecodable payloads yield NULL features (unified
        # r14 media contract); fake mode yields the deterministic stub
        auto = extract_image_features(media, "payload", "media_id", dim=16)
        assert auto.filter("features is null").count() == 20
        feats = extract_image_features(
            media, "payload", "media_id", dim=16, decoder="fake"
        )
        rows = feats.collect()
        assert len(rows) == 20
        assert all(len(r["features"]) == 16 for r in rows)
        # deterministic fake features
        again = {r["media_id"]: r["features"] for r in feats.collect()}
        first = {r["media_id"]: r["features"] for r in rows}
        assert first == again

    def test_resize_and_frames(self, spark, media):
        # auto: undecodable -> NULL resized payload and dimensions
        auto = resize_images(media, "payload", "media_id", 224, 224)
        assert auto.filter(
            "resized is null and width is null and height is null"
        ).count() == 20
        resized = resize_images(media, "payload", "media_id", 224, 224,
                                decoder="fake")
        assert resized.filter("width = 224 and height = 224").count() == 20
        # auto keeps the per-payload row cardinality but nulls the frames
        frames = sample_video_frames(media, "payload", "media_id", num_frames=3)
        assert frames.count() == 60
        assert frames.filter("frame is null").count() == 60
        assert frames.select("media_id").distinct().count() == 20
        fake_frames = sample_video_frames(
            media, "payload", "media_id", num_frames=3, decoder="fake"
        )
        assert fake_frames.filter("frame is not null").count() == 60

    def test_audio(self, spark, media):
        # auto: undecodable -> NULL features AND duration (symmetric
        # with image_stats since r14); fake: sha stub, never null
        auto = audio_features(media, "payload", "media_id", dim=8)
        assert auto.filter(
            "features is null and duration_ms is null"
        ).count() == 20
        out = audio_features(media, "payload", "media_id", dim=8, decoder="fake")
        assert out.filter(F.size("features") == 8).count() == 20
        assert out.filter("duration_ms = 100").count() == 20  # payload length

    def test_real_decode_raises(self, spark, media):
        import pytest as _pytest

        # random-bytes payloads are no codec-free format: 'real' raises
        feats = extract_image_features(media, "payload", "media_id", fake=False)
        with _pytest.raises(Exception):
            feats.collect()

    @staticmethod
    def _ppm(w, h, rgb):
        import numpy as np

        img = np.full((h, w, 3), rgb, dtype=np.uint8)
        return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()

    def test_real_ppm_decode_features(self, spark):
        # uncompressed PPM decodes FOR REAL: features reflect pixel
        # content (uniform white -> equal segments; differs from gray)
        import numpy as np

        rows = [(0, bytearray(self._ppm(8, 8, (255, 255, 255)))),
                (1, bytearray(self._ppm(8, 8, (32, 32, 32))))]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        feats = {
            r["media_id"]: r["features"]
            for r in extract_image_features(
                df, "payload", "media_id", dim=4, decoder="real"
            ).collect()
        }
        assert np.allclose(feats[0], [0.5, 0.5, 0.5, 0.5], atol=1e-6)
        assert np.allclose(feats[1], [0.5, 0.5, 0.5, 0.5], atol=1e-6)
        # real decode is content-driven, not hash-driven: identical
        # images with different bytes (comment in header) match
        body = np.full((8, 8, 3), 32, dtype=np.uint8).tobytes()
        with_comment = b"P6\n# c\n8 8\n255\n" + body
        df2 = spark.createDataFrame(
            [(2, bytearray(with_comment))], "media_id long, payload binary"
        )
        f2 = extract_image_features(df2, "payload", "media_id", dim=4, decoder="real")
        assert np.allclose(f2.collect()[0]["features"], feats[1], atol=1e-6)

    def test_codec_swap_in_seam(self, spark):
        """r16: the documented 100 TB bulk-decode story as CONTRACT —
        register_codec swaps a library decoder in without touching any
        operator, and the override genuinely reaches the executor-side
        Arrow UDFs (a module monkeypatch would not: cloudpickle
        serializes module functions by reference and each Python
        worker re-imports the unpatched module)."""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _decode_image_real,
            audio_features,
            register_codec,
            unregister_codec,
        )

        rows = [
            (0, bytearray(self._ppm(8, 8, (255, 255, 255)))),
            (1, bytearray(self._ppm(8, 8, (32, 32, 32)))),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")

        def grab(frame):
            return {
                r["media_id"]: r["features"]
                for r in extract_image_features(
                    frame, "payload", "media_id", dim=4, decoder="real"
                ).collect()
            }

        baseline = grab(df)
        try:
            # 1) a library stand-in with IDENTICAL output: downstream
            # feature rows must be identical — the swap is invisible
            def library_stand_in(payload):
                return _decode_image_real(payload)

            register_codec("image", library_stand_in)
            assert grab(df) == baseline
            # 2) a codec with DIFFERENT output proves the override is
            # actually executing on executors (not silently ignored):
            # every payload — including one no built-in decoder could
            # parse — decodes to the same constant image
            junk = spark.createDataFrame(
                [(7, bytearray(b"\x00not-an-image"))],
                "media_id long, payload binary",
            )

            def const_codec(payload):
                return np.full((4, 4, 3), 200, dtype=np.uint8)

            register_codec("image", const_codec)
            for frame in (df, junk):
                for fid, feats in grab(frame).items():
                    assert np.allclose(feats, [0.5] * 4, atol=1e-6), (fid, feats)
        finally:
            unregister_codec("image")
        assert grab(df) == baseline  # built-in decoder resumed

        try:
            # audio seam: 1-second ramp at 8 kHz for any payload
            def audio_stand_in(payload):
                return np.linspace(-1.0, 1.0, 8000), 8000

            register_codec("audio", audio_stand_in)
            out = audio_features(
                df, "payload", "media_id", dim=4, decoder="real"
            ).collect()
            assert all(r["duration_ms"] == 1000 for r in out)
        finally:
            unregister_codec("audio")

    @staticmethod
    def _y4m(w, h, y_values):
        import numpy as np

        out = [f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode()]
        for v in y_values:
            out.append(b"FRAME\n")
            out.append(np.full((h, w), v, dtype=np.uint8).tobytes())  # Y
            out.append(bytes((w // 2) * (h // 2) * 2))  # U+V planes
        return b"".join(out)

    def test_real_y4m_frame_sampling(self, spark):
        # uncompressed Y4M decodes FOR REAL: evenly spaced frames come
        # back as PGM payloads carrying the true luma content
        from tumult_core_spark.extensions.multimodal import _decode_pnm

        payload = self._y4m(4, 2, [10, 20, 30, 40, 50, 60])
        df = spark.createDataFrame(
            [(0, bytearray(payload))], "media_id long, payload binary"
        )
        rows = sample_video_frames(
            df, "payload", "media_id", num_frames=3, decoder="real"
        ).collect()
        got = {}
        for r in rows:
            img = _decode_pnm(bytes(r["frame"]))
            assert img is not None and img.shape == (2, 4, 1)
            got[r["frame_index"]] = int(img[0, 0, 0])
        # linspace(0, 5, 3).round() -> frames 0, 2, 5
        assert got == {0: 10, 1: 30, 2: 60}
        # compressed container still raises in real mode
        bad = spark.createDataFrame(
            [(1, bytearray(b"\x00\x00\x00 ftypmp42 not a y4m"))],
            "media_id long, payload binary",
        )
        import pytest as _pytest

        with _pytest.raises(Exception):
            sample_video_frames(
                bad, "payload", "media_id", num_frames=2, decoder="real"
            ).collect()

    def test_malformed_pnm_header_auto_falls_back(self, spark):
        # 0xB2 is '²', a Unicode digit: chr(c).isdigit() used to admit
        # it into int() and crash the executor task; a malformed
        # P5/P6-prefixed payload must parse as None and, in auto mode,
        # yield NULL features (r14 unified contract) instead of raising
        from tumult_core_spark.extensions.multimodal import (
            _decode_pnm,
            _fake_features,
            _try_decode,
        )

        bad = b"P5 \xb2\xb2 8 255\n" + b"\x00" * 64
        assert _decode_pnm(bad) is None
        df = spark.createDataFrame(
            [(0, bytearray(bad))], "media_id long, payload binary"
        )
        out = extract_image_features(
            df, "payload", "media_id", dim=4, decoder="auto"
        ).collect()
        assert out[0]["features"] is None
        fake = extract_image_features(
            df, "payload", "media_id", dim=4, decoder="fake"
        ).collect()
        assert fake[0]["features"] == pytest.approx(
            _fake_features(bad, 4).tolist(), abs=1e-6
        )
        # any decoder crash (not just PNM header parsing) falls back in
        # auto mode and propagates in real mode

        def boom(_):
            raise RuntimeError("parse error")

        assert _try_decode(boom, b"x", "auto") is None
        with pytest.raises(RuntimeError):
            _try_decode(boom, b"x", "real")

    def test_real_resize_roundtrip(self, spark):
        from tumult_core_spark.extensions.multimodal import _decode_pnm

        df = spark.createDataFrame(
            [(0, bytearray(self._ppm(8, 6, (10, 200, 30))))],
            "media_id long, payload binary",
        )
        out = resize_images(df, "payload", "media_id", 4, 3, decoder="real").collect()
        img = _decode_pnm(bytes(out[0]["resized"]))
        assert img is not None and img.shape == (3, 4, 3)
        assert (img[0, 0] == [10, 200, 30]).all()

    def test_real_resize_rgba_and_gray_alpha(self, spark):
        """4-channel (RGBA) and 2-channel (gray+alpha) inputs collapse
        to the 3 color planes the P6 output promises — the raw buffer
        previously rode behind the P6 header (RGBA re-decoded as wrong
        RGB pixels; gray+alpha as a short-body corrupt payload)."""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_pnm

        rng = np.random.default_rng(3)
        rgba = rng.integers(0, 256, (6, 5, 4), np.uint8)
        ga = rng.integers(0, 256, (6, 5, 2), np.uint8)
        df = spark.createDataFrame(
            [
                (0, bytearray(self._png(rgba, 6, 1))),
                (1, bytearray(self._png(ga, 4, 1))),
            ],
            "media_id long, payload binary",
        )
        out = {
            r["media_id"]: _decode_pnm(bytes(r["resized"]))
            for r in resize_images(
                df, "payload", "media_id", 5, 6, decoder="real"
            ).collect()
        }
        # identity-size resize: RGBA row 0 equals the RGB planes
        assert out[0] is not None and out[0].shape == (6, 5, 3)
        assert np.array_equal(out[0], rgba[:, :, :3])
        # gray+alpha: gray plane replicated across RGB
        assert out[1] is not None and out[1].shape == (6, 5, 3)
        assert np.array_equal(out[1], np.repeat(ga[:, :, :1], 3, axis=2))

    def test_real_bmp_decode(self):
        import struct

        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_bmp

        # 2x2 24-bit BI_RGB BMP, bottom-up, rows padded to 4 bytes:
        # top row red/green, bottom row blue/white
        def bgr(r, g, b):
            return bytes([b, g, r])

        row_top = bgr(255, 0, 0) + bgr(0, 255, 0) + b"\x00\x00"
        row_bot = bgr(0, 0, 255) + bgr(255, 255, 255) + b"\x00\x00"
        pixels = row_bot + row_top  # bottom-up storage
        header = (
            b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
        )
        img = _decode_bmp(header + pixels)
        assert img is not None and img.shape == (2, 2, 3)
        assert (img[0, 0] == [255, 0, 0]).all() and (img[0, 1] == [0, 255, 0]).all()
        assert (img[1, 0] == [0, 0, 255]).all() and (img[1, 1] == [255, 255, 255]).all()

    @staticmethod
    def _png(img, color_type, filter_type=0, palette=None, bit_depth=8,
             interlace=0):
        """Independent test-side PNG ENCODER: forward-filters scanlines
        per the spec and deflates with zlib — the decoder under test
        must invert it exactly."""
        import struct
        import zlib

        import numpy as np

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        flat = img.reshape(h, w * ch).astype(np.int32)
        bpp = ch
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            cur = flat[y]
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            if filter_type == 0:
                out = cur
            elif filter_type == 1:
                out = cur - left
            elif filter_type == 2:
                out = cur - prev
            elif filter_type == 3:
                out = cur - ((left + prev) >> 1)
            elif filter_type == 4:
                p = left + prev - upleft
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                out = cur - pred
            raw.append(filter_type)
            raw.extend((out % 256).astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
        parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
        if palette is not None:
            parts.append(chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
        parts.append(chunk(b"IDAT", zlib.compress(bytes(raw))))
        parts.append(chunk(b"IEND", b""))
        return b"".join(parts)

    def test_real_png_roundtrip_all_filters(self):
        # every scanline filter type must invert exactly on random data
        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_png

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
        for ft in range(5):
            got = _decode_png(self._png(img, color_type=2, filter_type=ft))
            assert got.shape == (11, 9, 3), ft
            assert (got == img).all(), f"filter {ft} did not invert"

    def test_real_png_color_types(self):
        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_png

        rng = np.random.default_rng(11)
        gray = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
        assert (_decode_png(self._png(gray, 0, 4))[:, :, 0] == gray).all()
        ga = rng.integers(0, 256, size=(5, 7, 2), dtype=np.uint8)
        assert (_decode_png(self._png(ga, 4, 2)) == ga).all()
        rgba = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
        assert (_decode_png(self._png(rgba, 6, 1)) == rgba).all()
        # palette: indices resolve through PLTE to RGB
        palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(6, 4), dtype=np.uint8)
        got = _decode_png(self._png(idx, 3, 0, palette=palette))
        assert (got == palette[idx]).all()

    def test_real_png_unsupported_variants_raise(self):
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.multimodal import _decode_png

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        with _pytest.raises(ValueError, match="bit depth"):
            _decode_png(self._png(img, 2, 0, bit_depth=16))
        with _pytest.raises(ValueError, match="interlaced"):
            _decode_png(self._png(img, 2, 0, interlace=1))
        assert _decode_png(b"not a png") is None

    def test_truncated_png_raises_value_error_not_struct_error(self):
        """A chunk whose declared length overruns the payload must hit
        the module's ValueError contract, not struct.error from a
        short IHDR slice."""
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.multimodal import (
            _PNG_SIG,
            _decode_png,
            _encode_png,
        )

        img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
        good = _encode_png(img, filter_type=0)
        # cut mid-chunk: the IHDR chunk's declared length now overruns
        truncated = good[: len(_PNG_SIG) + 10]
        with _pytest.raises(ValueError, match="truncated PNG"):
            _decode_png(truncated)
        # oversized declared length on an otherwise-complete file
        import struct as _struct

        big_len = _struct.pack(">I", 1 << 24)
        forged = good[: len(_PNG_SIG)] + big_len + good[len(_PNG_SIG) + 4 :]
        with _pytest.raises(ValueError, match="truncated PNG"):
            _decode_png(forged)

    def test_image_stats_fake_mode_is_deterministic_stub(self, spark):
        """fake mode yields sha-derived non-null stub stats (same
        convention as extract_image_features), identical across runs."""
        from tumult_core_spark.extensions.multimodal import image_stats

        df = spark.createDataFrame(
            [(0, bytearray(b"payload-a")), (1, bytearray(b"payload-b"))],
            "doc_id long, payload binary",
        )
        rows1 = sorted(
            image_stats(df, "payload", "doc_id", decoder="fake").collect(),
            key=lambda r: r.doc_id,
        )
        rows2 = sorted(
            image_stats(df, "payload", "doc_id", decoder="fake").collect(),
            key=lambda r: r.doc_id,
        )
        for r1, r2 in zip(rows1, rows2):
            assert r1 == r2
            assert r1["width"] is not None and 1 <= r1["width"] <= 64
            assert r1["channels"] in (1, 3, 4)
            assert 0.0 <= r1["mean_value"] <= 256.0
        # distinct payloads get distinct stubs (sha-derived)
        assert rows1[0] != rows1[1]

    def test_real_png_through_spark_operators(self, spark):
        # PNG payloads decode FOR REAL inside the mapInPandas operators:
        # features are content-driven and resize preserves pixel values
        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_pnm

        img = np.full((8, 8, 3), 32, dtype=np.uint8)
        rows = [
            (0, bytearray(self._png(img, 2, 4))),  # Paeth-filtered PNG
            (1, bytearray(self._ppm(8, 8, (32, 32, 32)))),  # same pixels, PPM
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        feats = {
            r["media_id"]: r["features"]
            for r in extract_image_features(
                df, "payload", "media_id", dim=4, decoder="real"
            ).collect()
        }
        # same pixel content through two different container formats
        assert np.allclose(feats[0], feats[1], atol=1e-6)
        out = resize_images(df, "payload", "media_id", 4, 4, decoder="real").collect()
        for r in out:
            dec = _decode_pnm(bytes(r["resized"]))
            assert dec.shape == (4, 4, 3) and (dec == 32).all()

    def test_synthesize_and_image_stats(self, spark):
        # the codec-validation pair: synthesized payloads are genuine
        # PNGs; image_stats reports true pixel statistics through the
        # real decoder, and the stats equal a direct numpy computation
        # on the same derived pixels (the driver-oracle contract)
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _pixels_from_bytes,
            image_stats,
            synthesize_png_images,
        )

        docs = spark.createDataFrame(
            [(i, f"doc number {i}") for i in range(7)], "doc_id long, text string"
        )
        payloads = synthesize_png_images(docs, "text", "doc_id", height=12, width=9)
        rows = payloads.collect()
        assert all(bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n" for r in rows)
        got = {
            r["doc_id"]: r
            for r in image_stats(payloads, "payload", "doc_id", decoder="real").collect()
        }
        for i in range(7):
            px = _pixels_from_bytes(f"doc number {i}".encode(), 12, 9)
            r = got[i]
            assert (r["width"], r["height"], r["channels"]) == (9, 12, 3)
            assert abs(r["mean_value"] - float(px.mean())) < 1e-9
        # auto mode: an undecodable payload yields null stats, no error
        junk = spark.createDataFrame(
            [(0, bytearray(b"not an image"))], "doc_id long, payload binary"
        )
        r = image_stats(junk, "payload", "doc_id").collect()[0]
        assert r["width"] is None and r["mean_value"] is None

    def test_position_checksum_catches_mean_preserving_defects(self, spark):
        """The pos_checksum the codec driver oracles pin must change
        under pixel permutations that preserve the plain mean (swapped
        scanlines, transposed blocks, channel shuffles) — the exact
        defect class a mean-only oracle would miss — and image_stats
        must report it equal to the a-priori-array computation."""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _pixels_from_bytes,
            _position_checksum,
            image_stats,
            synthesize_png_images,
        )

        px = _pixels_from_bytes(b"checksum probe", 12, 9)
        base = _position_checksum(px)
        swapped_rows = px.copy()
        swapped_rows[[0, 1]] = swapped_rows[[1, 0]]
        transposed = px.transpose(1, 0, 2)
        chan_shuffled = px[:, :, [2, 0, 1]]
        for defect in (swapped_rows, transposed, chan_shuffled):
            assert float(defect.mean()) == float(px.mean())
            assert _position_checksum(defect) != base
        # Spark path reports the same value the fixture side computes
        docs = spark.createDataFrame(
            [(3, "checksum probe")], "doc_id long, text string"
        )
        payloads = synthesize_png_images(docs, "text", "doc_id")
        r = image_stats(
            payloads, "payload", "doc_id", decoder="real", position_checksum=True
        ).collect()[0]
        assert abs(r["pos_checksum"] - base) < 1e-12

    def test_corrupt_corpus_survives_auto_mode(self, spark):
        """The 100 TB contract: a crawl corpus where half the payloads
        are truncated or bit-flipped must flow through image_stats in
        auto mode with ZERO task failures — corrupt rows yield null
        stats, intact rows real stats, and no row is dropped.  (The
        decoders' ValueError-only error contract is what makes this
        hold; an internal IndexError/struct.error would kill the whole
        task set.)"""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            image_stats,
            synthesize_media_payloads,
        )

        docs = spark.createDataFrame(
            [(i, f"crawl doc {i}") for i in range(24)],
            "doc_id long, text string",
        )
        rows = synthesize_media_payloads(docs, "text", "doc_id").collect()
        rng = np.random.default_rng(5)
        corrupted = []
        for r in rows:
            p = bytearray(bytes(r["payload"]))
            if r["doc_id"] % 2 == 0:  # corrupt the even half
                if r["doc_id"] % 4 == 0:
                    p = p[: max(1, int(len(p) * 0.6))]  # truncate
                else:
                    for _ in range(3):
                        p[int(rng.integers(0, len(p)))] ^= 0xFF  # flip
            corrupted.append((r["doc_id"], p))
        df = spark.createDataFrame(corrupted, "doc_id long, payload binary")
        got = {
            x["doc_id"]: x
            for x in image_stats(df, "payload", "doc_id", decoder="auto").collect()
        }
        assert len(got) == 24  # no dropped rows, no task failure
        intact = [i for i in range(24) if i % 2 == 1]
        assert all(got[i]["mean_value"] is not None for i in intact)
        # truncated payloads are never salvaged (structural strictness)
        truncated = [i for i in range(24) if i % 4 == 0]
        assert all(got[i]["mean_value"] is None for i in truncated)

    def test_pos_checksum_modes(self, spark):
        """pos_checksum honors the decoder-mode contract: fake mode
        yields a deterministic non-null stub (pipelines exercise the
        non-null path), auto mode yields null on undecodable payloads."""
        from tumult_core_spark.extensions.multimodal import image_stats

        junk = spark.createDataFrame(
            [(0, bytearray(b"not an image"))], "doc_id long, payload binary"
        )
        fake = image_stats(
            junk, "payload", "doc_id", decoder="fake", position_checksum=True
        ).collect()[0]
        assert fake["pos_checksum"] is not None
        fake2 = image_stats(
            junk, "payload", "doc_id", decoder="fake", position_checksum=True
        ).collect()[0]
        assert fake["pos_checksum"] == fake2["pos_checksum"]
        auto = image_stats(
            junk, "payload", "doc_id", decoder="auto", position_checksum=True
        ).collect()[0]
        assert auto["pos_checksum"] is None

    def test_mixed_synthesizer_payloads_decode_exactly_and_cover_variants(
        self, spark
    ):
        """Every synthesize_media_payloads payload must triage to its
        id%4 format and decode back EXACTLY to the a-priori pixels
        (the same independence the driver oracles use) — and the
        variant cycling must run on id//4, so each format's corpus
        slice covers BOTH entropy modes: sequential AND progressive
        JPEG, interlaced AND non-interlaced GIF, all three TIFF
        compressions.  (Cycling on the raw id would fix the parity per
        format and silently drop whole decoder paths from any corpus —
        and any benchmark — built here.)"""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _block_pixels_from_bytes,
            _decode_gif,
            _decode_png,
            _decode_tiff,
            _gif_test_image_from_bytes,
            _pixels_from_bytes,
            detect_media_format,
            synthesize_media_payloads,
        )
        from tumult_core_spark.extensions.jpeg import _decode_jpeg

        n = 32
        docs = spark.createDataFrame(
            [(i, f"mixed corpus doc {i}") for i in range(n)],
            "doc_id long, text string",
        )
        mixed_df = synthesize_media_payloads(docs, "text", "doc_id")
        mixed = {r["doc_id"]: bytes(r["payload"]) for r in mixed_df.collect()}
        fmts = {
            r["doc_id"]: r["media_format"]
            for r in detect_media_format(mixed_df, "payload").collect()
        }
        expected_fmt = ["png", "jpeg", "gif", "tiff"]
        jpeg_modes, tiff_payload_sizes = set(), set()
        for i in range(n):
            raw = f"mixed corpus doc {i}".encode()
            payload = mixed[i]
            assert fmts[i] == expected_fmt[i % 4], (i, fmts[i])
            if i % 4 == 0:
                dec = _decode_png(payload)
                assert np.array_equal(dec, _pixels_from_bytes(raw, 12, 9)), i
            elif i % 4 == 1:
                dec = _decode_jpeg(payload)
                px = _block_pixels_from_bytes(raw, 2, 3)
                assert np.array_equal(dec.reshape(px.shape), px), i
                jpeg_modes.add(
                    "prog" if b"\xff\xc2" in payload else "seq"
                )
            elif i % 4 == 2:
                dec = _decode_gif(payload)
                idx, pal = _gif_test_image_from_bytes(raw, 16, 21)
                assert np.array_equal(dec, pal[idx]), i
            else:
                dec = _decode_tiff(payload)
                px = _pixels_from_bytes(raw, 10, 14)
                assert np.array_equal(dec.reshape(px.shape), px), i
                tiff_payload_sizes.add(len(payload))
        # variant coverage: both JPEG entropy modes present, and the
        # TIFF slice produced >1 payload size (compression variation)
        assert jpeg_modes == {"seq", "prog"}, jpeg_modes
        assert len(tiff_payload_sizes) > 1, tiff_payload_sizes
        # GIF interlace: decode equality above already exercises the
        # reorder path whenever interlaced rows exist; pin it directly
        from tumult_core_spark.extensions.multimodal import _encode_gif

        raw2 = "mixed corpus doc 2".encode()
        idx2, pal2 = _gif_test_image_from_bytes(raw2, 16, 21)
        assert mixed[2] == _encode_gif(idx2, pal2, interlaced=False)  # j=0
        raw6 = "mixed corpus doc 6".encode()
        idx6, pal6 = _gif_test_image_from_bytes(raw6, 16, 21)
        assert mixed[6] == _encode_gif(idx6, pal6, interlaced=True)  # j=1

    def test_real_wav_decode(self, spark):
        import struct

        import numpy as np

        rate, secs = 8000, 0.5
        n = int(rate * secs)
        x = (np.sin(2 * np.pi * 440 * np.arange(n) / rate) * 20000).astype("<i2")
        data = x.tobytes()
        wav = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        df = spark.createDataFrame([(0, bytearray(wav))], "media_id long, payload binary")
        out = audio_features(df, "payload", "media_id", dim=8, decoder="real").collect()
        assert out[0]["duration_ms"] == 500
        feats = np.array(out[0]["features"])
        # constant-amplitude sine: every RMS window carries equal energy
        assert np.allclose(feats, feats[0], atol=1e-3)


@pytest.mark.slow  # codec round-trip property suite: full lane only
class TestJpegCodec:
    """From-scratch baseline JFIF codec (extensions/jpeg.py): encode
    and decode are independent implementations of the public T.81
    spec's two directions, so round-trip tests exercise both."""

    def test_gray_constant_blocks_quality100_exact(self):
        """All-ones quant tables + constant 8x8 blocks -> only DC
        coefficients -> the decode must reproduce pixels EXACTLY (the
        property the driver oracle pins)."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        rng = np.random.default_rng(42)
        blocks = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        dec = _decode_jpeg(_encode_jpeg(img, quality=100))
        assert dec.shape == (24, 40, 1)
        assert np.array_equal(dec[:, :, 0], img)

    def test_lossy_roundtrip_small_error(self):
        """Smooth content at high quality decodes close to the source
        in every mode: gray, color 4:4:4, color 4:2:0, odd (non-MCU-
        aligned) dimensions."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        xx, yy = np.meshgrid(np.arange(61), np.arange(45))
        gray = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        d = _decode_jpeg(_encode_jpeg(gray, quality=95))
        assert d.shape == (45, 61, 1)
        assert np.abs(d[:, :, 0].astype(int) - gray.astype(int)).mean() < 3.0

        color = np.stack(
            [(xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256], axis=2
        ).astype(np.uint8)
        for sub in ("444", "420", "422", "411"):
            d = _decode_jpeg(_encode_jpeg(color, quality=92, subsampling=sub))
            assert d.shape == (45, 61, 3)
            assert np.abs(d.astype(int) - color.astype(int)).mean() < 6.0, sub

    def test_restart_intervals_resync(self):
        """DRI/RSTn: the decoder must resynchronize at every restart
        marker and reset DC predictors — output identical to the
        no-restart encoding of the same source."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        xx, yy = np.meshgrid(np.arange(64), np.arange(48))
        color = np.stack(
            [(xx * 5) % 256, (yy * 7) % 256, (xx * yy) % 256], axis=2
        ).astype(np.uint8)
        base = _decode_jpeg(_encode_jpeg(color, quality=85))
        for ri in (1, 2, 5):
            with_rst = _decode_jpeg(
                _encode_jpeg(color, quality=85, restart_interval=ri)
            )
            assert np.array_equal(base, with_rst), f"restart_interval={ri}"
        sub = _decode_jpeg(_encode_jpeg(color, quality=85, subsampling="420"))
        sub_rst = _decode_jpeg(
            _encode_jpeg(color, quality=85, subsampling="420", restart_interval=2)
        )
        assert np.array_equal(sub, sub_rst)

    def test_error_contract(self):
        """None for non-JPEG; ValueError for truncation and for the
        unsupported-by-design modes (arithmetic coding)."""
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        assert _decode_jpeg(b"not a jpeg") is None
        img = np.zeros((8, 8), dtype=np.uint8)
        good = _encode_jpeg(img)
        with _pytest.raises(ValueError, match="truncated"):
            _decode_jpeg(good[:30])
        # forge the SOF0 marker into SOF9 (arithmetic-coded sequential)
        arith = bytearray(good)
        idx = bytes(arith).find(b"\xff\xc0")
        arith[idx + 1] = 0xC9
        with _pytest.raises(ValueError, match="arithmetic|unsupported"):
            _decode_jpeg(bytes(arith))

    def test_progressive_decodes_identically_to_baseline(self):
        """SOF2 support: the progressive scan script codes the same
        quantized coefficients as sequential mode, so both encodings
        of one source must decode bit-identically — across grayscale,
        color, 4:4:4 / 4:2:0, restart markers, and a pure-noise image
        (stresses ZRL / EOB / refinement correction-bit paths)."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import _decode_jpeg, _encode_jpeg

        rng = np.random.default_rng(5)
        xx, yy = np.meshgrid(np.arange(61), np.arange(45))
        gray = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        color = np.stack(
            [(xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256], 2
        ).astype(np.uint8)
        noise = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        cases = [(gray, "444"), (color, "444"), (color, "420"),
                 (color, "422"), (color, "411"),
                 (noise, "444"), (noise, "420")]
        for img, sub in cases:
            for ri in (0, 3):
                base = _decode_jpeg(
                    _encode_jpeg(img, 90, sub, ri, progressive=False)
                )
                prog = _decode_jpeg(
                    _encode_jpeg(img, 90, sub, ri, progressive=True)
                )
                assert np.array_equal(base, prog), (img.shape, sub, ri)
        # progressive files carry SOF2 and multiple SOS segments
        payload = _encode_jpeg(color, 90, progressive=True)
        assert b"\xff\xc2" in payload and payload.count(b"\xff\xda") == 10

    def test_eob_run_longer_than_one_block(self):
        """The decoder's EOBn>0 run path (which the encoder never
        emits — standard tables carry no EOBn>0 symbols): hand-build
        a custom AC table plus bitstream where one EOB symbol covers
        several blocks, including buffered correction bits in a
        refinement scan."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import (
            _BitReader,
            _BitWriter,
            _HuffTable,
            _decode_block_ac_first,
            _decode_block_ac_refine,
            _huff_encode_table,
        )

        # canonical table: symbols 0x14 (run 1/size 4) and 0x10 (EOB1)
        bits = [0, 2] + [0] * 14
        vals = [0x14, 0x10]
        dec_tab = _HuffTable(bits, vals)
        enc_tab = _huff_encode_table(bits, vals)

        # --- AC first scan: block0 has coef 9 at k=2, blocks 1-3 empty
        w = _BitWriter()
        code, length = enc_tab[0x14]
        w.write(code, length)      # run=1, size=4
        w.write(9, 4)              # value 9
        code, length = enc_tab[0x10]
        w.write(code, length)      # EOBn n=1
        w.write(1, 1)              # ext bit -> run = 2 + 1 = 3
        reader = _BitReader(w.flush())
        blocks = [np.zeros(64, np.int64) for _ in range(3)]
        # the EOBn read inside block0 ends block0's band AND covers the
        # next run-1 blocks: run=3 -> block0 tail + blocks 1,2
        eobrun = 0
        eobrun = _decode_block_ac_first(reader, blocks[0], dec_tab, 1, 63, 0, eobrun)
        assert blocks[0][2] == 9 and eobrun == 2
        eobrun = _decode_block_ac_first(reader, blocks[1], dec_tab, 1, 63, 0, eobrun)
        assert eobrun == 1
        eobrun = _decode_block_ac_first(reader, blocks[2], dec_tab, 1, 63, 0, eobrun)
        assert eobrun == 0
        assert all(not b[1:].any() for b in blocks[1:])

        # --- AC refinement: EOB run of 2 with correction bits for the
        # history coefficients of BOTH run blocks (positional order)
        b0 = np.zeros(64, np.int64); b0[3] = 4   # history coef, bit 1 below
        b1 = np.zeros(64, np.int64); b1[5] = -4  # history coef, bit 1 below
        w = _BitWriter()
        code, length = enc_tab[0x10]
        w.write(code, length)      # EOBn n=1
        w.write(0, 1)              # ext -> run = 2
        w.write(1, 1)              # correction bit for b0[3] (+p1)
        w.write(1, 1)              # correction bit for b1[5] (-p1)
        reader = _BitReader(w.flush())
        eobrun = 0
        eobrun = _decode_block_ac_refine(reader, b0, dec_tab, 1, 63, 1, eobrun)
        assert eobrun == 1 and b0[3] == 6   # 4 + (1<<1)
        eobrun = _decode_block_ac_refine(reader, b1, dec_tab, 1, 63, 1, eobrun)
        assert eobrun == 0 and b1[5] == -6  # -4 - (1<<1)

    def test_through_spark_operators(self, spark):
        """JPEG payloads decode FOR REAL inside image_stats: the
        synthesized grayscale block images report exact a-priori
        stats through the full mapInPandas path."""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _block_pixels_from_bytes,
            image_stats,
            synthesize_jpeg_images,
        )

        docs = spark.createDataFrame(
            [(i, f"document number {i}") for i in range(6)],
            "doc_id long, text string",
        )
        payloads = synthesize_jpeg_images(docs, "text", "doc_id")
        got = {
            r.doc_id: r
            for r in image_stats(
                payloads, "payload", "doc_id", decoder="real"
            ).collect()
        }
        for i in range(6):
            px = _block_pixels_from_bytes(f"document number {i}".encode(), 2, 3)
            r = got[i]
            assert (r["width"], r["height"], r["channels"]) == (24, 16, 1)
            assert abs(r["mean_value"] - float(px.mean())) < 1e-9


@pytest.mark.slow  # codec round-trip property suite: full lane only
class TestGifAndMjpeg:
    """GIF (from-scratch LZW) and AVI/MJPEG (a JFIF per frame through
    the jpeg module) — the web-corpus formats the image/video ops now
    decode for real."""

    def test_gif_exact_roundtrip(self):
        import numpy as np

        from tumult_core_spark.extensions.multimodal import _decode_gif, _encode_gif

        rng = np.random.default_rng(0)
        pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
        idx = rng.integers(0, 17, size=(23, 31))
        for interlaced in (False, True):
            img = _decode_gif(_encode_gif(idx, pal, interlaced=interlaced))
            assert np.array_equal(img, pal[idx]), interlaced
        # boundary palettes: 2 and 256 colors
        pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        idx2 = np.indices((64, 80)).sum(0) % 2
        assert np.array_equal(_decode_gif(_encode_gif(idx2, pal2)), pal2[idx2])
        pal256 = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        idx256 = rng.integers(0, 256, size=(40, 40))
        assert np.array_equal(_decode_gif(_encode_gif(idx256, pal256)), pal256[idx256])

    def test_gif_error_contract_and_dispatch(self, spark):
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.multimodal import (
            _decode_gif,
            _encode_gif,
            image_stats,
        )

        assert _decode_gif(b"not a gif....") is None
        rng = np.random.default_rng(1)
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        idx = rng.integers(0, 8, size=(16, 16))
        enc = _encode_gif(idx, pal)
        with _pytest.raises(ValueError, match="truncated|bad GIF"):
            _decode_gif(enc[:30])
        # through image_stats in real mode
        df = spark.createDataFrame(
            [(0, bytearray(enc))], "doc_id long, payload binary"
        )
        r = image_stats(df, "payload", "doc_id", decoder="real").collect()[0]
        assert (r["width"], r["height"], r["channels"]) == (16, 16, 3)
        assert abs(r["mean_value"] - float(pal[idx].mean())) < 1e-9

    def test_mjpeg_avi_frame_sampling(self, spark):
        """AVI/MJPEG decodes for real through sample_video_frames:
        grayscale constant-block q100 frames (sequential AND
        progressive) come back pixel-exact as P5."""
        import numpy as np

        from tumult_core_spark.extensions.jpeg import _encode_jpeg
        from tumult_core_spark.extensions.multimodal import (
            _decode_avi_mjpeg,
            _decode_pnm,
            _encode_avi_mjpeg,
            sample_video_frames,
        )

        rng = np.random.default_rng(2)
        imgs = [
            np.repeat(np.repeat(rng.integers(0, 256, (3, 4), dtype=np.uint8), 8, 0), 8, 1)
            for _ in range(6)
        ]
        jpegs = [
            _encode_jpeg(im, quality=100, progressive=bool(i % 2))
            for i, im in enumerate(imgs)
        ]
        avi = _encode_avi_mjpeg(jpegs, 32, 24, fps=5)
        frames = _decode_avi_mjpeg(avi)
        assert len(frames) == 6
        assert all(np.array_equal(f, im) for f, im in zip(frames, imgs))

        df = spark.createDataFrame([(7, bytearray(avi))], "vid long, payload binary")
        out = sample_video_frames(df, "payload", "vid", num_frames=3, decoder="real")
        rows = sorted(out.collect(), key=lambda r: r.frame_index)
        assert len(rows) == 3
        # evenly spaced picks over 6 frames: 0, 2.5->2, 5
        picks = [0, 2, 5]
        for r, p in zip(rows, picks):
            decoded = _decode_pnm(bytes(r.frame))
            assert np.array_equal(decoded[:, :, 0], imgs[p]), p

        import pytest as _pytest

        with _pytest.raises(Exception):
            _decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 16)


@pytest.mark.slow  # codec round-trip property suite: full lane only
class TestTiffCodec:
    """From-scratch TIFF 6.0 strip decoder: lossless, so round-trips
    assert exact pixel equality across compression schemes."""

    def test_exact_roundtrip_every_compression(self):
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _decode_tiff,
            _encode_tiff,
        )

        rng = np.random.default_rng(0)
        xx, yy = np.meshgrid(np.arange(40), np.arange(30))
        cases = {
            "gray": rng.integers(0, 256, (23, 31), np.uint8),
            "rgb": rng.integers(0, 256, (17, 29, 3), np.uint8),
            "rgba": rng.integers(0, 256, (9, 13, 4), np.uint8),
            "smooth": np.stack(
                [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], 2
            ).astype(np.uint8),
        }
        for name, img in cases.items():
            want = img if img.ndim == 3 else img[:, :, np.newaxis]
            for comp in (1, 5, 32773):
                preds = (False, True) if comp == 5 else (False,)
                for pred in preds:
                    dec = _decode_tiff(_encode_tiff(img, comp, predictor=pred))
                    assert np.array_equal(dec, want), (name, comp, pred)

    def test_error_contract_and_spark_path(self, spark):
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.multimodal import (
            _decode_tiff,
            _encode_tiff,
            _pixels_from_bytes,
            image_stats,
            synthesize_tiff_images,
        )

        assert _decode_tiff(b"not tiff") is None
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (8, 8, 3), np.uint8)
        with _pytest.raises(ValueError, match="truncated"):
            _decode_tiff(_encode_tiff(img, 5)[:40])
        # all three compressions through the full Spark plumbing
        docs = spark.createDataFrame(
            [(i, f"scan {i}") for i in range(6)], "doc_id long, text string"
        )
        payloads = synthesize_tiff_images(docs, "text", "doc_id")
        got = {
            r.doc_id: r
            for r in image_stats(
                payloads, "payload", "doc_id", decoder="real"
            ).collect()
        }
        for i in range(6):
            px = _pixels_from_bytes(f"scan {i}".encode(), 10, 14)
            r = got[i]
            assert (r["width"], r["height"], r["channels"]) == (14, 10, 3)
            assert abs(r["mean_value"] - float(px.mean())) < 1e-9


@pytest.mark.slow  # codec round-trip property suite: full lane only
class TestFlacCodec:
    """From-scratch FLAC codec (extensions/flac.py): lossless, so
    every round-trip asserts EXACT sample equality; the decoder also
    verifies frame CRCs and the STREAMINFO MD5 the encoder computed
    over the raw samples (an in-format decode oracle)."""

    def test_exact_roundtrip_all_subframe_types(self):
        import numpy as np

        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac

        rng = np.random.default_rng(0)
        t = np.arange(10000)
        cases = {
            # smooth sine -> fixed predictors + rice residuals
            "sine": (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16),
            # dense noise -> verbatim subframes
            "noise": rng.integers(-32768, 32767, 5000).astype(np.int16),
            # constant -> CONSTANT subframes
            "const": np.full(3000, -123, np.int16),
            # odd length -> short tail block
            "odd": rng.integers(-1000, 1000, 4097).astype(np.int16),
        }
        for name, x in cases.items():
            dec, rate, bps = _decode_flac(_encode_flac(x, 16000, block_size=1024))
            assert rate == 16000 and bps == 16
            assert np.array_equal(dec[:, 0], x.astype(np.int32)), name

    def test_exact_roundtrip_every_stereo_mode(self):
        import numpy as np

        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac

        rng = np.random.default_rng(1)
        t = np.arange(8000)
        st = np.stack(
            [
                (np.sin(2 * np.pi * 330 * t / 16000) * 15000).astype(np.int16),
                (
                    np.sin(2 * np.pi * 440 * t / 16000) * 12000
                    + rng.integers(-50, 50, 8000)
                ).astype(np.int16),
            ],
            axis=1,
        )
        for mode in ("independent", "left_side", "right_side", "mid_side"):
            dec, _, _ = _decode_flac(_encode_flac(st, stereo_mode=mode))
            assert np.array_equal(dec, st.astype(np.int32)), mode

    def test_utf8_coded_number_boundaries(self):
        """The frame-number varint holds 5*nbytes+1 payload bits per
        nbytes-byte coding; values straddling every width boundary must
        round-trip (a past off-by-one corrupted frame numbers >= 2048)."""
        from tumult_core_spark.extensions.flac import (
            _Bits,
            _read_utf8_coded,
            _write_utf8_coded,
        )

        boundaries = [0, 1, 127, 128, 2047, 2048, 16383, 16384, 65535,
                      65536, 262143, 262144, (1 << 21) - 1, 1 << 21,
                      (1 << 26) - 1, 1 << 26, (1 << 31) - 1, 1 << 31,
                      (1 << 36) - 1]
        for v in boundaries:
            enc = _write_utf8_coded(v)
            assert _read_utf8_coded(_Bits(enc)) == v, v
            # lead-byte prefix must stay intact (no payload overflow)
            if len(enc) > 1:
                nbytes = len(enc)
                prefix = (0xFF << (8 - nbytes)) & 0xFF
                assert enc[0] & prefix == prefix and not enc[0] & (0x80 >> nbytes), v

    def test_many_frame_roundtrip(self):
        """>=2048 frames so frame numbers cross the 2-byte varint
        boundary: the encoder's own decoder must accept every header."""
        import numpy as np

        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac

        x = (np.sin(np.arange(2100 * 64) * 0.01) * 9000).astype(np.int16)
        dec, rate, bps = _decode_flac(_encode_flac(x, 16000, block_size=64))
        assert rate == 16000 and bps == 16
        assert np.array_equal(dec[:, 0], x.astype(np.int32))

    def test_error_contract(self):
        import numpy as np
        import pytest as _pytest

        from tumult_core_spark.extensions.flac import _decode_flac, _encode_flac

        assert _decode_flac(b"RIFF not flac") is None
        x = (np.sin(np.arange(6000) * 0.1) * 10000).astype(np.int16)
        enc = _encode_flac(x)
        with _pytest.raises(ValueError, match="truncated"):
            _decode_flac(enc[:100])
        # a flipped bit in frame data trips CRC-16 (or the MD5 check)
        bad = bytearray(enc)
        bad[len(bad) // 2] ^= 0x40
        with _pytest.raises(ValueError, match="CRC|MD5"):
            _decode_flac(bytes(bad))

    def test_through_spark_operators(self, spark):
        """FLAC payloads decode FOR REAL inside audio_features: the
        synthesized streams (mono/stereo, all decorrelation modes)
        report features equal to the a-priori sample math."""
        import numpy as np

        from tumult_core_spark.extensions.multimodal import (
            _audio_samples_from_bytes,
            _segment_pool,
            _unit_norm,
            audio_features,
            synthesize_flac_audio,
        )

        docs = spark.createDataFrame(
            [(i, f"clip number {i}") for i in range(9)],
            "doc_id long, text string",
        )
        payloads = synthesize_flac_audio(docs, "text", "doc_id")
        got = {
            r.doc_id: r
            for r in audio_features(
                payloads, "payload", "doc_id", dim=8, decoder="real"
            ).collect()
        }
        for i in range(9):
            samples = _audio_samples_from_bytes(
                f"clip number {i}".encode(), 4000, bool(i % 2)
            )
            if samples.ndim == 1:
                samples = samples[:, np.newaxis]
            x = samples.astype(np.float64).mean(axis=1) / 32768.0
            expect = _unit_norm(np.sqrt(_segment_pool(x * x, 8)))
            r = got[i]
            assert r["duration_ms"] == 250
            assert np.allclose(np.array(r["features"]), expect, atol=1e-6), i


class TestRollingAndSessions:
    def test_rolling_sum_overflow_guard_per_key(self, spark):
        """The overflow guard bounds per-key SUM(|x|), so many values
        each individually small still trip it before the decimal
        accumulator could silently overflow to NULL."""
        from datetime import datetime, timedelta

        import pytest as _pytest

        from tumult_core_spark.extensions.timeseries import rolling_aggregate

        base = datetime(2024, 1, 1)
        # 4 values of 3e25: each below the old 1e26 per-value bound,
        # but SUM(|x|) = 1.2e26 exceeds the DECIMAL(38,12) capacity
        rows = [
            (i, 1, base + timedelta(seconds=i), 3.0e25) for i in range(4)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        with _pytest.raises(ValueError, match="SUM"):
            rolling_aggregate(df, ["user_id"], "ts", "value", 3600)

        # the same magnitudes split across DIFFERENT keys stay under
        # the per-key bound and succeed
        ok_rows = [
            (i, i, base + timedelta(seconds=i), 3.0e25) for i in range(4)
        ]
        ok = spark.createDataFrame(
            ok_rows, "event_id long, user_id long, ts timestamp, value double"
        )
        out = rolling_aggregate(ok, ["user_id"], "ts", "value", 3600)
        assert out.count() == 4

    def test_rolling_aggregate_hand_case(self, spark):
        from datetime import datetime

        from tumult_core_spark.extensions.timeseries import rolling_aggregate

        rows = [
            (1, 1, datetime(2024, 1, 1, 0, 0, 0), 10.0),
            (2, 1, datetime(2024, 1, 1, 0, 30, 0), 20.0),
            (3, 1, datetime(2024, 1, 1, 1, 15, 0), 5.0),   # 0:15 drops out
            (4, 2, datetime(2024, 1, 1, 0, 45, 0), 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        out = {
            r["event_id"]: (r["rolling_count"], r["rolling_sum"])
            for r in rolling_aggregate(df, ["user_id"], "ts", "value", 3600).collect()
        }
        assert out[1] == (1, 10.0)
        assert out[2] == (2, 30.0)
        assert out[3] == (2, 25.0)  # event 1 fell outside the hour
        assert out[4] == (1, 7.0)

    def test_sessionize_batch_gap_split(self, spark):
        from datetime import datetime

        from tumult_core_spark.extensions.timeseries import sessionize_batch

        rows = [
            (1, 1, datetime(2024, 1, 1, 0, 0, 0)),
            (2, 1, datetime(2024, 1, 1, 0, 20, 0)),
            (3, 1, datetime(2024, 1, 1, 1, 30, 0)),  # > 30 min gap: new session
            (4, 2, datetime(2024, 1, 1, 0, 0, 0)),
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        got = sorted(
            (r["user_id"], r["n_events"])
            for r in sessionize_batch(
                df, "user_id", "ts", 1800, tiebreak_col="event_id"
            ).collect()
        )
        assert got == [(1, 1), (1, 2), (2, 1)]


class TestTimeseries:
    def test_asof_null_pattern_tie_is_deterministic(self, spark):
        """Duplicate right timestamps whose payloads differ only in
        WHICH fields are NULL must tie-break identically under any
        partitioning: Spark hash functions skip NULL inputs, so a
        naive xxhash64 over payload columns would collide (7, NULL)
        with (NULL, 7) and leave the pick partition-dependent — the
        isnull-flag prefix encoding restores distinct hashes."""
        from tumult_core_spark.extensions.timeseries import asof_join

        left = spark.createDataFrame([(1, 100)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 50, 7, None), (1, 50, None, 7)],
            "k long, ts long, a long, b long",
        )
        picks = set()
        for par in (1, 2, 4):
            out = asof_join(
                left, right.repartition(par), ["k"], "ts"
            ).collect()
            assert len(out) == 1
            picks.add((out[0]["r_a"], out[0]["r_b"]))
        assert len(picks) == 1, picks

    @pytest.fixture(scope="class")
    def frames(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 10, 400),
                "ts": rng.integers(0, 50000, 400).astype("datetime64[s]"),
                "lv": rng.normal(size=400).round(3),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 10, 150),
                "ts": rng.integers(0, 50000, 150).astype("datetime64[s]"),
                "rv": rng.normal(size=150).round(3),
            }
        ).drop_duplicates(["k", "ts"])
        return left, right, spark.createDataFrame(left), spark.createDataFrame(right)

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_asof_matches_pandas(self, frames, direction):
        import pandas as pd

        from tumult_core_spark.extensions.timeseries import asof_join

        left, right, L, R = frames
        got = asof_join(L, R, ["k"], "ts", direction=direction).toPandas()
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", direction=direction,
        ).rename(columns={"rv": "r_rv"})
        cols = ["k", "ts", "lv", "r_rv"]
        g = got.sort_values(["k", "ts", "lv"]).reset_index(drop=True)[cols]
        e = exp.sort_values(["k", "ts", "lv"]).reset_index(drop=True)[cols]
        pd.testing.assert_frame_equal(g, e, check_dtype=False)

    def test_asof_tolerance(self, frames):
        import pandas as pd

        from tumult_core_spark.extensions.timeseries import asof_join

        left, right, L, R = frames
        got = asof_join(L, R, ["k"], "ts", tolerance_seconds=1800).toPandas()
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="k", tolerance=pd.Timedelta("1800s"),
        ).rename(columns={"rv": "r_rv"})
        cols = ["k", "ts", "lv", "r_rv"]
        g = got.sort_values(["k", "ts", "lv"]).reset_index(drop=True)[cols]
        e = exp.sort_values(["k", "ts", "lv"]).reset_index(drop=True)[cols]
        pd.testing.assert_frame_equal(g, e, check_dtype=False)

    def test_asof_single_shuffle(self, frames):
        from tumult_core_spark.extensions.timeseries import asof_join

        _, _, L, R = frames
        out = asof_join(L, R, ["k"], "ts")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        # the union of both sides crosses the wire exactly once (each
        # node appears twice in formatted output: tree + detail)
        assert plan.count("Exchange") <= 2
        assert plan.count("hashpartitioning(k") == 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_asof_empty_right_and_collision(self, spark):
        import datetime

        from tumult_core_spark.extensions.timeseries import asof_join

        ts = datetime.datetime(2024, 1, 1)
        L = spark.createDataFrame([(1, ts, 1.0)], "k long, ts timestamp, lv double")
        R = spark.createDataFrame([], "k long, ts timestamp, rv double")
        out = asof_join(L, R, ["k"], "ts").collect()
        assert len(out) == 1 and out[0]["r_rv"] is None and out[0]["r_ts"] is None
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                L.withColumn("r_rv", F.lit(1.0)),
                spark.createDataFrame(
                    [(1, ts, 2.0)], "k long, ts timestamp, rv double"
                ),
                ["k"],
                "ts",
            )

    def test_time_rollup(self, spark, frames):
        from pyspark.sql import functions as F

        from tumult_core_spark.extensions.timeseries import time_rollup

        left, _, L, _ = frames
        out = time_rollup(
            L, "ts", "1 hour", group_cols=["k"],
            agg_exprs={"n": F.count(F.lit(1)), "s": F.round(F.sum("lv"), 6)},
        ).toPandas()
        exp = (
            left.assign(bucket_start=left["ts"].dt.floor("1h"))
            .groupby(["bucket_start", "k"])
            .agg(n=("lv", "size"), s=("lv", "sum"))
            .reset_index()
        )
        exp["s"] = exp["s"].round(6)
        import pandas as pd

        g = out.sort_values(["bucket_start", "k"]).reset_index(drop=True)
        e = exp.sort_values(["bucket_start", "k"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g[["bucket_start", "k", "n", "s"]], e, check_dtype=False
        )


class TestStreaming:
    def test_windowed_counts_available_now(self, spark, sf_dir):
        from tumult_core_spark.streaming import (
            read_stream_parquet,
            windowed_counts,
            write_stream_memory,
        )

        stream = read_stream_parquet(spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"])
        agg = windowed_counts(stream, "ts", "24 hours", "48 hours", ["event_type"])
        q = write_stream_memory(agg, "win_counts", output_mode="complete")
        q.awaitTermination(120)
        from tumult_core_spark.sources import read_parquet
        from tumult_core_spark.sources.io import read_parquet_nanos_ts
        static = read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ["ts"])
        total = static.count()
        got = spark.sql("select sum(count) as s from win_counts").first()["s"]
        assert got == total

    def test_streaming_dedup(self, spark, sf_dir):
        from tumult_core_spark.streaming import (
            read_stream_parquet,
            streaming_dedup,
            write_stream_memory,
        )

        stream = read_stream_parquet(spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"])
        deduped = streaming_dedup(stream, ["user_id"], "ts")
        q = write_stream_memory(deduped, "dedup_events")
        q.awaitTermination(120)
        from tumult_core_spark.sources import read_parquet
        from tumult_core_spark.sources.io import read_parquet_nanos_ts
        static = read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ["ts"])
        n_users = static.select("user_id").distinct().count()
        got = spark.sql("select count(*) as c from dedup_events").first()["c"]
        assert got == n_users


class TestStreamIntervalJoin:
    def test_matches_batch_range_join(self, spark, sf_dir):
        from tumult_core_spark.sources.io import read_parquet_nanos_ts
        from tumult_core_spark.streaming import (
            read_stream_parquet,
            stream_interval_join,
            write_stream_memory,
        )

        def sides(df):
            views = df.filter("event_type = 'view'").select(
                "user_id",
                F.col("ts").alias("view_ts"),
                F.col("event_id").alias("view_id"),
            )
            buys = df.filter("event_type = 'purchase'").select(
                "user_id",
                F.col("ts").alias("buy_ts"),
                F.col("event_id").alias("buy_id"),
            )
            return views, buys

        stream = read_stream_parquet(
            spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
        )
        sv, sb = sides(stream)
        joined = stream_interval_join(
            sv, sb, ["user_id"], "view_ts", "buy_ts", 0, 1800
        )
        q = write_stream_memory(joined, "ivj_out")
        q.awaitTermination(120)
        got = {
            (r["view_id"], r["buy_id"])
            for r in spark.sql("select view_id, buy_id from ivj_out").collect()
        }
        static = read_parquet_nanos_ts(spark, f"{sf_dir}/events.parquet", ["ts"])
        bv, bb = sides(static)
        expect = {
            (r["view_id"], r["buy_id"])
            for r in bv.join(bb, "user_id")
            .filter(
                "buy_ts >= view_ts and buy_ts <= view_ts + interval 1800 seconds"
            )
            .collect()
        }
        assert got == expect and len(expect) > 0

    def test_rejects_colliding_columns(self, spark):
        from tumult_core_spark.streaming import stream_interval_join

        a = spark.createDataFrame([(1, 1)], ["k", "v"])
        b = spark.createDataFrame([(1, 2)], ["k", "v"])
        with pytest.raises(ValueError, match="colliding"):
            stream_interval_join(a, b, ["k"], "t1", "t2")

    def test_join_state_expires_with_watermark(self, spark, tmp_path):
        """r18 review pin: the two-sided event-time bound plus the
        watermark must let Spark EVICT old join state — the property
        that keeps the state store bounded on an unbounded stream.
        Verified through the state-operator metrics: after batches
        whose event times advance far past the interval bound, the
        final state row count reflects only the recent epoch, not the
        whole history."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stream_interval_join,
            write_stream_memory,
        )

        ld, rd = str(tmp_path / "ivj_l"), str(tmp_path / "ivj_r")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(h):
            return t0 + datetime.timedelta(hours=h)

        # three epochs 100 h apart: epoch-0 state (20 rows/side) is
        # expired long before epoch 200 processes (bound 600 s,
        # watermark 1 h)
        epochs = [(0, 20), (100, 2), (200, 2)]
        for h, n in epochs:
            spark.createDataFrame(
                [(k, ts(h)) for k in range(n)], "k long, lts timestamp"
            ).coalesce(1).write.mode("append").parquet(ld)
            spark.createDataFrame(
                [(k, ts(h)) for k in range(n)], "k long, rts timestamp"
            ).coalesce(1).write.mode("append").parquet(rd)
            _time.sleep(1.05)

        joined = stream_interval_join(
            read_stream_parquet(spark, ld, max_files_per_trigger=1),
            read_stream_parquet(spark, rd, max_files_per_trigger=1),
            ["k"], "lts", "rts", 0, 600,
        )
        q = write_stream_memory(joined, "ivj_state_out")
        q.awaitTermination(180)
        # correctness: same-epoch same-key pairs only
        assert spark.table("ivj_state_out").count() == sum(n for _, n in epochs)
        state_totals = [
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in (p.get("stateOperators") or [])
        ]
        assert state_totals, "no state-operator metrics recorded"
        # peak state saw the big epoch; final state only the recent one
        assert max(state_totals) >= 40
        assert state_totals[-1] < 10, state_totals


class TestStreamingNearDedup:
    def test_near_identical_docs_collapse(self, spark, tmp_path):
        """Exact duplicates and small-edit near-duplicates (same min
        shingle) collapse to one survivor; distinct docs survive."""
        import pandas as pd

        from tumult_core_spark.streaming import write_stream_memory
        from tumult_core_spark.streaming.ops import streaming_near_dedup

        base = "aaaa unique shingle body text that is long enough to matter"
        rows = [
            (0, base, "2024-01-01 00:00:00"),
            (1, base, "2024-01-01 00:05:00"),                    # exact dup
            (2, base + " trailing boilerplate", "2024-01-01 00:10:00"),  # near dup
            (3, "zzzz completely different document body", "2024-01-01 00:15:00"),
        ]
        src = str(tmp_path / "docs")
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text", "ts"]).assign(
                ts=lambda d: pd.to_datetime(d["ts"])
            )
        ).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .parquet(src)
        )
        out = streaming_near_dedup(stream, "text", "ts")
        q = write_stream_memory(out, "near_dedup")
        q.awaitTermination(120)
        got = sorted(
            r["doc_id"] for r in spark.sql("select doc_id from near_dedup").collect()
        )
        # one survivor per distinct robust fingerprint (static expectation)
        from tumult_core_spark.extensions.text import document_fingerprint

        static = document_fingerprint(spark.read.parquet(src), "text")
        expected = static.select("fingerprint_robust").distinct().count()
        assert len(got) == expected
        # the exact-duplicate pair (0, 1) always collapses; the distinct
        # doc 3 always survives
        assert 3 in got and not {0, 1} <= set(got)


class TestStatefulStreaming:
    def test_stateful_sessionize_gap_and_timeout(self, spark, tmp_path):
        """applyInPandasWithState sessionization: a later event closes
        the open session (gap split across micro-batches), and a key
        with no further events is flushed by the EVENT-TIME TIMEOUT
        when the watermark passes last+gap."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stateful_sessionize,
            write_stream_memory,
        )

        d = str(tmp_path / "events_in")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        schema = "user long, ts timestamp"
        batches = [
            [(1, ts(0)), (1, ts(10)), (1, ts(20)), (2, ts(0))],
            [(1, ts(1000))],   # closes user 1's first session by gap
            [(3, ts(2000))],   # advances the watermark -> user 2 times out
        ]
        for b in batches:  # distinct mtimes => deterministic batch order
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.05)

        stream = read_stream_parquet(spark, d, max_files_per_trigger=1)
        sess = stateful_sessionize(
            stream, "user", "ts", gap="100 seconds", watermark="10 seconds"
        )
        q = write_stream_memory(sess, "stateful_sessions", output_mode="append")
        q.awaitTermination(120)
        rows = {
            (
                r["user"],
                int((r["session_start"] - t0).total_seconds()),
                int((r["session_end"] - t0).total_seconds()),
                r["n_events"],
            )
            for r in spark.table("stateful_sessions").collect()
        }
        # user 1's first session: closed by the ts=1000 event (gap
        # split across batches); user 2: closed by event-time timeout;
        # user 1's second session: closed by timeout once the final
        # watermark (1990s) passes 1000+gap.  user 3 (timeout 2100s)
        # stays open and is correctly NOT emitted.
        assert rows == {(1, 0, 20, 3), (2, 0, 0, 1), (1, 1000, 1000, 1)}

    def test_stateful_sessionize_never_closes_before_watermark(
        self, spark, tmp_path
    ):
        """Regression: a gap-split used to emit the earlier interval
        as CLOSED immediately, so an in-watermark late event that
        bridged into it tore one true session into several irrevocable
        append-mode rows.  A session may only close once the watermark
        passes end+gap; a late event inside the watermark must merge
        into the still-open interval."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stateful_sessionize,
            write_stream_memory,
        )

        d = str(tmp_path / "tear_in")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        schema = "user long, ts timestamp"
        # batch 1: two gap-separated events (0s and 1000s, gap 100s);
        # batch 2: a LATE event at 50s (watermark after batch 1 is
        # 1000-3600 < 0, so it is valid) that extends the first
        # interval; batch 3: watermark pusher
        batches = [
            [(1, ts(0)), (1, ts(1000))],
            [(1, ts(50))],
            [(9, ts(20000))],
        ]
        for b in batches:
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.05)

        stream = read_stream_parquet(spark, d, max_files_per_trigger=1)
        sess = stateful_sessionize(
            stream, "user", "ts", gap="100 seconds", watermark="1 hour"
        )
        q = write_stream_memory(sess, "tear_sessions", output_mode="append")
        q.awaitTermination(120)
        rows = {
            (
                r["user"],
                int((r["session_start"] - t0).total_seconds()),
                int((r["session_end"] - t0).total_seconds()),
                r["n_events"],
            )
            for r in spark.table("tear_sessions").collect()
        }
        # ONE session [0, 50] with 2 events — never a torn [0,0,1] +
        # [50,50,1] pair — plus the 1000s singleton
        assert rows == {(1, 0, 50, 2), (1, 1000, 1000, 1)}, rows

    def test_stateful_sessionize_string_users_and_null_drop(
        self, spark, tmp_path
    ):
        """The user key keeps its input type: string ids must stay
        distinct (a long cast used to collapse them all into one null
        group, merging every user's timeline), and NULL users are
        dropped rather than sessionized."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stateful_sessionize,
            write_stream_memory,
        )

        d = str(tmp_path / "strusers_in")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        schema = "user string, ts timestamp"
        batches = [
            [("alice", ts(0)), ("alice", ts(30)), ("bob", ts(10)), (None, ts(20))],
            [("wm", ts(20000))],  # watermark pusher
        ]
        for b in batches:
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.05)

        stream = read_stream_parquet(spark, d, max_files_per_trigger=1)
        sess = stateful_sessionize(
            stream, "user", "ts", gap="100 seconds", watermark="1 hour"
        )
        q = write_stream_memory(sess, "str_sessions", output_mode="append")
        q.awaitTermination(120)
        rows = {
            (
                r["user"],
                int((r["session_start"] - t0).total_seconds()),
                int((r["session_end"] - t0).total_seconds()),
                r["n_events"],
            )
            for r in spark.table("str_sessions").collect()
        }
        assert rows == {("alice", 0, 30, 2), ("bob", 10, 10, 1)}, rows

    def test_stateful_sessionize_out_of_order_batch(self, spark, tmp_path):
        """An out-of-order event (earlier than the stored session's
        last event but inside the watermark) must MERGE into the open
        session — extending session_start downward, never regressing
        `last`/session_end or falsely gap-splitting the session."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stateful_sessionize,
            write_stream_memory,
        )

        d = str(tmp_path / "events_ooo")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        schema = "user long, ts timestamp"
        batches = [
            [(1, ts(100)), (1, ts(150))],
            [(1, ts(60))],     # late but within the 1000s watermark
            [(3, ts(3000))],   # advances watermark -> user 1 times out
        ]
        for b in batches:  # distinct mtimes => deterministic batch order
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.05)

        stream = read_stream_parquet(spark, d, max_files_per_trigger=1)
        sess = stateful_sessionize(
            stream, "user", "ts", gap="100 seconds", watermark="1000 seconds"
        )
        q = write_stream_memory(sess, "stateful_sessions_ooo", output_mode="append")
        q.awaitTermination(120)
        rows = {
            (
                r["user"],
                int((r["session_start"] - t0).total_seconds()),
                int((r["session_end"] - t0).total_seconds()),
                r["n_events"],
            )
            for r in spark.table("stateful_sessions_ooo").collect()
        }
        # one merged session [60, 150] with 3 events; a fold that
        # overwrote `last` with 60 would have emitted (1, 100, 60, 3)
        assert rows == {(1, 60, 150, 3)}


class TestStreamingFileSink:
    def test_parquet_sink_exactly_once_on_restart(self, spark, tmp_path):
        """The file sink + checkpoint pair must be exactly-once: a
        second run over the same source with the same checkpoint adds
        NOTHING (offsets committed), and new source files are picked up
        incrementally without re-emitting old batches."""
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            write_stream_parquet,
        )

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.range(100).coalesce(1).write.parquet(src)

        def drain():
            q = write_stream_parquet(
                read_stream_parquet(spark, src), out, ckpt
            )
            q.awaitTermination(120)

        drain()
        assert spark.read.parquet(out).count() == 100
        # restart with the same checkpoint: no duplication
        drain()
        assert spark.read.parquet(out).count() == 100
        # a new source file arrives: only the delta is appended
        _time.sleep(1.05)  # distinct mtime for deterministic pickup
        spark.range(100, 130).coalesce(1).write.mode("append").parquet(src)
        drain()
        got = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert got == list(range(130))


class TestStreamingDP:
    def test_dp_windowed_counts(self, spark, sf_dir):
        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import dp_windowed_counts

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = read_stream_parquet(
            spark, f"{sf_dir}/events.parquet", nanos_ts_cols=["ts"]
        )
        collected = []

        def sink(pdf, batch_id):
            collected.append(pdf)

        event_types = ["click", "error", "purchase", "signup", "view"]
        start = dp_windowed_counts(
            stream, "ts", epsilon_per_window=1.0,
            window_duration="24 hours", watermark="0 seconds",
            group_cols=["event_type"], public_group_keys=event_types,
        )
        q = start(sink, output_mode="complete")
        q.awaitTermination(180)
        import pandas as pd

        out = pd.concat(collected, ignore_index=True)
        static = spark.read.parquet(f"{sf_dir}/events.parquet")
        # noisy totals close to the true total; column contract holds
        assert set(["window_start", "window_end", "event_type", "noisy_count"]) <= set(out.columns)
        true_total = static.count()
        assert abs(out["noisy_count"].sum() - true_total) < 100
        # the release support is the public grid: every window carries
        # every public key exactly once
        per_window = out.groupby(["window_start"])["event_type"].apply(
            lambda s: sorted(s)
        )
        assert all(v == event_types for v in per_window)

    def test_dp_windowed_counts_accounting(self, spark, tmp_path):
        """Privacy accounting of the streaming DP counts (see
        LIMITATIONS.md "Streaming DP counts"): tumbling windows
        partition events into disjoint cells — verified on a crafted
        3-window stream where every event lands in exactly one emitted
        window — so event-level spend parallel-composes to one
        epsilon_per_window while user-level spend is k * epsilon."""
        import datetime as dt

        import pandas as pd

        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import (
            dp_windowed_counts,
            dp_windowed_counts_privacy,
        )

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        # 3 tumbling 1-hour windows: 5, 7, 11 events; one straddler at
        # an exact window boundary belongs to the LATER window only
        rows = (
            [(base + dt.timedelta(minutes=m), "u1") for m in (0, 10, 20, 30, 40)]
            + [(base + dt.timedelta(minutes=60 + m), "u1")
               for m in (0, 5, 15, 25, 35, 45, 55)]
            + [(base + dt.timedelta(minutes=120 + m), "u2")
               for m in (0, 4, 8, 12, 16, 20, 24, 28, 32, 36, 40)]
        )
        src = str(tmp_path / "dp_acct_src")
        spark.createDataFrame(rows, "ts timestamp, user string").coalesce(
            1
        ).write.parquet(src)

        collected = []

        def sink(pdf, batch_id):
            collected.append(pdf)

        stream = read_stream_parquet(spark, src, nanos_ts_cols=["ts"])
        start = dp_windowed_counts(
            stream, "ts", epsilon_per_window=float("inf"),
            window_duration="1 hour", watermark="0 seconds",
        )
        q = start(sink, output_mode="complete")
        q.awaitTermination(120)
        out = pd.concat(collected, ignore_index=True)
        got = {
            r["window_start"].to_pydatetime(): int(r["noisy_count"])
            for _, r in out.iterrows()
        }
        # disjoint partition: each event in exactly one window, counts
        # exact at epsilon=inf (noise scale 0)
        assert got == {
            base: 5,
            base + dt.timedelta(hours=1): 7,
            base + dt.timedelta(hours=2): 11,
        }
        assert sum(got.values()) == len(rows)

        # the accounting contract the disjointness licenses
        k = len(got)
        assert dp_windowed_counts_privacy(0.5, k, "event") == 0.5
        assert dp_windowed_counts_privacy(0.5, k, "user") == 0.5 * k
        assert dp_windowed_counts_privacy(0.5, 0, "event") == 0.0
        with pytest.raises(ValueError, match="neighboring"):
            dp_windowed_counts_privacy(0.5, k, "row")


class TestR18StreamingReview:
    """Pins from the r18 adversarial review of the streaming DP/state
    surface: grouped DP counts must have a PUBLIC release support
    (the batch GroupBy public-keys hazard, streaming edition), and
    stateful_sessionize uses half-open session semantics so the
    close rule is tear-free at the exact-gap boundary."""

    def test_grouped_release_requires_public_keys(self, spark, tmp_path):
        """group_cols without public_group_keys releases data-dependent
        group presence (infinite loss for a singleton group) — a hard
        error unless explicitly acknowledged."""
        import datetime as dt

        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import dp_windowed_counts

        src = str(tmp_path / "dp_groups_src")
        spark.createDataFrame(
            [(dt.datetime(2026, 1, 1), "a")], "ts timestamp, g string"
        ).write.parquet(src)
        stream = read_stream_parquet(spark, src, nanos_ts_cols=["ts"])
        with pytest.raises(ValueError, match="public_group_keys"):
            dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0, group_cols=["g"]
            )
        # explicit acknowledgment or a key list constructs fine
        dp_windowed_counts(
            stream, "ts", epsilon_per_window=1.0, group_cols=["g"],
            allow_data_dependent_groups=True,
        )
        dp_windowed_counts(
            stream, "ts", epsilon_per_window=1.0, group_cols=["g"],
            public_group_keys=["a", "b"],
        )
        # key validation: arity, NULLs, duplicates, keys-without-groups
        with pytest.raises(ValueError, match="values"):
            dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0, group_cols=["g"],
                public_group_keys=[("a", "x")],
            )
        with pytest.raises(ValueError, match="NULL"):
            dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0, group_cols=["g"],
                public_group_keys=["a", None],
            )
        with pytest.raises(ValueError, match="duplicates"):
            dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0, group_cols=["g"],
                public_group_keys=["a", "a"],
            )
        with pytest.raises(ValueError, match="group_cols is empty"):
            dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0,
                public_group_keys=["a"],
            )

    def test_public_grid_zero_fills_and_drops_nonpublic(self, spark, tmp_path):
        """With public keys the release is EXACTLY (emitted windows) x
        (public keys): absent cells come back as noised zeros (exact 0
        at epsilon=inf) and rows for non-public keys are dropped,
        never disclosed."""
        import datetime as dt

        import pandas as pd

        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import dp_windowed_counts

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        rows = [
            # window 0: 3 "a" events and a NON-public "z" event
            (base + dt.timedelta(minutes=m), g)
            for m, g in [(0, "a"), (10, "a"), (20, "a"), (30, "z")]
        ] + [
            # window 1: only "b" events — "a" must 0-fill
            (base + dt.timedelta(minutes=60 + m), "b") for m in (0, 10)
        ]
        src = str(tmp_path / "dp_grid_src")
        spark.createDataFrame(rows, "ts timestamp, g string").coalesce(
            1
        ).write.parquet(src)
        collected = []
        stream = read_stream_parquet(spark, src, nanos_ts_cols=["ts"])
        start = dp_windowed_counts(
            stream, "ts", epsilon_per_window=float("inf"),
            window_duration="1 hour", watermark="0 seconds",
            group_cols=["g"], public_group_keys=["a", "b"],
        )
        q = start(lambda pdf, bid: collected.append(pdf), output_mode="complete")
        q.awaitTermination(120)
        out = pd.concat(collected, ignore_index=True)
        got = {
            (r["window_start"].to_pydatetime(), r["g"]): int(r["noisy_count"])
            for _, r in out.iterrows()
        }
        w0, w1 = base, base + dt.timedelta(hours=1)
        assert got == {
            (w0, "a"): 3,
            (w0, "b"): 0,   # 0-filled absent cell
            (w1, "a"): 0,   # 0-filled absent cell
            (w1, "b"): 2,
        }
        assert "z" not in set(out["g"])  # non-public key never released

    def test_append_checkpoint_rerun_releases_nothing_new(self, spark, tmp_path):
        """r18 review pin (exactly-once across runs): a second
        start(append) over the same checkpoint re-releases NOTHING —
        previously released windows are never re-noised — and new data
        later releases only newly closed windows."""
        import datetime as dt
        import time as _time

        import pandas as pd

        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import dp_windowed_counts

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        src = str(tmp_path / "dp_rerun_src")
        ckpt = str(tmp_path / "dp_rerun_ckpt")
        base = dt.datetime(2026, 1, 1)

        def write_file(rows):
            spark.createDataFrame(rows, "ts timestamp").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            _time.sleep(1.05)

        write_file([(base + dt.timedelta(minutes=m),) for m in (0, 5, 10)])
        write_file([(base + dt.timedelta(hours=2),)])

        def drain():
            got = []
            stream = read_stream_parquet(
                spark, src, nanos_ts_cols=["ts"], max_files_per_trigger=1
            )
            start = dp_windowed_counts(
                stream, "ts", epsilon_per_window=1.0,
                window_duration="1 hour", watermark="0 seconds",
            )
            q = start(
                lambda pdf, bid: got.append(pdf),
                output_mode="append", checkpoint_location=ckpt,
            )
            q.awaitTermination(120)
            parts = [p for p in got if len(p)]
            return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()

        out1 = drain()
        # run 1 closed exactly the 0h window (the 2h window stays open)
        assert len(out1) == 1
        assert out1["window_start"].iloc[0].to_pydatetime() == base
        # run 2, same checkpoint, same source: NOTHING re-released
        out2 = drain()
        assert len(out2) == 0, out2
        # new data advances the watermark: only the newly closed 2h
        # window releases; the 0h window is not re-noised/re-released
        write_file([(base + dt.timedelta(hours=4),)])
        out3 = drain()
        assert len(out3) == 1
        assert out3["window_start"].iloc[0].to_pydatetime() == base + dt.timedelta(
            hours=2
        )

    def test_sessionize_half_open_gap_boundary(self, spark, tmp_path):
        """An event at EXACTLY last+gap starts a new session (half-open
        [start, last+gap) semantics, matching the built-in
        session_window) — in both the in-batch split and the
        state-merge path.  This is what makes the close rule tear-free:
        a closed session can never be extended by a still-admissible
        event."""
        import datetime
        import time as _time

        from tumult_core_spark.streaming.ops import (
            read_stream_parquet,
            stateful_sessionize,
            write_stream_memory,
        )

        d = str(tmp_path / "halfopen_in")
        t0 = datetime.datetime(2024, 1, 1)

        def ts(s):
            return t0 + datetime.timedelta(seconds=s)

        schema = "user long, ts timestamp"
        batches = [
            # in-batch boundary: 0 and 100 with gap=100 -> two sessions
            [(1, ts(0)), (1, ts(100))],
            # state-merge boundary: 200 is exactly 100 after 100
            [(1, ts(200)), (1, ts(210))],
            [(9, ts(20000))],  # watermark pusher closes everything
        ]
        for b in batches:
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _time.sleep(1.05)

        stream = read_stream_parquet(spark, d, max_files_per_trigger=1)
        sess = stateful_sessionize(
            stream, "user", "ts", gap="100 seconds", watermark="1 hour"
        )
        q = write_stream_memory(sess, "halfopen_sessions", output_mode="append")
        q.awaitTermination(120)
        rows = {
            (
                r["user"],
                int((r["session_start"] - t0).total_seconds()),
                int((r["session_end"] - t0).total_seconds()),
                r["n_events"],
            )
            for r in spark.table("halfopen_sessions").collect()
        }
        assert rows == {
            (1, 0, 0, 1),
            (1, 100, 100, 1),
            (1, 200, 210, 2),
        }, rows


class TestReviewRegressions:
    """Pinned behaviors from the r14 adversarial review of
    timeseries/sketches/semistructured/packing."""

    def test_asof_match_is_atomic_and_null_correct(self, spark):
        from tumult_core_spark.extensions.timeseries import asof_join

        L = spark.createDataFrame([(1, 30.0)], "k long, ts double")
        R = spark.createDataFrame(
            [(1, 10.0, 5.0, 9.0), (1, 20.0, None, 7.0)],
            "k long, ts double, a double, b double",
        )
        # the matched row is carried atomically: the true match's NULL
        # field must NOT be backfilled from an older right row
        row = asof_join(L, R, ["k"], "ts").collect()[0]
        assert (row.r_ts, row.r_a, row.r_b) == (20.0, None, 7.0), row
        # NULL right timestamps are never candidates
        R2 = spark.createDataFrame([(1, None, 7.0)], "k long, ts double, v double")
        row = asof_join(L, R2, ["k"], "ts").collect()[0]
        assert row.r_ts is None and row.r_v is None
        # NULL left timestamps never match (forward direction was the
        # hazard: desc NULLS LAST had seen every right row)
        L2 = spark.createDataFrame([(1, None)], "k long, ts double")
        R3 = spark.createDataFrame([(1, 10.0, 3.0)], "k long, ts double, v double")
        row = asof_join(L2, R3, ["k"], "ts", direction="forward").collect()[0]
        assert row.r_ts is None and row.r_v is None

    def test_asof_map_payload_and_ntz_tolerance(self, spark):
        import datetime

        from tumult_core_spark.extensions.timeseries import asof_join

        L = spark.createDataFrame([(1, 30.0)], "k long, ts double")
        # an unorderable (map) payload column must not break the join
        R = spark.createDataFrame(
            [(1, 10.0, {"x": "y"})], "k long, ts double, attrs map<string,string>"
        )
        row = asof_join(L, R, ["k"], "ts").collect()[0]
        assert row.r_attrs == {"x": "y"}
        # tolerance on TIMESTAMP_NTZ (what Spark 4 loads from parquet)
        Lt = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1, 0, 1, 0))], "k long, ts timestamp_ntz"
        )
        Rt = spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1), 5.0)],
            "k long, ts timestamp_ntz, v double",
        )
        assert asof_join(Lt, Rt, ["k"], "ts", tolerance_seconds=120).collect()[0].r_v == 5.0
        assert asof_join(Lt, Rt, ["k"], "ts", tolerance_seconds=30).collect()[0].r_v is None

    def test_hll_rollup_nonstring_group_and_quantile_null_group(self, spark):
        from tumult_core_spark.extensions.sketches import (
            approx_quantiles,
            hll_rollup,
        )

        df = spark.createDataFrame([(1, "u1"), (1, "u2"), (2, "u1")], "g long, u string")
        rows = {r.g: r.approx_distinct for r in hll_rollup(df, "u", ["g"]).collect()}
        # BIGINT group columns cast to string so the total row unions
        # cleanly (ANSI mode threw CAST_INVALID_INPUT before)
        assert rows == {"1": 2, "2": 1, "__all__": 2}, rows
        # preserve_types mode: BIGINT keys stay BIGINT (join-back-able);
        # the total row is NULL-keyed and flagged via is_total
        typed = hll_rollup(df, "u", ["g"], preserve_types=True)
        assert dict(typed.dtypes)["g"] == "bigint"
        trows = typed.collect()
        per = {r.g: r.approx_distinct for r in trows if not r.is_total}
        assert per == {1: 2, 2: 1}
        tot = [r for r in trows if r.is_total]
        assert len(tot) == 1 and tot[0].g is None and tot[0].approx_distinct == 2
        df2 = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", None)], "g string, v double"
        )
        out = approx_quantiles(df2, "v", [0.5], group_cols=["g"]).collect()
        assert {r.g for r in out} == {"a", "b"}  # all-NULL group kept
        assert [r for r in out if r.g == "b"][0][2] is None

    def test_json_guards(self, spark):
        from tumult_core_spark.extensions.semistructured import (
            extract_json_fields,
            infer_json_schema,
        )

        df = spark.createDataFrame([(1, '{"a":2}')], "a long, j string")
        with pytest.raises(ValueError, match="collide"):
            extract_json_fields(df, "j", {"a": ("$.a", "long")})
        df2 = spark.createDataFrame([('{"a": 1}',), ("not json",)], "j string")
        assert [f.name for f in infer_json_schema(df2, "j").fields] == ["a"]
        with pytest.raises(ValueError, match="malformed"):
            infer_json_schema(spark.createDataFrame([("nope",)], "j string"), "j")

    def test_pack_sequences_null_and_negative_ids(self, spark):
        """NULL ids are dropped (an id-less row has no addressable
        (id -> bin) assignment and used to crash the int64 conversion);
        negative ids land in a pmod bucket within [0, num_buckets)."""
        from tumult_core_spark.extensions.packing import pack_sequences

        df = spark.createDataFrame(
            [(-5, 100), (None, 100), (3, 100)], "doc_id long, n long"
        )
        out = pack_sequences(df, "doc_id", "n", window=4096, num_buckets=32)
        rows = out.collect()
        assert {r.doc_id for r in rows} == {-5, 3}
        assert all(0 <= r.bucket < 32 for r in rows), rows

    def test_pack_sequences_clamps_bad_sizes(self, spark):
        from tumult_core_spark.extensions.packing import pack_sequences

        df = spark.createDataFrame(
            [(1, 4000), (2, -3000), (3, 4000), (4, None)], "doc_id long, n long"
        )
        out = pack_sequences(df, "doc_id", "n", window=4096, num_buckets=1)
        bins = {r.doc_id: r.bin for r in out.collect()}
        # a negative size must not decrement the fill: doc3 cannot
        # share doc1's bin (4000 + 4000 > 4096)
        assert bins[3] != bins[1], bins


class TestSemistructured:
    def test_extract_json_fields_typed_and_missing(self, spark):
        from tumult_core_spark.extensions.semistructured import (
            extract_json_fields,
        )

        df = spark.createDataFrame(
            [
                (1, '{"k": 7, "tag": "a", "nested": {"x": 1.5}}'),
                (2, '{"k": "12", "nested": {}}'),   # numeric string casts
                (3, 'not json at all'),
                (4, None),
            ],
            "id long, props string",
        )
        out = extract_json_fields(
            df, "props",
            {
                "k": ("$.k", "long"),
                "tag": "$.tag",
                "x": ("$.nested.x", "double"),
            },
        ).orderBy("id")
        rows = [tuple(r) for r in out.collect()]
        assert rows == [
            (1, 7, "a", 1.5),
            (2, 12, None, None),
            (3, None, None, None),
            (4, None, None, None),
        ]
        assert "props" not in out.columns  # dropped unless keep_json

    def test_flatten_json_parses_once_with_schema(self, spark):
        from tumult_core_spark.extensions.semistructured import flatten_json

        df = spark.createDataFrame(
            [(1, '{"a": 3, "b": "hi"}'), (2, '{"a": null}'), (3, "broken")],
            "id long, j string",
        )
        out = flatten_json(df, "j", "a long, b string").orderBy("id")
        assert [tuple(r) for r in out.collect()] == [
            (1, 3, "hi"), (2, None, None), (3, None, None),
        ]
        with pytest.raises(ValueError, match="collide"):
            flatten_json(df, "j", "id long, b string")

    def test_infer_json_schema_bounded_sample(self, spark):
        from tumult_core_spark.extensions.semistructured import (
            infer_json_schema,
        )

        df = spark.createDataFrame(
            [(f'{{"k": {i}, "s": "v{i}"}}',) for i in range(50)]
            + [(None,)],
            "props string",
        )
        schema = infer_json_schema(df, "props", sample_rows=10)
        assert {f.name for f in schema.fields} == {"k", "s"}

    def test_json_array_explode_outer(self, spark):
        from tumult_core_spark.extensions.semistructured import (
            json_array_explode,
        )

        df = spark.createDataFrame(
            [
                (1, '[{"t": "a", "n": 1}, {"t": "b", "n": 2}]'),
                (2, "[]"),
                (3, None),
            ],
            "id long, calls string",
        )
        out = json_array_explode(df, "calls", "t string, n long").orderBy("id")
        rows = [(r["id"], None if r["element"] is None else tuple(r["element"]))
                for r in out.collect()]
        assert rows == [(1, ("a", 1)), (1, ("b", 2)), (2, None), (3, None)]
        # out_col colliding with an existing column fails loudly, same
        # contract as extract_json_fields / flatten_json
        with pytest.raises(ValueError, match="collides"):
            json_array_explode(df, "calls", "t string", out_col="id")

    def test_extract_is_pure_catalyst(self, spark):
        """No Python in the plan: extraction must stay in codegen."""
        from tumult_core_spark.extensions.semistructured import (
            extract_json_fields,
        )

        df = spark.createDataFrame([(1, '{"k": 2}')], "id long, props string")
        out = extract_json_fields(df, "props", {"k": ("$.k", "long")})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestEmptyInputs:
    """Every extension op must handle 0-row input cleanly: relational
    ops return an empty result with the right schema; fit-style ops
    raise a clear ValueError — never an index error or a Py4J crash.
    At corpus scale an empty filter result is routine, and an op that
    crashes on it takes the whole pipeline down."""

    @pytest.fixture()
    def empty_docs(self, spark):
        return spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, n_chars long"
        )

    @pytest.fixture()
    def empty_embs(self, spark):
        return spark.createDataFrame(
            [], "vec_id long, embedding array<double>, label int"
        )

    @pytest.fixture()
    def empty_events(self, spark):
        return spark.createDataFrame(
            [], "event_id long, user_id long, ts timestamp, value double,"
            " event_type string"
        )

    def test_relational_ops_return_empty(
        self, spark, empty_docs, empty_embs, empty_events
    ):
        from pyspark.sql import functions as F

        from tumult_core_spark.extensions import (
            components,
            dedup,
            packing,
            sampling,
            similarity,
            text,
            timeseries,
        )

        edges = spark.createDataFrame([], "id_a long, id_b long")
        cases = {
            "exact_dedup": lambda: dedup.exact_dedup(empty_docs, ["text"]),
            "minhash_pairs": lambda: dedup.minhash_lsh_candidate_pairs(
                empty_docs, "doc_id", "text", 16, 4
            ),
            "dedup_paragraphs": lambda: dedup.dedup_paragraphs(empty_docs),
            "decontaminate": lambda: dedup.decontaminate(
                empty_docs, empty_docs, "doc_id", "text"
            ),
            "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
                empty_docs, "doc_id", "text"
            ),
            "fuzzy_join": lambda: dedup.fuzzy_join_edit1(
                empty_docs.select("doc_id", "text"),
                empty_docs.select(
                    F.col("doc_id").alias("rid"), F.col("text").alias("rtext")
                ),
                "text", "rtext", "doc_id", "rid",
            ),
            "connected_components": lambda: components.connected_components(
                edges
            ),
            "embedding_near_dups": lambda: similarity.embedding_near_duplicates(
                empty_embs, "vec_id", "embedding"
            ),
            "token_count": lambda: text.token_count(empty_docs),
            "repetition_stats": lambda: text.repetition_stats(empty_docs),
            "tfidf": lambda: text.tfidf_top_terms(empty_docs, k=2),
            "unigram_logprob": lambda: text.unigram_logprob(empty_docs),
            "chunk_documents": lambda: text.chunk_documents(
                empty_docs, max_tokens=10, overlap=2
            ),
            "pack_sequences": lambda: packing.pack_sequences(
                text.chunk_documents(empty_docs, max_tokens=10, overlap=2),
                "doc_id", "chunk_tokens", 100,
            ),
            "hash_split": lambda: sampling.hash_split(
                empty_docs, "doc_id", [("a", 0.5), ("b", 0.5)], seed=1
            ),
            "stratified_sample": lambda: sampling.stratified_sample(
                empty_docs, "lang", "doc_id", 10, seed=1
            ),
            "temperature_mix": lambda: sampling.temperature_mix(
                empty_docs, "source", "doc_id", temperature=2.0
            ),
            "asof_join": lambda: timeseries.asof_join(
                empty_events.select("event_id", "user_id", "ts"),
                empty_events.select(
                    "user_id", "ts", F.col("value").alias("v")
                ),
                ["user_id"], "ts",
            ),
            "rolling_aggregate": lambda: timeseries.rolling_aggregate(
                empty_events, ["user_id"], "ts", "value", 60
            ),
            "sessionize_batch": lambda: timeseries.sessionize_batch(
                empty_events, "user_id", "ts"
            ),
            "time_rollup": lambda: timeseries.time_rollup(
                empty_events, "ts", "1 hour"
            ),
        }
        failures = []
        for name, fn in cases.items():
            try:
                assert fn().count() == 0
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{name}: {type(exc).__name__}: {exc}")
        assert not failures, "\n".join(failures)

    def test_fit_ops_raise_clearly(self, spark, empty_docs, empty_embs):
        from pyspark.sql import functions as F

        from tumult_core_spark.extensions import similarity

        for name, fn in {
            "pca_fit": lambda: similarity.pca_fit(empty_embs, "embedding", k=2),
            "sq_fit": lambda: similarity.sq_fit(empty_embs, "embedding"),
            "pq_fit": lambda: similarity.pq_fit(empty_embs, "embedding"),
            "kmeans_centroids": lambda: similarity.kmeans_centroids(
                empty_embs, "embedding", 2
            ),
            "brute_force_knn": lambda: similarity.brute_force_knn(
                empty_embs,
                empty_embs.select(F.col("vec_id").alias("qid"), "embedding"),
                "vec_id", "qid", "embedding", k=3,
            ),
        }.items():
            with pytest.raises(ValueError):
                fn()

    def test_bpe_train_empty_returns_no_merges(self, spark, empty_docs):
        from tumult_core_spark.extensions.text import bpe_train

        assert bpe_train(empty_docs, num_merges=5) == []

    def test_null_vectors_in_knn(self, spark):
        """NULL corpus vectors are dropped (IsNotNull pushed to the
        scan) instead of crashing the BLAS batch; NULL query vectors
        raise a clear error."""
        from pyspark.sql import functions as F

        from tumult_core_spark.extensions.similarity import brute_force_knn

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(9, [1.0, 0.0])], "qid long, embedding array<double>"
        )
        out = brute_force_knn(corpus, q, "vec_id", "qid", "embedding", k=2)
        rows = [(r["vec_id"], r["rank"]) for r in out.orderBy("rank").collect()]
        assert rows == [(1, 1), (3, 2)]  # null row simply absent

        bad_q = spark.createDataFrame(
            [(9, None)], "qid long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="NULL"):
            brute_force_knn(corpus, bad_q, "vec_id", "qid", "embedding", k=2)

    def test_null_vectors_in_ivf(self, spark):
        """ivf_knn drops NULL vectors on both sides: they can't become
        centroids or occupy top-k slots with NULL scores."""
        from tumult_core_spark.extensions.similarity import ivf_knn

        corpus = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(1, 9)] + [(99, None)],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame(
            [(1, [8.0, 1.0]), (2, None)], "qid long, embedding array<double>"
        )
        out = ivf_knn(
            corpus, q, "vec_id", "qid", "embedding",
            k=3, num_centroids=2, nprobe=2,
        )
        rows = out.collect()
        assert all(r["vec_id"] != 99 for r in rows)
        assert all(r["qid"] == 1 for r in rows)  # null query dropped
        assert all(r["score"] is not None for r in rows)


class TestNormalizeText:
    def test_catalyst_only_path(self, spark):
        from tumult_core_spark.extensions.text import normalize_text

        df = spark.createDataFrame(
            [(1, "  Hello   WORLD \t x "), (2, None), (3, "AB\n\nCD")],
            "doc_id long, text string",
        )
        out = normalize_text(df, "text")
        rows = {r["doc_id"]: r["text"] for r in out.collect()}
        assert rows == {1: "hello world x", 2: None, 3: "ab cd"}
        # no Python in the default plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_unicode_forms(self, spark):
        import unicodedata

        from tumult_core_spark.extensions.text import normalize_text

        decomposed = "école"       # e + combining acute
        composed = "école"           # precomposed
        compat = "ﬁle ①"        # fi-ligature, circled one
        df = spark.createDataFrame(
            [(1, decomposed), (2, compat), (3, None)], "doc_id long, text string"
        )
        nfc = {
            r["doc_id"]: r["text"]
            for r in normalize_text(
                df, "text", unicode_form="NFC", lowercase=False,
                collapse_whitespace=False, strip=False,
            ).collect()
        }
        assert nfc[1] == composed
        assert nfc[3] is None
        nfkc = {
            r["doc_id"]: r["text"]
            for r in normalize_text(
                df, "text", unicode_form="NFKC", lowercase=False,
                collapse_whitespace=False, strip=False,
            ).collect()
        }
        assert nfkc[2] == unicodedata.normalize("NFKC", compat)
        with pytest.raises(ValueError, match="unicode_form"):
            normalize_text(df, "text", unicode_form="NFX")

    def test_normalized_variants_collide_for_dedup(self, spark):
        """The point of the op: case/whitespace/encoding variants of
        one document hash identically after normalization."""
        from tumult_core_spark.extensions.dedup import exact_dedup
        from tumult_core_spark.extensions.text import normalize_text

        df = spark.createDataFrame(
            [
                (1, "The  Quick\tBrown Fox"),
                (2, "the quick brown fox"),
                (3, "THE QUICK  BROWN FOX  "),
                (4, "a different document"),
            ],
            "doc_id long, text string",
        )
        norm = normalize_text(df, "text")
        assert exact_dedup(norm, ["text"]).count() == 2

    def test_new_ops_empty_inputs(self, spark):
        """normalize_text and the JSON ops on 0-row input."""
        from tumult_core_spark.extensions.semistructured import (
            extract_json_fields,
            flatten_json,
            infer_json_schema,
            json_array_explode,
        )
        from tumult_core_spark.extensions.text import normalize_text

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert normalize_text(empty, "text").count() == 0
        assert normalize_text(empty, "text", unicode_form="NFKC").count() == 0
        ej = spark.createDataFrame([], "id long, j string")
        assert extract_json_fields(ej, "j", {"k": ("$.k", "long")}).count() == 0
        assert flatten_json(ej, "j", "a long").count() == 0
        assert json_array_explode(ej, "j", "a long").count() == 0
        with pytest.raises(ValueError, match="[Nn]o non-null"):
            infer_json_schema(ej, "j")


class TestEmbeddingOutliers:
    def test_hand_case_centroid_distance(self, spark):
        from tumult_core_spark.extensions.similarity import embedding_outliers

        df = spark.createDataFrame(
            [
                (1, [0.0, 0.0], "a"),
                (2, [2.0, 0.0], "a"),
                (3, [1.0, 4.0], "a"),  # centroid a = (1, 4/3)
                (4, [5.0, 5.0], "b"),  # centroid b = itself -> dist 0
            ],
            "id long, v array<double>, g string",
        )
        got = {
            r["id"]: round(r["centroid_dist"], 6)
            for r in embedding_outliers(df, "id", "v", "g").collect()
        }
        c = (1.0, 4.0 / 3.0)
        import math

        want = {
            1: round(math.hypot(0 - c[0], 0 - c[1]), 6),
            2: round(math.hypot(2 - c[0], 0 - c[1]), 6),
            3: round(math.hypot(1 - c[0], 4 - c[1]), 6),
            4: 0.0,
        }
        assert got == want

    def test_top_k_keeps_farthest_with_deterministic_ties(self, spark):
        from tumult_core_spark.extensions.similarity import embedding_outliers

        df = spark.createDataFrame(
            [(i, [float(i), 0.0], "a") for i in range(5)],
            "id long, v array<double>, g string",
        )
        out = embedding_outliers(df, "id", "v", "g", top_k=2).collect()
        # centroid x = 2.0; farthest are ids 0 and 4 (dist 2), ties
        # would break by ascending id
        assert sorted(r["id"] for r in out) == [0, 4]

    def test_plan_single_corpus_scan_broadcast_join(self, spark, sf_dir):
        from tumult_core_spark.extensions.similarity import embedding_outliers

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = embedding_outliers(emb, "vec_id", "embedding", "label")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        import re

        # centroids come from the same cached scan node or a second
        # scan of the source; the corpus-distance side must join them
        # via broadcast with no Python evaluation anywhere
        assert "BroadcastHashJoin" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "partial_avg" in plan or "partial_" in plan, plan


class TestPageRank:
    def test_ranks_sum_to_one_and_star_concentrates(self, spark):
        from tumult_core_spark.extensions.components import pagerank

        # star: center 0 linked to 1..8
        df = spark.createDataFrame(
            [(0, i) for i in range(1, 9)], "id_a long, id_b long"
        )
        rows = pagerank(df, iterations=10).collect()
        total = sum(r["rank"] for r in rows)
        assert abs(total - 1.0) < 1e-9
        ranks = {r["node"]: r["rank"] for r in rows}
        assert ranks[0] > max(v for k, v in ranks.items() if k != 0) * 3
        # leaves are symmetric
        leaf = [v for k, v in ranks.items() if k != 0]
        assert max(leaf) - min(leaf) < 1e-12

    def test_partitioning_invariance(self, spark):
        import random

        from tumult_core_spark.extensions.components import pagerank

        rnd = random.Random(3)
        edges = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(120)]
        edges = [(a, b) for a, b in edges if a != b]
        df1 = spark.createDataFrame(edges, "id_a long, id_b long")
        df8 = df1.repartition(8)
        r1 = {r["node"]: round(r["rank"], 9) for r in pagerank(df1).collect()}
        r8 = {r["node"]: round(r["rank"], 9) for r in pagerank(df8).collect()}
        assert r1 == r8

    def test_directed_dangling_mass_documented(self, spark):
        from tumult_core_spark.extensions.components import pagerank

        # 0 -> 1: node 1 is dangling in directed mode; its mass is
        # dropped (documented simplification), so ranks sum to < 1
        df = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        rows = pagerank(df, iterations=3, undirected=False).collect()
        total = sum(r["rank"] for r in rows)
        assert 0 < total < 1.0

    def test_reliable_checkpoint_matches_local(self, spark, tmp_path):
        from tumult_core_spark.extensions.components import pagerank

        df = spark.createDataFrame(
            [(i, (i + 1) % 12) for i in range(12)], "id_a long, id_b long"
        )
        a = {r["node"]: round(r["rank"], 12) for r in pagerank(df).collect()}
        b = {
            r["node"]: round(r["rank"], 12)
            for r in pagerank(df, checkpoint_dir=str(tmp_path / "pr")).collect()
        }
        assert a == b

    def test_empty_edges(self, spark):
        from tumult_core_spark.extensions.components import pagerank

        df = spark.createDataFrame([], "id_a long, id_b long")
        assert pagerank(df).count() == 0


class TestHllSketches:
    def test_rollup_union_equals_direct_global(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import hll_distinct, hll_rollup

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        roll = hll_rollup(ev, "user_id", ["event_type"])
        union_total = [
            r["approx_distinct"]
            for r in roll.collect()
            if r["event_type"] == "__all__"
        ][0]
        direct = hll_distinct(ev, "user_id").first()["approx_distinct"]
        # lossless merge: the union of per-group sketches is
        # BIT-IDENTICAL to sketching the whole corpus directly
        assert union_total == direct

    def test_estimates_within_error_bound(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import hll_rollup
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        roll = {
            r["event_type"]: r["approx_distinct"]
            for r in hll_rollup(ev, "user_id", ["event_type"]).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        exact["__all__"] = ev.select("user_id").distinct().count()
        for k, n in exact.items():
            assert abs(roll[k] - n) <= max(2, 0.02 * n), (k, roll[k], n)

    def test_determinism_across_partitionings(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import hll_distinct

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        a = hll_distinct(ev, "user_id").first()["approx_distinct"]
        b = hll_distinct(ev.repartition(16), "user_id").first()["approx_distinct"]
        assert a == b

    def test_rollup_requires_groups(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import hll_rollup

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        with pytest.raises(ValueError, match="group_cols"):
            hll_rollup(ev, "user_id", [])


class TestApproxQuantiles:
    def test_rank_error_bound_vs_exact(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import approx_quantiles

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        probs = [0.1, 0.5, 0.9]
        acc = 1000
        out = approx_quantiles(
            ev, "value", probs, accuracy=acc, group_cols=["event_type"]
        ).collect()
        assert len(out) == 3 * ev.select("event_type").distinct().count()
        vals = {}
        for r in ev.select("event_type", "value").collect():
            vals.setdefault(r["event_type"], []).append(r["value"])
        for r in out:
            v = sorted(vals[r["event_type"]])
            n = len(v)
            est = r["approx_quantile"]
            rank_lt = sum(1 for x in v if x < est) / n
            rank_le = sum(1 for x in v if x <= est) / n
            eps = 1.0 / acc + 1.0 / n
            assert rank_lt <= r["prob"] + eps and rank_le >= r["prob"] - eps, r

    def test_rank_contract_holds_under_repartitioning(self, spark, sf_dir):
        # the merged GK summary is partitioning-DEPENDENT (estimates
        # can move within the rank window when partition boundaries
        # change), so the invariant pinned here is the CONTRACT, not
        # bit-stability: any partitioning's estimate satisfies the
        # rank bound; the same plan rerun is stable
        from tumult_core_spark.extensions.sketches import approx_quantiles

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        v = sorted(r["value"] for r in ev.select("value").collect())
        n = len(v)
        eps = 1.0 / 500 + 1.0 / n
        for frame in (ev, ev.repartition(16)):
            est = approx_quantiles(frame, "value", [0.5], 500).first()[
                "approx_quantile"
            ]
            rank_lt = sum(1 for x in v if x < est) / n
            rank_le = sum(1 for x in v if x <= est) / n
            assert rank_lt <= 0.5 + eps and rank_le >= 0.5 - eps
        a = approx_quantiles(ev, "value", [0.5], 500).first()
        b = approx_quantiles(ev, "value", [0.5], 500).first()
        assert a == b

    def test_ungrouped_long_form(self, spark, sf_dir):
        from tumult_core_spark.extensions.sketches import approx_quantiles

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = approx_quantiles(ev, "value", [0.25, 0.75]).collect()
        assert [r["prob"] for r in out] == [0.25, 0.75]
        assert out[0]["approx_quantile"] <= out[1]["approx_quantile"]


class TestR16AdviceFixes:
    """Pins for the four r15 ADVICE items fixed in r16: reserved-name
    guards in the dedup helpers, verified (not trusted)
    index_precapped, per-batch cache cleanup in the incremental dedup
    path, and the streaming DP checkpoint hard-fail."""

    def test_exact_dedup_reserved_name_rejected(self, spark):
        from tumult_core_spark.extensions.dedup import exact_dedup

        df = spark.createDataFrame([(1, "a", "x")], "k long, v string, __rest string")
        with pytest.raises(ValueError, match="__rest"):
            exact_dedup(df, ["k"])

    def test_cap_hot_buckets_reserved_name_rejected(self, spark):
        from tumult_core_spark.extensions.dedup import cap_hot_buckets

        df = spark.createDataFrame([(1, "b", 2)], "id long, b string, __rn long")
        with pytest.raises(ValueError, match="__rn"):
            cap_hot_buckets(df, ["b"], "id", cap=10)

    def test_index_precapped_is_verified_not_trusted(self, spark, docs, tmp_path):
        """index_precapped=True with an index built WITHOUT
        max_band_bucket must raise instead of silently skipping the
        re-cap; a capped index carries the stamp — including through a
        parquet round-trip — and is accepted."""
        from tumult_core_spark.extensions.dedup import (
            _PRECAPPED_META_KEY,
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(30).select("doc_id", "text")
        batch = corpus.filter("doc_id < 5").withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
        uncapped = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        with pytest.raises(ValueError, match=_PRECAPPED_META_KEY):
            minhash_lsh_cross_pairs(
                batch, uncapped, "doc_id", "text", 32, 8, index_precapped=True
            )
        capped = minhash_band_index(
            corpus, "doc_id", "text", 32, 8, max_band_bucket=16
        )
        assert capped.schema["band_key"].metadata[_PRECAPPED_META_KEY] == 16
        # the stamp survives the write-once / join-many index pattern
        path = str(tmp_path / "band_index")
        capped.write.parquet(path)
        reloaded = spark.read.parquet(path)
        assert reloaded.schema["band_key"].metadata[_PRECAPPED_META_KEY] == 16
        pairs = minhash_lsh_cross_pairs(
            batch, reloaded, "doc_id", "text", 32, 8, index_precapped=True
        )
        found = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
        assert {(i + 5_000_000, i) for i in range(5)} <= found

    def test_cross_pairs_does_not_accumulate_caches(self, spark, docs):
        """The incremental per-batch path unpersists its intermediates
        once the batch result is materialized: repeated batches must
        not grow the persistent-RDD map (pre-fix: +3 cached relations
        per batch for the session's lifetime)."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(30).select("doc_id", "text")
        index = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        jsc = spark.sparkContext._jsc.sc()

        def n_cached():
            return jsc.getPersistentRDDs().size()

        results = []
        before = n_cached()
        for b in range(2):
            batch = corpus.filter("doc_id < 5").withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000 * (b + 1))
            )
            out = minhash_lsh_cross_pairs(batch, index, "doc_id", "text", 32, 8)
            results.append(out)  # hold the results alive, like a real session
            assert out.count() >= 5
        # only the (eagerly checkpointed) RESULTS may remain cached —
        # one per live batch result, never the per-batch intermediates
        assert n_cached() <= before + len(results)

    def test_streaming_append_without_checkpoint_hard_fails(self, spark, tmp_path):
        """append-mode DP counts without a checkpoint re-noise every
        window on a re-run (spend multiplies) — a hard error unless the
        caller explicitly acknowledges single-run semantics."""
        import datetime as dt

        from tumult_core_spark.streaming import read_stream_parquet
        from tumult_core_spark.streaming.ops import dp_windowed_counts

        src = str(tmp_path / "dp_hardfail_src")
        spark.createDataFrame(
            [(dt.datetime(2026, 1, 1), "u")], "ts timestamp, user string"
        ).write.parquet(src)
        stream = read_stream_parquet(spark, src, nanos_ts_cols=["ts"])
        start = dp_windowed_counts(
            stream, "ts", epsilon_per_window=1.0,
            window_duration="1 hour", watermark="0 seconds",
        )
        with pytest.raises(ValueError, match="allow_rerun_renoise"):
            start(lambda pdf, bid: None, output_mode="append")


class TestR17AdviceFixes:
    """Pins for the r16 ADVICE items fixed in r17: the precap stamp's
    VALUE is compared against max_band_bucket (not just presence), and
    the incremental dedup path offers a lazy return for
    dynamic-allocation environments where localCheckpoint blocks are
    unreliable."""

    def test_index_precapped_value_compared_not_just_present(self, spark, docs):
        """An index capped at a LARGER bucket size than this call's
        max_band_bucket partially reintroduces the quadratic
        hot-bucket join — the stamp's value must be <= the argument."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(30).select("doc_id", "text")
        batch = corpus.filter("doc_id < 5").withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
        loosely_capped = minhash_band_index(
            corpus, "doc_id", "text", 32, 8, max_band_bucket=500
        )
        with pytest.raises(ValueError, match="capped at 500"):
            minhash_lsh_cross_pairs(
                batch, loosely_capped, "doc_id", "text", 32, 8,
                max_band_bucket=16, index_precapped=True,
            )
        # tighter-or-equal stamp is accepted
        tightly_capped = minhash_band_index(
            corpus, "doc_id", "text", 32, 8, max_band_bucket=16
        )
        pairs = minhash_lsh_cross_pairs(
            batch, tightly_capped, "doc_id", "text", 32, 8,
            max_band_bucket=16, index_precapped=True,
        )
        found = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
        assert {(i + 5_000_000, i) for i in range(5)} <= found

    def test_cross_pairs_lazy_return_matches_eager(self, spark, docs):
        """eager_checkpoint=False returns a lazily-composable plan (no
        localCheckpoint lineage cut) with identical pairs — the
        fallback for reliable-execution-required environments."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(30).select("doc_id", "text")
        index = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        batch = corpus.filter("doc_id < 5").withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
        eager = minhash_lsh_cross_pairs(batch, index, "doc_id", "text", 32, 8)
        lazy = minhash_lsh_cross_pairs(
            batch, index, "doc_id", "text", 32, 8, eager_checkpoint=False
        )
        got_eager = {(r["new_id"], r["corpus_id"]) for r in eager.collect()}
        got_lazy = {(r["new_id"], r["corpus_id"]) for r in lazy.collect()}
        assert got_lazy == got_eager and len(got_lazy) >= 5

    def test_cross_pairs_lazy_cache_registry(self, spark, docs):
        """r18 ADVICE: eager_checkpoint=False hands the persisted
        intermediates to the caller via cache_registry so a long-lived
        session can unpersist them once the lazy result materializes
        (previously they accumulated until clearCache)."""
        from tumult_core_spark.extensions.dedup import (
            minhash_band_index,
            minhash_lsh_cross_pairs,
        )

        corpus = docs.limit(30).select("doc_id", "text")
        index = minhash_band_index(corpus, "doc_id", "text", 32, 8)
        batch = corpus.filter("doc_id < 5").withColumn(
            "doc_id", F.col("doc_id") + 5_000_000
        )
        registry: list = []
        lazy = minhash_lsh_cross_pairs(
            batch, index, "doc_id", "text", 32, 8,
            eager_checkpoint=False, cache_registry=registry,
        )
        assert lazy.count() >= 5
        assert registry, "no persisted intermediates handed back"
        for cached in registry:
            lvl = cached.storageLevel
            assert lvl.useMemory or lvl.useDisk
            cached.unpersist()
        for cached in registry:
            lvl = cached.storageLevel
            assert not (lvl.useMemory or lvl.useDisk)


class TestLocalFinishCC:
    """r17: size-gated driver-side union-find finish for small edge
    sets in connected_components (the star rounds remain the scale
    path; tests of that machinery pass local_finish_edges=0)."""

    def test_local_and_distributed_paths_agree(self, spark):
        import random

        from tumult_core_spark.extensions import components

        rnd = random.Random(41)
        nodes = rnd.sample(range(10**6), 400)
        pairs = [(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(350)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        local = {
            r["node"]: r["component"]
            for r in components.connected_components(df).collect()
        }
        assert components.last_run_stats["mode"] == "local"
        assert components.last_run_stats["rounds"] == 0
        dist = {
            r["node"]: r["component"]
            for r in components.connected_components(
                df, local_finish_edges=0
            ).collect()
        }
        assert components.last_run_stats["mode"] == "distributed"
        assert components.last_run_stats["rounds"] >= 1
        assert local == dist and len(local) > 0

    def test_local_path_handles_self_loops_and_nulls(self, spark):
        from tumult_core_spark.extensions import components

        df = spark.createDataFrame(
            [(1, 2), (None, 3), (4, None), (5, 5)],
            "id_a long, id_b long",
        )
        got = {
            r["node"]: r["component"]
            for r in components.connected_components(df).collect()
        }
        assert components.last_run_stats["mode"] == "local"
        assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}

    def test_gate_on_input_rows_routes_distributed(self, spark):
        """Inputs above the row gate take the star rounds; the gate is
        on INPUT rows (one cheap scan), so driver memory is bounded by
        the gate itself — no secondary collect cap needed."""
        from tumult_core_spark.extensions import components

        df = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["component"]
            for r in components.connected_components(
                df, local_finish_edges=3  # 4 input rows > 3: distributed
            ).collect()
        }
        assert components.last_run_stats["mode"] == "distributed"
        assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5, 7: 7, 8: 7}

    def test_local_finish_returns_none_past_cap(self, spark):
        """r18 ADVICE: _local_finish requests cap+1 rows, so a collect
        that sees MORE than cap rows proves the gating count() went
        stale — it must refuse (return None), never silently drop the
        edges past the limit."""
        from tumult_core_spark.extensions.components import _local_finish

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
        )
        assert _local_finish(df, "id_a", "id_b", cap=2) is None
        ok = _local_finish(df, "id_a", "id_b", cap=3)
        assert ok is not None and ok.count() == 4

    def test_stale_gating_count_falls_back_distributed(self, spark):
        """End-to-end: if the input grows between the gating count()
        and the Arrow collect (live/nondeterministic source), the
        local finish refuses and connected_components takes the
        distributed star rounds — labels stay correct."""
        from tumult_core_spark.extensions import components

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
        )

        class StaleCount:
            """Delegates everything to the real DataFrame but reports
            a stale (too-small) row count, simulating growth between
            plan and collect."""

            def __init__(self, inner):
                self._inner = inner

            def count(self):
                return 2

            def __getattr__(self, name):
                return getattr(self._inner, name)

        got = {
            r["node"]: r["component"]
            for r in components.connected_components(
                StaleCount(df), local_finish_edges=2
            ).collect()
        }
        assert components.last_run_stats["mode"] == "distributed"
        assert got == {i: 1 for i in range(1, 6)}

    def test_local_path_long_path_graph(self, spark):
        """The vectorized hook+jump union-find must converge on the
        adversarial path graph too (deep trees stress pointer
        jumping), with the same min-id labels."""
        from tumult_core_spark.extensions import components

        df = spark.createDataFrame(
            [(i, i + 1) for i in range(500)], "id_a long, id_b long"
        )
        got = {
            r["node"]: r["component"]
            for r in components.connected_components(df).collect()
        }
        assert components.last_run_stats["mode"] == "local"
        assert got == {i: 0 for i in range(501)}

    def test_local_result_is_frozen_relation(self, spark):
        """The local path returns an immutable LocalTableScan (Arrow) —
        re-reads never recompute the union-find or rescan the input."""
        from tumult_core_spark.extensions import components

        df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        out = components.connected_components(df)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LocalRelation" in plan or "LocalTableScan" in plan, plan
        assert out.count() == 3
