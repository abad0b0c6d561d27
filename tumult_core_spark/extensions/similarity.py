"""Approximate-nearest-neighbor search over embedding columns.

* ``brute_force_knn`` — exact cosine top-k per query: broadcast the
  query set, one JVM-side ``zip_with``/``aggregate`` dot product per
  (query, corpus) pair, window top-k.  Baseline and verification
  oracle.
* ``ivf_knn`` — the scale path: partition the corpus into Voronoi
  cells around sampled centroids (IVF coarse quantizer), probe only
  the ``nprobe`` nearest cells per query.  Corpus assignment is one
  broadcast-join pass; the probe join touches ~nprobe/ncells of the
  corpus instead of all of it.

Vectors are ``array<float/double>`` columns; all arithmetic is
Catalyst higher-order functions — no Python in the hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (
        F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-30))
    )


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vector_col: str = "embedding",
    k: int = 10,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k: (query_id, corpus_id, score, rank).

    The (small) query set rides into every executor as a normalized
    NumPy matrix; each Arrow corpus batch scores against it with one
    BLAS matmul and keeps only its local per-query top-k, so the
    final exact top-k window sees ~k * num_batches candidates instead
    of |corpus| * |queries| rows.  Dense linear algebra through BLAS
    beats Catalyst's interpreted higher-order array functions by an
    order of magnitude here.

    The query set is collected to the driver and broadcast, so it must
    be small; ``max_queries`` bounds the collect (the limit is pushed
    into the scan, so an oversized query set fails fast without
    materializing on the driver).  For large query sets use ``ivf_knn``
    or a join-based formulation instead.
    """
    import numpy as np
    import pandas as pd

    if max_queries <= 0:
        raise ValueError("max_queries must be positive")
    qrows = queries.select(query_id, vector_col).limit(max_queries + 1).collect()
    if not qrows:
        raise ValueError("queries DataFrame is empty")
    if len(qrows) > max_queries:
        raise ValueError(
            f"queries has more than max_queries={max_queries} rows; "
            "brute_force_knn broadcasts the query set to every executor — "
            "raise max_queries explicitly if this is intended, or use "
            "ivf_knn for large query sets"
        )
    if any(r[1] is None for r in qrows):
        raise ValueError(
            f"queries contain NULL {vector_col!r} vectors; drop or impute "
            "them before searching"
        )
    qids = np.array([r[0] for r in qrows])
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30, None)

    # id columns keep their INPUT types (string doc ids included): a
    # hardcoded `long` schema made Arrow reject any non-long id deep in
    # the Python worker with an opaque executor error
    q_id_t = queries.schema[query_id].dataType.simpleString()
    c_id_t = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"`{query_id}` {q_id_t}, `{corpus_id}` {c_id_t}, score double"

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf[vector_col].tolist(), dtype=np.float64)
            Cn = C / np.clip(np.linalg.norm(C, axis=1, keepdims=True), 1e-30, None)
            S = Cn @ Qn.T  # (batch, queries)
            k_eff = min(k, S.shape[0])
            top = np.argpartition(-S, k_eff - 1, axis=0)[:k_eff]  # k x q
            cids = pdf[corpus_id].to_numpy()
            n_q = S.shape[1]
            yield pd.DataFrame(
                {
                    query_id: np.repeat(qids, k_eff),
                    corpus_id: cids[top.T.ravel()],
                    "score": S[top.T.ravel(), np.repeat(np.arange(n_q), k_eff)],
                }
            )

    # NULL corpus vectors can never match — drop them JVM-side (the
    # IsNotNull filter pushes into the scan) instead of letting the
    # ragged batch crash the BLAS matmul inside the Python worker
    # NOT widened before the Python stage (r18, measured and
    # rejected): the batched BLAS scoring is milliseconds at bench
    # scale, so a widen only adds a shuffle plus 32 task overheads; at
    # 100 TB the corpus scan is already wide and the widen would be a
    # no-op.  See minhash_signatures for the full finding.
    candidates = (
        corpus.select(corpus_id, vector_col)
        .where(F.col(vector_col).isNotNull())
        .mapInPandas(score_batches, schema=out_schema)
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sample_centroids(
    corpus: DataFrame, vector_col: str, num_centroids: int, seed: int = 7
) -> DataFrame:
    """Deterministic centroid sample: the first ``num_centroids``
    corpus vectors by a hash ordering (cheap coarse quantizer; a
    k-means refinement can replace this without changing the plan)."""
    return (
        corpus.select(F.col(vector_col).cast("array<double>").alias("__centroid"))
        .orderBy(F.xxhash64(F.col("__centroid").cast("string"), F.lit(seed)))
        .limit(num_centroids)
        .withColumn("__centroid_id", F.monotonically_increasing_id())
    )


def _groupwise_mean(
    df: DataFrame, key_col: str, vec_col: str, out_col: str
) -> DataFrame:
    """(key, element-wise mean array) — the shared centroid-mean
    construction: ``posexplode`` -> per-(key, position) avg (map-side
    partial aggregation keeps the shuffle at groups x dim rows, never
    the corpus) -> deterministic ``array_sort(collect_list)``
    reassembly.  Used by :func:`kmeans_centroids` (per Lloyd cell) and
    :func:`embedding_outliers` (per label/source group) — one copy, so
    a NULL-handling or determinism tweak can never drift between them."""
    return (
        df.select(key_col, F.posexplode(vec_col).alias("__pos", "__x"))
        .groupBy(key_col, "__pos")
        .agg(F.avg("__x").alias("__m"))
        .groupBy(key_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm")
        )
        .select(
            key_col,
            F.transform(F.col("__pm"), lambda s: s["__m"]).alias(out_col),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    vector_col: str,
    num_centroids: int,
    iterations: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Distributed Lloyd refinement of the hash-sampled centroids.

    Each iteration: assign every vector to its nearest centroid
    (closure-captured NumPy argmax in mapInPandas — genuinely no
    shuffle of the corpus; see :func:`_nearest_centroids`), then
    recompute each centroid as the element-wise mean of its cell
    (posexplode -> per-(cell, position) partial-aggregated mean ->
    reassembled array).
    Cost per iteration is one corpus scan plus a cells x dim sized
    aggregate; centroids stay broadcast-sized throughout, so this
    scales to corpora that never fit on the driver.  Deterministic
    given (corpus, seed).  Empty cells keep their previous centroid.
    """
    cents = sample_centroids(corpus, vector_col, num_centroids, seed)
    if not cents.head(1):
        # consistent with pca_fit / sq_fit / pq_fit: a fit on nothing
        # is a caller error, not an empty result to propagate silently
        raise ValueError("empty corpus")
    spark = corpus.sparkSession
    c = corpus.select(F.col(vector_col).cast("array<double>").alias("__v"))
    for _ in range(max(0, iterations)):
        assigned = _nearest_centroids(c, "__v", cents, 1).select(
            "__centroid_id", "__v"
        )
        means = _groupwise_mean(assigned, "__centroid_id", "__v", "__new")
        cents = (
            cents.join(means, "__centroid_id", "left")
            .select(
                "__centroid_id",
                F.coalesce(F.col("__new"), F.col("__centroid")).alias("__centroid"),
            )
        )
        # FREEZE the iteration's centroids as a driver-local relation
        # (k x dim — broadcast-sized by construction).  Left lazy, each
        # iteration's plan chains every earlier iteration's means
        # aggregation, and the collect() inside _nearest_centroids then
        # re-executes them all: O(iterations^2) corpus scans instead of
        # the documented one per iteration.
        cents = spark.createDataFrame(
            [(r["__centroid_id"], list(r["__centroid"])) for r in cents.collect()],
            "__centroid_id long, __centroid array<double>",
        )
    return cents


def _nearest_centroids(
    df: DataFrame,
    vector_col: str,
    centroids: DataFrame,
    n_nearest: int,
) -> DataFrame:
    """Append ``__centroid_id`` rows for each vector's n nearest
    centroids — WITHOUT shuffling the corpus.

    The centroid matrix is bounded (num_centroids x dim) by
    construction, so it is collected once and closure-captured into an
    Arrow-batched ``mapInPandas`` that scores a whole batch with one
    BLAS matmul and takes a per-row argmax/top-n.  The previous
    formulation (crossJoin(broadcast) + row_number window keyed on a
    row id) shuffled corpus x candidates rows on EVERY call — once per
    Lloyd iteration in :func:`kmeans_centroids`, directly contradicting
    its no-corpus-shuffle contract.  Scores replicate :func:`cosine`
    exactly (dot / max(|a||b|, 1e-30)); ties break toward the lower
    centroid id (stable argsort over the id-sorted matrix), making the
    assignment deterministic given (corpus, seed).  All input columns
    pass through unchanged.
    """
    rows = sorted(centroids.collect(), key=lambda r: r["__centroid_id"])
    cid = np.array([r["__centroid_id"] for r in rows], dtype=np.int64)
    C = np.array([list(r["__centroid"]) for r in rows], dtype=np.float64)
    c_norm = np.linalg.norm(C, axis=1)
    n = min(n_nearest, len(rows))

    out_fields = list(df.schema.fields) + [
        T.StructField("__centroid_id", T.LongType(), False)
    ]
    out_schema = T.StructType(out_fields)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf[vector_col].tolist(), dtype=np.float64)
            denom = np.maximum(
                np.outer(np.linalg.norm(A, axis=1), c_norm), 1e-30
            )
            S = (A @ C.T) / denom
            if n == 1:
                out = pdf.copy()
                out["__centroid_id"] = cid[S.argmax(axis=1)]
                yield out
            else:
                top = np.argsort(-S, axis=1, kind="stable")[:, :n]
                out = pdf.iloc[np.repeat(np.arange(len(pdf)), n)].copy()
                out["__centroid_id"] = cid[top.ravel()]
                yield out

    return df.mapInPandas(assign, schema=out_schema)


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vector_col: str = "embedding",
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    train_iterations: int = 0,
) -> DataFrame:
    """IVF approximate top-k: probe only nprobe/num_centroids cells.

    Recall < 1 by construction; raise ``nprobe`` to trade cost for
    recall, and ``train_iterations`` to Lloyd-refine the coarse
    quantizer (better-balanced cells -> better recall at the same
    nprobe).  Corpus cell assignment is reusable across query batches
    (write it out once for a static corpus).
    """
    # NULL vectors would otherwise become centroids (nulling every
    # cosine) or hold top-k slots with NULL scores — drop them at the
    # scan on both sides (plan stays all-Catalyst either way)
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(vector_col).cast("array<double>").alias("__cvec"),
    ).where(F.col("__cvec").isNotNull())
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(vector_col).cast("array<double>").alias("__qvec"),
    ).where(F.col("__qvec").isNotNull())
    if train_iterations > 0:
        centroids = kmeans_centroids(
            c, "__cvec", num_centroids, iterations=train_iterations
        )
    else:
        centroids = sample_centroids(c, "__cvec", num_centroids)
    c_assigned = _nearest_centroids(c, "__cvec", centroids, 1)
    q_assigned = _nearest_centroids(q, "__qvec", centroids, nprobe)

    # SIZE-GATED broadcast of the probe-expanded query set: this is the
    # advertised large-query path (brute_force_knn redirects oversized
    # query sets here), so an unconditional F.broadcast would OOM the
    # driver / trip Spark's broadcast cap exactly where callers were
    # sent to avoid that.  One tiny agg on the query relation buys the
    # bound; past the gate the join falls back to a shuffle on the
    # cell id — still never a cross join.
    from ..utils.scale import broadcast_below

    q_stats = q.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("__qvec")).alias("d")
    ).first()
    q_sel = q_assigned.select("__qid", "__qvec", "__centroid_id")
    joined = c_assigned.join(
        broadcast_below(
            q_sel,
            int(q_stats["n"] or 0) * max(1, nprobe),
            est_row_bytes=40 + int(q_stats["d"] or 0) * 8,
        ),
        on="__centroid_id",
    )
    scored = joined.select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        cosine(F.col("__qvec"), F.col("__cvec")).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vector_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 11,
    max_band_bucket: int = 200,
    exact_pairs: str = "all",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Scale path: random-hyperplane LSH — sign-pattern signatures over
    ``num_planes`` fixed pseudo-random hyperplanes, banded so near-
    parallel vectors collide; candidates are verified with the exact
    cosine.  The hyperplanes are derived deterministically from
    ``seed`` via xxhash64, so signatures are reproducible with no
    driver-side randomness.  One shuffle on band keys; the exact
    cosine runs only on candidate pairs.

    Recall under the bucket cap: *identical* vectors are pre-grouped
    exactly (one hash groupBy on the vector column) and pair within
    their group without touching LSH, and only one representative per
    distinct vector enters the banded index; verified representative
    pairs are expanded back to all member pairs.  ``max_band_bucket``
    therefore only ever truncates buckets of *distinct* vectors — a
    hot bucket of a million exact duplicates costs one group, not a
    million bucket rows, and loses no pairs.  (A naive membership cap
    is catastrophic for exact duplicates: they share every band key,
    and a hash-of-id eviction order is identical across bands, so a
    member evicted anywhere is evicted everywhere and silently gets
    zero pairs.)

    ``exact_pairs`` controls the within-group expansion: ``"all"``
    emits every pair of an identical-vector group (Θ(g²) output rows —
    that is the true answer, the pairs all exist); ``"star"`` emits
    each member paired with the group's minimum id (Θ(g), enough for
    connected-component dedup at corpus scale).
    """
    if num_planes % bands != 0:
        raise ValueError("num_planes must be divisible by bands")
    if exact_pairs not in ("all", "star"):
        raise ValueError("exact_pairs must be 'all' or 'star'")
    planes_per_band = num_planes // bands

    raw = df.select(
        F.col(id_col).alias("__id"),
        F.col(vector_col).cast("array<double>").alias("__vec"),
    )
    # one shuffle on the vector value itself: exact-duplicate groups,
    # ids sorted so within-group pairs are already (low, high) ordered.
    # Persisted: the group relation feeds the within-group expansion,
    # the representative LSH index, and both sides of the member
    # expansion — uncached, Catalyst would re-run the vector groupBy
    # once per branch (plan showed the aggregate 4x+).
    from pyspark import StorageLevel

    groups = raw.groupBy("__vec").agg(
        F.sort_array(F.collect_list("__id")).alias("__ids")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ids = F.col("__ids")
    if exact_pairs == "all":
        pair_expr = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + F.lit(2), F.size(ids)),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    else:  # star: min-id representative joined to every other member
        pair_expr = F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda y: F.struct(ids[0].alias("a"), y.alias("b")),
        )
    within = (
        groups.filter(F.size(ids) > 1)
        .select(F.explode(pair_expr).alias("__p"), "__vec")
        .select(
            F.col("__p.a").alias("id_a"),
            F.col("__p.b").alias("id_b"),
            cosine(F.col("__vec"), F.col("__vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

    v = F.col("__vec")
    # LSH index over one representative (min id) per distinct vector
    base = groups.select(ids[0].alias("__id"), "__vec")

    # bit p = sign of dot(vec, h_p) where h_p[i] is a deterministic
    # pseudo-random +-1 weight from xxhash64(i, p, seed).  The plane
    # index MUST be captured by a closure factory, never a lambda
    # default (`lambda i, p=p`): PySpark counts default-valued params
    # toward higher-order-function arity and binds the second param to
    # the ARRAY INDEX column, which silently made every plane compute
    # the same projection (one effective hyperplane).  pmod, not %:
    # Spark's % returns negative remainders for negative hashes, which
    # turned "+-1 weights" into {-3,-1,1} with mean -1.
    def _plane_weight(p):
        return lambda i: (
            F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), F.lit(2)) * 2 - 1
        ).cast("double")

    bits = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.transform(
                        F.sequence(F.lit(0), F.size(v) - 1),
                        _plane_weight(p),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("long")
        for p in range(num_planes)
    ]
    band_keys = F.array(
        *[
            F.xxhash64(
                *[bits[b * planes_per_band + j] for j in range(planes_per_band)],
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    signed = base.select("__id", "__vec", F.posexplode(band_keys).alias("band", "bkey"))
    # Degenerate buckets (near-parallel distinct embeddings landing on
    # one band key) would make the self-join quadratic; cap each bucket
    # (two-pass, sort-free for under-cap buckets — see cap_hot_buckets).
    # Exact duplicates never hit this cap: they are one representative.
    from tumult_core_spark.extensions.dedup import cap_hot_buckets

    signed = cap_hot_buckets(signed, ["band", "bkey"], "__id", max_band_bucket)
    a, b = signed.alias("a"), signed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__vec").alias("va"),
            F.col("b.__vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    rep_pairs = (
        cands.select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
    if exact_pairs == "star":
        # The within-group star already links every member to its
        # representative, so one rep-to-rep edge connects both groups;
        # expanding to all Θ(|a|·|b|) member pairs would reintroduce
        # the quadratic blowup star mode exists to avoid (two large
        # identical-vector groups that are mutual near-dups).
        cross = rep_pairs
    else:
        # expand representative pairs to member pairs: the cosine
        # between any member of group a and any member of group b
        # equals the representative cosine (members are bit-identical
        # vectors)
        m_a = groups.select(ids[0].alias("id_a"), ids.alias("__ma"))
        m_b = groups.select(ids[0].alias("id_b"), ids.alias("__mb"))
        cross = (
            rep_pairs.join(m_a, "id_a")
            .join(m_b, "id_b")
            .select(F.explode("__ma").alias("__xa"), "__mb", "cosine")
            .select("__xa", F.explode("__mb").alias("__xb"), "cosine")
            .select(
                F.least("__xa", "__xb").alias("id_a"),
                F.greatest("__xa", "__xb").alias("id_b"),
                "cosine",
            )
        )
    return within.unionByName(cross)


def embedding_outliers(
    df: DataFrame,
    id_col: str,
    vector_col: str,
    group_col: str,
    dist_col: str = "centroid_dist",
    top_k: Optional[int] = None,
) -> DataFrame:
    """Distance of every vector to its group's centroid — the standard
    embedding-space quality filter for training corpora (vectors far
    from their label/source centroid are mislabeled or junk).

    Scale shape: the centroid is an element-wise mean computed by
    ``posexplode`` -> per-(group, position) average — map-side partial
    aggregation means the shuffle carries ``groups x dim`` rows, never
    the corpus — reassembled into an array and BROADCAST back (groups
    are assumed dimension-table sized), so the corpus itself is
    touched once, with the L2 distance evaluated JVM-side via
    ``zip_with``/``aggregate``.  No Python in the path.

    ``top_k``: keep only the k farthest vectors per group (window
    rank, ``id_col`` tiebreak for determinism); default all rows.
    """
    v = F.col(vector_col).cast("array<double>")
    base = df.select(F.col(id_col), F.col(group_col), v.alias("__v"))
    cents = _groupwise_mean(base, group_col, "__v", "__c")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("__v", "__c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    out = base.join(F.broadcast(cents), group_col).select(
        F.col(id_col), F.col(group_col), dist.alias(dist_col)
    )
    if top_k is not None:
        w = Window.partitionBy(group_col).orderBy(
            F.desc(dist_col), F.col(id_col)
        )
        out = (
            out.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= top_k)
            .drop("__r")
        )
    return out


def pca_fit(
    corpus: DataFrame,
    vector_col: str,
    k: int,
):
    """Exact PCA of an embedding column via distributed sufficient
    statistics: one ``mapInPandas`` pass accumulates per-partition
    ``(n, sum x, X^T X)`` (a d + d^2 accumulator per partition, d=64
    here — never the data), the driver combines the tiny partials and
    eigendecomposes the d x d covariance.  Returns ``(mean,
    components, explained_variance)`` as numpy arrays with components
    in rows, ordered by decreasing variance.

    Deterministic: the partial sums are combined in sorted partition
    order and each eigenvector's sign is fixed so its
    largest-magnitude coordinate is positive.
    """
    import numpy as np

    if k < 1:
        raise ValueError("k must be >= 1")

    def stats(batches):
        import pandas as pd  # noqa: F401

        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vector_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield __import__("pandas").DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
            }
        )

    parts = (
        corpus.select(vector_col)
        .mapInPandas(stats, schema="n long, s array<double>, ss array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("empty corpus")
    # deterministic combine order regardless of task scheduling
    parts = sorted(parts, key=lambda r: (r["n"], tuple(r["s"])))
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2  # symmetrize away float drift
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # sign convention: largest-|coordinate| positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def pca_project(
    corpus: DataFrame,
    vector_col: str,
    mean,
    components,
    out_col: str = "pca",
) -> DataFrame:
    """Project the embedding column onto fitted components (rows of
    ``components``): Arrow-batched matmul per partition with the tiny
    (mean, components) matrices shipped in the UDF closure — the
    corpus itself never moves."""
    import numpy as np
    import pandas as pd

    mean = np.asarray(mean, dtype=np.float64)
    comp = np.asarray(components, dtype=np.float64)

    def _proj(col):
        x = np.stack(col.to_numpy()).astype(np.float64)
        y = (x - mean) @ comp.T
        return pd.Series(list(y))

    proj = F.pandas_udf(_proj, "array<double>")

    return corpus.withColumn(out_col, proj(F.col(vector_col)))


# ---------------------------------------------------------------------------
# product quantization (compact codes for corpus-scale ANN; the public
# PQ/ADC construction of Jegou, Douze & Schmid, "Product Quantization
# for Nearest Neighbor Search", IEEE TPAMI 2011)
# ---------------------------------------------------------------------------


def pq_fit(
    corpus: DataFrame,
    vector_col: str,
    num_subvectors: int = 8,
    num_centroids: int = 16,
    iterations: int = 3,
    seed: int = 7,
    sample_fraction: float = 1.0,
    id_col: Optional[str] = None,
):
    """Fit product-quantization codebooks: split the d-dim space into
    ``num_subvectors`` contiguous subspaces and run the distributed
    Lloyd refinement (:func:`kmeans_centroids`) in each, optionally
    over a deterministic hash sample of the corpus (codebooks are
    sample-statistics — at corpus scale fit on a sample, encode
    everything).

    Returns a numpy array of shape ``(m, k, d/m)``.  Deterministic
    given (corpus, seed).
    """
    import numpy as np

    # NULL vectors: drop before sizing (size(NULL) is NULL -> an opaque
    # TypeError on the modulo below) and before they can be sampled as
    # centroids — the same guard the knn entry points apply
    corpus = corpus.where(F.col(vector_col).isNotNull())
    first = corpus.select(F.size(vector_col).alias("d")).first()
    if first is None:
        raise ValueError("empty corpus")
    d = first["d"]
    if d % num_subvectors != 0:
        raise ValueError(
            f"dimension {d} not divisible into {num_subvectors} subvectors"
        )
    sub = d // num_subvectors
    fit_df = corpus
    if sample_fraction < 1.0:
        if id_col is None:
            raise ValueError("sample_fraction < 1 requires id_col")
        from .sampling import hash_sample

        fit_df = hash_sample(corpus, id_col, sample_fraction, seed=seed)
    books = []
    for j in range(num_subvectors):
        piece = fit_df.select(
            F.slice(F.col(vector_col), j * sub + 1, sub).alias("__sub")
        )
        cents = kmeans_centroids(
            piece, "__sub", num_centroids, iterations=iterations, seed=seed + j
        )
        rows = sorted(cents.collect(), key=lambda r: r["__centroid_id"])
        books.append([list(r["__centroid"]) for r in rows])
    return np.asarray(books, dtype=np.float64)


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vector_col: str,
    codebooks,
    keep_cols=(),
) -> DataFrame:
    """(id, *keep_cols, code array<int>) — each subvector replaced by
    its nearest codebook centroid index.  Arrow-batched numpy argmin
    per subspace with the (m, k, d/m) codebooks in the UDF closure; the
    output codes are m small ints per vector (the 100 TB storage form).
    ``keep_cols`` ride through the same projection so callers needing
    id+metadata+code (ivfpq_index) never join the relation back to
    itself."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape

    def _enc(col):
        x = np.stack(col.to_numpy()).astype(np.float64)
        if x.shape[1] != m * sub:
            # numpy slicing would silently IGNORE trailing dimensions
            # of a longer vector (codes computed from a prefix of the
            # embedding — wrong neighbors with no crash)
            raise ValueError(
                f"vector dimension {x.shape[1]} != codebooks' "
                f"{m}x{sub}={m * sub}; refit pq codebooks for this "
                "embedding size"
            )
        n = x.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            seg = x[:, j * sub : (j + 1) * sub]
            # (n, k) squared distances to this subspace's centroids
            d2 = (
                (seg**2).sum(axis=1, keepdims=True)
                - 2.0 * seg @ books[j].T
                + (books[j] ** 2).sum(axis=1)
            )
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    enc = F.pandas_udf(_enc, "array<int>")
    return corpus.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        enc(F.col(vector_col)).alias("pq_code"),
    )


def pq_knn(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str,
    query_id_col: str,
    query_vector_col: str,
    k: int = 10,
    code_col: str = "pq_code",
    max_queries: int = 10_000,
) -> DataFrame:
    """Asymmetric-distance top-k: exact query vectors scored against
    PQ codes through per-query (m, k_centroids) lookup tables.

    The query set (bounded by ``max_queries``, like
    :func:`brute_force_knn`) collapses to a broadcast table of
    precomputed subspace distances; each corpus code then scores with
    m table lookups — no decode, no full-dimension arithmetic on the
    corpus side.  Returns (query_id, id, adc_distance) with a
    deterministic tie-break (distance, id).
    """
    scored = _adc_scored(
        codes, queries, codebooks, id_col, query_id_col, query_vector_col,
        max_queries, code_col,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", F.col(id_col), F.round("adc", 9).alias("adc_distance"))
    )


def _adc_tables(
    queries: DataFrame,
    codebooks,
    query_id_col: str,
    query_vector_col: str,
    max_queries: int,
):
    """(qids, qv, tables, m): per-query PQ subspace lookup tables —
    ``tables[q][j][c] = ||query_q subspace j - centroid c||^2`` —
    built from ONE bounded collect of the query set (qv is the raw
    query matrix so callers never collect a second time)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kc, sub = books.shape
    q_rows = queries.select(query_id_col, query_vector_col).limit(
        max_queries + 1
    ).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"query set exceeds max_queries={max_queries}; "
            "raise the bound explicitly for larger sweeps"
        )
    if not q_rows:
        raise ValueError("queries DataFrame is empty")
    qids = [r[query_id_col] for r in q_rows]
    qv = np.stack(
        [np.asarray(r[query_vector_col], dtype=np.float64) for r in q_rows]
    )
    if qv.shape[1] != m * sub:
        raise ValueError(
            f"query dimension {qv.shape[1]} != codebooks' "
            f"{m}x{sub}={m * sub}; refit pq codebooks for this embedding size"
        )
    tables = np.empty((len(qids), m, kc))
    for j in range(m):
        seg = qv[:, j * sub : (j + 1) * sub]
        tables[:, j, :] = (
            (seg**2).sum(axis=1, keepdims=True)
            - 2.0 * seg @ books[j].T
            + (books[j] ** 2).sum(axis=1)
        )
    return qids, qv, tables, m


def _adc_score_pairs(
    pairs: DataFrame, tables, m: int, qi_col: str, code_col: str
) -> F.Column:
    """adc column for an explicit (query-index, code) PAIR relation:
    m table lookups per pair, work proportional to the pairs that
    exist — never queries x candidates."""
    import pandas as pd

    def _score(code_s, qi_s):
        c = np.stack(code_s.to_numpy()).astype(np.int64)
        qi = qi_s.to_numpy().astype(np.int64)
        out = np.zeros(len(qi))
        for j in range(m):
            out += tables[qi, j, c[:, j]]
        return pd.Series(out)

    return F.pandas_udf(_score, "double")(F.col(code_col), F.col(qi_col))


def _adc_scored(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str,
    query_id_col: str,
    query_vector_col: str,
    max_queries: int,
    code_col: str = "pq_code",
) -> DataFrame:
    """(query_id, id, adc) for EVERY (query, code) pair: broadcast
    per-query subspace lookup tables, m table reads per candidate.
    All-pairs by design — this is :func:`pq_knn`'s exhaustive scan;
    the IVF-pruned path scores only its probed pairs via
    :func:`_adc_score_pairs`."""
    import pandas as pd

    qids, _qv, tables, m = _adc_tables(
        queries, codebooks, query_id_col, query_vector_col, max_queries
    )

    def _score(col):
        c = np.stack(col.to_numpy()).astype(np.int64)  # (n, m)
        n = c.shape[0]
        # gather per subspace: dist[q, i] = sum_j tables[q, j, c[i, j]]
        out = np.zeros((n, len(qids)))
        for j in range(m):
            out += tables[:, j, c[:, j]].T
        return pd.Series(list(out))

    score = F.pandas_udf(_score, "array<double>")
    scored = codes.select(
        F.col(id_col), F.posexplode(score(F.col(code_col))).alias("__qi", "adc")
    )
    qmap = codes.sparkSession.createDataFrame(
        [(i, q) for i, q in enumerate(qids)], ["__qi", "query_id"]
    )
    return scored.join(F.broadcast(qmap), "__qi").select(
        "query_id", F.col(id_col), "adc"
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vector_col: str,
    codebooks,
    num_cells: int = 16,
    train_iterations: int = 2,
    seed: int = 7,
):
    """Build the corpus-scale ANN index: IVF cell assignment (Lloyd-
    refined coarse quantizer) + PQ codes per vector.

    Returns ``(index_df, centroids)`` where ``index_df`` has
    ``(id, __cell, pq_code)`` — the compact persistent form (write it
    to parquet once for a static corpus; m bytes-ish per vector plus a
    cell id) — and ``centroids`` is the small (num_cells, d) numpy
    array the query side needs for probing.
    """
    import numpy as np

    c = corpus.select(
        F.col(id_col),
        F.col(vector_col).cast("array<double>").alias("__v"),
    )
    cents = kmeans_centroids(
        c, "__v", num_cells, iterations=train_iterations, seed=seed
    )
    assigned = _nearest_centroids(c, "__v", cents, 1).select(
        id_col, F.col("__centroid_id").alias("__cell"), "__v"
    )
    # ONE projection carries (id, __cell, pq_code): the previous
    # self-join on id re-ran the corpus-wide assignment mapInPandas for
    # BOTH join branches and paid a full corpus shuffle for the join
    index_df = pq_encode(
        assigned, id_col, "__v", codebooks, keep_cols=["__cell"]
    )
    rows = sorted(cents.collect(), key=lambda r: r["__centroid_id"])
    centroids = np.asarray([list(r["__centroid"]) for r in rows])
    cell_ids = [r["__centroid_id"] for r in rows]
    return index_df, (centroids, cell_ids)


def ivfpq_knn(
    index_df: DataFrame,
    queries: DataFrame,
    codebooks,
    centroids,
    id_col: str,
    query_id_col: str,
    query_vector_col: str,
    k: int = 10,
    nprobe: int = 4,
    max_queries: int = 10_000,
) -> DataFrame:
    """IVF-PQ top-k: each query probes its ``nprobe`` nearest cells
    (cosine against the tiny centroid matrix, computed driver-side)
    and ADC-scores ONLY the (query, candidate) pairs those probes
    create — the composition that makes billion-vector ANN tractable:
    the IVF prunes the corpus ~nprobe/num_cells, the PQ codes make
    what remains m table lookups per pair.  Every corpus code lives in
    exactly one cell, so the probes join IS the exact pair set: no
    all-queries scoring pass, no post-hoc filter.
    """
    cent_mat, cell_ids = centroids
    qids, qv, tables, m = _adc_tables(
        queries, codebooks, query_id_col, query_vector_col, max_queries
    )
    spark = index_df.sparkSession
    cn = cent_mat / np.clip(
        np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-30, None
    )
    qn = qv / np.clip(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30, None)
    sims = qn @ cn.T  # (q, cells)
    probe_pairs = [
        (qid, i, int(cell_ids[c]))
        for i, qid in enumerate(qids)
        for c in np.argsort(-sims[i], kind="stable")[:nprobe]
    ]
    probes = spark.createDataFrame(
        probe_pairs, ["query_id", "__qi", "__cell"]
    )
    pairs = index_df.join(F.broadcast(probes), "__cell")
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        _adc_score_pairs(pairs, tables, m, "__qi", "pq_code").alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("query_id", F.col(id_col), F.round("adc", 9).alias("adc_distance"))
    )


def sq_fit(corpus: DataFrame, vector_col: str = "embedding"):
    """Per-dimension affine int8 scalar-quantization bounds.

    One Catalyst scan: ``2d`` map-side-combined min/max aggregates over
    ``element_at`` projections — no explode, no shuffle of vector rows
    (an exploded fit would shuffle ``n*d`` rows; this moves ``2d``
    numbers per partition).  Returns ``(lo, hi)`` float64 arrays of
    length ``d``.  Dimensions with zero range get span 1.0 at encode
    time so they quantize to a constant code deterministically.
    """
    import numpy as np

    first = corpus.select(F.size(F.col(vector_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty corpus")
    d = first["d"]
    if d is None or d < 1:
        raise ValueError(
            f"{vector_col!r} must be a non-null, non-empty array "
            f"(first row has size {d!r})"
        )
    vec = F.col(vector_col).cast("array<double>")
    # ragged input must fail LOUDLY, not corrupt: validate uniform
    # length in the SAME scan (two extra map-side-combined aggregates,
    # no extra pass).  The per-dimension aggregates use
    # try_element_at — Spark 4's element_at throws on an out-of-bounds
    # index, which would abort the scan with an index error before the
    # ragged check below could produce its diagnostic; try_element_at
    # yields NULL there (min/max skip it) and the size aggregates then
    # reject the input with the real reason.
    aggs = [
        F.min(F.size(F.col(vector_col))).alias("__dmin"),
        F.max(F.size(F.col(vector_col))).alias("__dmax"),
    ]
    for i in range(d):
        aggs.append(F.min(F.try_element_at(vec, F.lit(i + 1))).alias(f"lo{i}"))
        aggs.append(F.max(F.try_element_at(vec, F.lit(i + 1))).alias(f"hi{i}"))
    row = corpus.agg(*aggs).first()
    if row["__dmin"] != d or row["__dmax"] != d:
        raise ValueError(
            f"ragged {vector_col!r}: vector sizes range "
            f"[{row['__dmin']}, {row['__dmax']}] but the first row has "
            f"size {d}; quantization bounds require uniform dimensionality"
        )
    lo = np.array([row[f"lo{i}"] for i in range(d)], dtype=np.float64)
    hi = np.array([row[f"hi{i}"] for i in range(d)], dtype=np.float64)
    if np.isnan(lo).any() or np.isnan(hi).any():
        raise ValueError(
            "NULL/NaN values in vector dimensions — clean the corpus "
            "(DropNulls/DropNaNs) before fitting quantization bounds"
        )
    return lo, hi


def sq_encode(
    corpus: DataFrame,
    id_col: str,
    vector_col: str,
    lo,
    hi,
    out_col: str = "sq_code",
) -> DataFrame:
    """Encode vectors to int8 codes (``array<tinyint>``, values in
    [-128, 127]): ``round((x - lo) / span * 255) - 128`` per dimension,
    clamped to [0, 255] before the shift so out-of-range values
    (vectors not seen at fit time) saturate instead of wrapping.

    Pure Catalyst — an indexed ``transform`` against broadcast literal
    bound arrays; a 100 TB corpus encodes as a projection inside
    whole-stage codegen with no Python and no shuffle, and the tinyint
    codes store/shuffle at a quarter of float32.
    """
    spans = [float(h - l) if h > l else 1.0 for l, h in zip(lo, hi)]
    lo_arr = F.array(*[F.lit(float(v)) for v in lo])
    span_arr = F.array(*[F.lit(v) for v in spans])
    vec = F.col(vector_col).cast("array<double>")
    codes = F.transform(
        vec,
        lambda x, i: (
            F.least(
                F.greatest(
                    F.round(
                        (x - F.element_at(lo_arr, i + 1))
                        / F.element_at(span_arr, i + 1)
                        * 255
                    ),
                    F.lit(0.0),
                ),
                F.lit(255.0),
            ).cast("int")
            - 128
        ).cast("tinyint"),
    )
    return corpus.select(F.col(id_col), codes.alias(out_col))


def sq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vector_col: str = "embedding",
    k: int = 10,
    lo=None,
    hi=None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Approximate cosine top-k over int8 scalar-quantized vectors:
    fit bounds (unless given), encode the corpus, decode
    (``lo + (code + 128) / 255 * span``) as a Catalyst projection, and
    run the exact BLAS top-k over the decoded vectors — 4x less corpus
    memory/IO than float32 at a small recall cost, the standard
    memory-bound trade for billion-vector search.
    """
    if lo is None or hi is None:
        lo, hi = sq_fit(corpus, vector_col)
    spans = [float(h - l) if h > l else 1.0 for l, h in zip(lo, hi)]
    lo_arr = F.array(*[F.lit(float(v)) for v in lo])
    span_arr = F.array(*[F.lit(v) for v in spans])
    enc = sq_encode(corpus, corpus_id, vector_col, lo, hi)
    decoded = enc.select(
        F.col(corpus_id),
        F.transform(
            F.col("sq_code"),
            lambda c, i: F.element_at(lo_arr, i + 1)
            + (c.cast("double") + 128)
            / 255
            * F.element_at(span_arr, i + 1),
        ).alias(vector_col),
    )
    return brute_force_knn(
        decoded, queries, corpus_id, query_id, vector_col, k, max_queries
    )
