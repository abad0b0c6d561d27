"""Connected components over a pair relation, and component-based
canonical deduplication.

This closes the corpus-scale dedup loop the near-duplicate operators
open (``dedup.py`` / ``similarity.py`` emit pair relations; a real
pipeline then needs "keep ONE document per duplicate cluster", which
is a connected-components problem over the pair graph).

The algorithm is alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — a public
MapReduce-era algorithm that maps 1:1 onto DataFrame groupBy+join):

* large-star: every node attaches its LARGER neighbors to the minimum
  of its neighborhood (including itself);
* small-star: every node attaches its smaller-or-equal neighbors to
  that minimum.

Each round is two shuffles (a groupBy computing neighborhood minima
and a join re-homing edges); the edge set monotonically flattens into
stars centered at component minima in O(log n) rounds — there is no
driver-side graph state, so this scales to billion-edge pair
relations.  Convergence is detected by an (count, hash-sum) edge-set
fingerprint, one tiny aggregate per round.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..utils.misc import cut_lineage, free_local_checkpoint

#: diagnostics from the most recent ``connected_components`` call in
#: this process: ``{"rounds": <fixpoint rounds used>, "mode":
#: "distributed" | "local", "edges": <canonical edge count, or input
#: row count on the local path>}`` (``rounds`` is 0 on the
#: local-finish path).  Written by the
#: library, read by bench.py's sf_sweep so a round-over-round
#: sweep-factor change can be attributed to fixpoint round-count
#: variance vs a real per-round cost change.
last_run_stats: dict = {}

#: Inputs at or below this many ROWS finish DRIVER-SIDE with one Arrow
#: collect + a vectorized numpy union-find instead of the O(log n)
#: alternating-star rounds (r17).  Rationale: below a few million
#: edges the star rounds' cost is almost entirely fixed per-round
#: overhead (4+ Spark jobs, 2 localCheckpoints, a fingerprint
#: aggregate — per round), while the local finish is one count job +
#: one collect job + ~100 ms of numpy; this is the standard "finish
#: the residual graph locally" hybrid used by production
#: MapReduce/Spark CC implementations (the same paper's authors note
#: most real graphs collapse to a tiny residual after 1-2 rounds).
#: Gating on the INPUT row count (not the canonical edge count) keeps
#: the decision to one cheap scan and bounds EVERYTHING the local path
#: collects: pairs <= gate rows (~32 MB through Arrow at 2M), distinct
#: nodes <= 2x that.  Pass ``local_finish_edges=0`` to force the
#: distributed path (tests of the star machinery do).
LOCAL_FINISH_EDGES = 2_000_000


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u < v) long pairs, self-loops dropped."""
    e = edges.select(
        F.col(src).cast("long").alias("__a"), F.col(dst).cast("long").alias("__b")
    ).filter(F.col("__a") != F.col("__b"))
    return e.select(
        F.least("__a", "__b").alias("u"), F.greatest("__a", "__b").alias("v")
    ).dropDuplicates(["u", "v"])


def _star_round(e: DataFrame, large: bool, dedupe: bool = True) -> DataFrame:
    """One large-star (attach neighbors v > u) or small-star (attach
    neighbors v <= u, and u itself) round.  ``e`` holds undirected
    edges in either orientation; both are expanded so every node sees
    its full neighborhood.  Small-star MUST also emit (u, m(u)) — a
    leaf whose only neighbor is smaller emits nothing otherwise and
    the graph would lose edges.

    ``dedupe=False`` skips the distinct shuffle: duplicate edges do
    not change neighborhood minima, so the large-star half of a round
    can run without it (one round of duplication is bounded) and let
    the small-star half's distinct clean up — one shuffle saved per
    round, which dominates cost on small graphs."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("__m")
    )
    cond = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
    out = (
        sym.join(mins, "u")
        .where(cond)
        .select(F.col("v").alias("__x"), F.col("__m"))
    )
    if not large:
        out = out.unionByName(
            mins.select(F.col("u").alias("__x"), F.col("__m"))
        )
    out = out.filter(F.col("__x") != F.col("__m")).select(
        F.col("__x").alias("u"), F.col("__m").alias("v")
    )
    return out.dropDuplicates(["u", "v"]) if dedupe else out


def _raw_nodes(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Every distinct castable node id of the input relation (both
    endpoints, NULLs and failed long casts dropped)."""
    return (
        edges.select(F.col(src).cast("long").alias("node"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
    )


def _local_finish(
    edges: DataFrame, src: str, dst: str, cap: int
) -> Optional[DataFrame]:
    """Driver-side finish for a small input: one Arrow collect of the
    raw (src, dst) pairs, then a fully VECTORIZED numpy union-find —
    min-directed hooking (``np.minimum.at``) alternated with pointer
    jumping to a fixpoint, the Shiloach-Vishkin shape, so there is no
    per-edge Python loop.  Node ids stay int64 end-to-end (no float
    round-trip: ids above 2^53 would corrupt through a NaN-sentinel
    conversion), NULL/uncastable endpoints drop from edges but their
    non-NULL partners still count as nodes, and self-loops make their
    node a singleton — identical semantics to the distributed path.
    Hooking always attaches the larger root under the smaller over
    ids' sorted dense indices, so every final root IS its component's
    minimum id, matching the distributed fixpoint's convention
    exactly.  Returns the mapping as an immutable ``LocalTableScan``
    relation (re-reads never recompute; broadcasts for free
    downstream).

    Returns ``None`` when the collect sees MORE than ``cap`` rows —
    the gating ``count()`` went stale between plan and collect (live
    source, nondeterministic input), so finishing locally would
    silently drop edges past the limit and mislabel components.  The
    caller falls back to the distributed rounds in that case; the
    stale-count signal is free because ``cap + 1`` rows were requested.
    """
    import numpy as np
    import pyarrow as pa

    spark = edges.sparkSession
    tbl = (
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        )
        .limit(cap + 1)
        .toArrow()
    )
    if tbl.num_rows > cap:
        return None
    col_a, col_b = tbl.column("a"), tbl.column("b")
    # node universe: every non-null endpoint (drop_null keeps int64)
    a_nn = col_a.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
    b_nn = col_b.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a_nn, b_nn]))
    # edges: rows with BOTH endpoints valid, self-loops dropped
    both = tbl.drop_null()
    ea = both.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    eb = both.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = ea != eb
    iu = np.searchsorted(nodes, ea[keep])
    iv = np.searchsorted(nodes, eb[keep])
    parent = np.arange(len(nodes), dtype=np.int64)
    while len(iu):
        pu, pv = parent[iu], parent[iv]
        if not (pu != pv).any():
            break
        # hook: larger root under smaller (parents only ever DECREASE,
        # so concurrent conflicting hooks resolve to the minimum and
        # the loop terminates)
        np.minimum.at(parent, np.maximum(pu, pv), np.minimum(pu, pv))
        # pointer-jump to an idempotent forest (everyone at a root)
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
    # nodes is sorted, so dense-index minima ARE id minima
    out = pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(nodes[parent], pa.int64()),
        }
    )
    # the collect doubles as the path gate (no separate count job), so
    # the run stats are stamped here where the row count is known
    last_run_stats.update(rounds=0, mode="local", edges=tbl.num_rows)
    return spark.createDataFrame(out)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
    checkpoint_dir: Optional[str] = None,
    local_finish_edges: int = LOCAL_FINISH_EDGES,
) -> DataFrame:
    """(node, component) for every node of the pair relation, where
    ``component`` is the smallest node id in its connected component.

    Nodes only present as isolated vertices of some other relation are
    not invented here — every node of ``edges`` appears exactly once.
    Callers wanting singletons too should left-join this result onto
    their full id set and coalesce with the id itself.

    ``checkpoint_dir``: by default each round cuts lineage with
    ``localCheckpoint`` — fast, but not fault-tolerant (a lost
    executor loses its blocks and the job with them).  On a real
    cluster pass an HDFS/S3 path here to switch every round to a
    RELIABLE ``checkpoint()`` that survives executor loss (see
    ``utils.misc.cut_lineage``).

    ``local_finish_edges``: inputs at or below this many ROWS (default
    :data:`LOCAL_FINISH_EDGES`; 0 disables) skip the star rounds
    entirely and finish with a vectorized driver-side union-find over
    one Arrow collect — identical output (component = minimum id),
    driver memory bounded by the gate itself, and none of the
    per-round job/checkpoint overhead that dominates small graphs.  At
    100 TB the input takes the distributed rounds; the hybrid is what
    production CC pipelines do with small residuals.
    """
    spark = edges.sparkSession
    if local_finish_edges > 0:
        # no gating count(): the bounded limit(cap+1) collect inside
        # _local_finish IS the gate — at small scale this saves a full
        # scan-and-count job, and at 100 TB Spark's incremental
        # executeTake reads only as many splits as it takes to exceed
        # the cap before falling back, instead of counting every edge
        # first (r18, guide §1.2/§5: don't compute things you throw
        # away).  Driver memory stays bounded by cap+1 rows either way.
        result = _local_finish(edges, src, dst, local_finish_edges)
        if result is not None:
            return result
        # more than cap rows arrived — take the distributed path
    e = _canonical_edges(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    # the count materializes the cache the first star round would have
    # materialized anyway, and right-sizes the first round's partitioning
    n_edges = e.count()
    last_run_stats.update(mode="distributed", edges=n_edges)
    default_par = spark.sparkContext.defaultParallelism
    par = max(2, min(default_par, n_edges // 100_000 + 1))
    prev_fp = None
    rounds_used = 0
    for rounds_used in range(1, max_rounds + 1):
        # checkpoint between the stars too: the small-star references
        # its input three times (both sym orientations + the mins
        # aggregate), so an unmaterialized large-star subtree would be
        # re-evaluated per reference
        half = cut_lineage(
            _star_round(e, large=True, dedupe=False), checkpoint_dir
        )
        if rounds_used > 1 and checkpoint_dir is None:
            # the previous round's checkpoint is fully consumed into
            # `half` now — drop its blocks deterministically instead of
            # waiting on py4j GC (unbounded block churn across rounds)
            free_local_checkpoint(e)
        nxt = _star_round(half, large=False)
        # checkpoint at a partition count sized to the edge set (known
        # from the previous round's fingerprint): a shrinking graph
        # otherwise drags the input's full partitioning through every
        # round, and per-task overhead dominates small rounds
        nxt = nxt.coalesce(par)
        nxt = cut_lineage(nxt, checkpoint_dir)  # cut O(rounds) lineage
        if checkpoint_dir is None:
            free_local_checkpoint(half)  # consumed into nxt
        fp = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold: order-independent and cannot overflow (ANSI
            # mode rejects a plain sum of 64-bit hashes)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        e.unpersist()
        e = nxt
        if prev_fp == (fp["n"], fp["h"]):
            break
        prev_fp = (fp["n"], fp["h"])
        par = max(2, min(default_par, int(fp["n"] or 0) // 100_000 + 1))
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    last_run_stats["rounds"] = rounds_used
    # fixpoint edges are stars (v = component min); centers map to themselves
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    centers = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    mapped = nodes.unionByName(centers).dropDuplicates(["node"])
    # honor the every-node-of-edges contract for nodes whose ONLY
    # edges were self-loops: _canonical_edges drops self-loops, so
    # such nodes never enter the fixpoint — they are singletons of
    # their own component, not absentees.  One node-cardinality left
    # join at output; no effect when the input has no self-loops.
    # isNotNull (inside _raw_nodes) guards both NULL endpoints and
    # string ids that fail the long cast — _canonical_edges' a != b
    # predicate silently drops NULLs, so without the filter a NULL
    # endpoint would surface here as a spurious (NULL, NULL) output row
    raw_nodes = _raw_nodes(edges, src, dst)
    return raw_nodes.join(mapped, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 3,
    damping: float = 0.85,
    undirected: bool = True,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps
    (Page et al. 1999) over the pair relation — link-graph centrality
    is a standard quality/weighting signal in web-corpus curation.

    Scale shape: the edge relation is joined to its out-degrees ONCE
    and persisted; each iteration is then one edge-sized shuffle (join
    ranks on ``u``, sum contributions by ``v``) against a node-sized
    ranks relation, with per-iteration lineage cut via
    :func:`~..utils.misc.cut_lineage` (``checkpoint_dir`` switches it
    to a reliable checkpoint, as in :func:`connected_components`).  No
    driver-side graph state; ranks sum to 1 up to float error.

    ``undirected=True`` (default) expands each pair into both
    directions, so every node has out-degree >= 1 and no dangling-mass
    correction is needed.  With ``undirected=False`` the standard
    simplification applies: dangling nodes' mass is dropped rather
    than redistributed (ranks then sum to < 1).
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if undirected:
        e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.dropDuplicates(["u", "v"])
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("__d"))
    ed = e.join(deg, "u").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select("u").unionByName(e.select(F.col("v").alias("u"))).distinct()
        if not undirected
        else deg.select("u")
    )
    nodes = nodes.select(F.col("u").alias("node")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = nodes.count()
    if n == 0:
        # empty graph: release both persists before returning (the
        # normal path unpersists at the end; leaking here would pin
        # blocks for the session across repeated empty calls)
        out = nodes.withColumn("rank", F.lit(0.0))
        ed.unpersist()
        nodes.unpersist()
        return out
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev = None
    for _ in range(max(0, iterations)):
        contrib = (
            ed.join(ranks, ed["u"] == ranks["node"])
            .select(F.col("v"), (F.col("rank") / F.col("__d")).alias("__w"))
            .groupBy("v")
            .agg(F.sum("__w").alias("__in"))
        )
        ranks = cut_lineage(
            nodes.join(contrib, nodes["node"] == contrib["v"], "left").select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("__in", F.lit(0.0))).alias(
                    "rank"
                ),
            ),
            checkpoint_dir,
        )
        if prev is not None and checkpoint_dir is None:
            free_local_checkpoint(prev)
        prev = ranks
    ed.unpersist()
    nodes.unpersist()
    return ranks


def canonical_duplicates(
    pairs: DataFrame,
    id_col: str = "id_a",
    id_col_b: str = "id_b",
    checkpoint_dir: Optional[str] = None,
    local_finish_edges: int = LOCAL_FINISH_EDGES,
) -> DataFrame:
    """(doc_id, canonical_id) for every document that appears in the
    near-duplicate pair relation: the canonical is the smallest id of
    its duplicate cluster.  Rows with doc_id != canonical_id are the
    ones a dedup pipeline drops; an anti-join of the corpus against
    that set implements "keep one per cluster" without ever
    materializing clusters driver-side.

    ``checkpoint_dir`` is forwarded to the underlying
    :func:`connected_components` loop: set it to a shared path
    (HDFS/S3) for RELIABLE per-round checkpoints that survive executor
    loss on a cluster; the default local checkpoint is fastest but not
    fault-tolerant at scale."""
    comp = connected_components(
        pairs,
        src=id_col,
        dst=id_col_b,
        checkpoint_dir=checkpoint_dir,
        local_finish_edges=local_finish_edges,
    )
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )
