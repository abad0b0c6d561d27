"""Reproducible sampling and dataset splitting for training pipelines.

A 100 TB corpus pipeline needs sampling that is (a) deterministic
given ids — the same document lands in the same split on every run,
on any cluster layout, so experiments are reproducible and train/test
never contaminate each other across reruns; (b) expressible as pure
relational arithmetic — no RNG state, no driver coordination, fully
pushed into the engine.

Determinism comes from a FIXED public mixing function (seed-keyed
Knuth multiplicative hashing, TAOCP vol. 3: ``K_s*(id+seed) mod 2^32``
with ``K_s = 2654435761*(2*seed+1) mod 2^32``) computed in plain
64-bit integer arithmetic, so the exact same assignment is computable
in any SQL engine — which is also what lets the duckdb oracles verify
these operators value-for-value.  Different seeds are DIFFERENT affine
permutations (not translations), so selections composed at distinct
seeds behave independently — split then sample then shuffle with
distinct seeds, as every shipped oracle entry does.

These compose with the rest of the engine: ``hash_split`` feeds
train/val/test materialization, ``hash_sample`` thins a corpus,
``stratified_sample`` enforces per-group quotas (per-language /
per-source caps in a training mix) via one window over the group —
the same hash-ordered pattern as ``utils/truncation.py``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate, TAOCP 6.4
_MOD = 1 << 32


def _mix(id_col: Column, seed: int) -> Column:
    """Deterministic position in [0, 2^32): ``K_s*(id+seed) mod 2^32``
    with ``K_s = K*(2*seed+1) mod 2^32`` and K the Knuth multiplier.

    The multiplier DEPENDS on the seed MULTIPLICATIVELY (odd x odd
    stays odd, so K_s remains a bijection mod 2^32; an additive or
    XOR perturbation would be far too weak — multipliers differing by
    a small delta d only decorrelate ids above ~2^32/d).  With a fixed
    multiplier the seed would only TRANSLATE the hash stream —
    ``K*(id+s2) = K*(id+s1) + K*(s2-s1)`` — so any two selections over
    the same ids would be interval-correlated regardless of seed
    (e.g. the top-decile 'test' split composed with a 0.5 hash_sample
    could return zero rows).  A per-seed multiplier makes different
    seeds different affine permutations; compositions at DISTINCT
    seeds behave independently, and seed 0 reproduces the classic
    Knuth mix unchanged.  Selections sharing the SAME seed are still
    nested by construction (that is the feature: a 10% sample is a
    subset of the 20% sample).

    Computed with a 16-bit SPLIT MULTIPLY — reduce ``m = (id+seed) mod
    2^32`` first, then ``((Ks*(m div 2^16) mod 2^16) * 2^16 + Ks*(m mod
    2^16)) mod 2^32`` — so every intermediate stays below ~2^48 and the
    expression is overflow-free under ANSI mode for the ENTIRE
    non-negative int64 id range (a plain ``(id+seed)*K`` overflows
    beyond id ~3.4e9, far too small for a 100 TB corpus; the id is
    reduced mod 2^32 BEFORE the seed add so ``id + seed`` can never
    overflow either).  Pure BIGINT arithmetic, reproducible in any SQL
    engine — the oracles recompute it verbatim in duckdb.  Ids must be
    NON-NEGATIVE: `%` keeps the dividend's sign in both engines.  The
    seed is reduced mod 2^32 in Python (non-negative even for a
    negative seed, so a threshold filter can never see a negative
    mix)."""
    seed = seed % _MOD
    k_s = (_KNUTH * (2 * seed + 1)) % _MOD
    m = (id_col % F.lit(_MOD) + F.lit(seed)) % F.lit(_MOD)
    lo = m % F.lit(65536)
    hi = ((m - lo) / F.lit(65536)).cast("long")
    return (
        (F.lit(k_s) * hi % F.lit(65536)) * F.lit(65536) + F.lit(k_s) * lo
    ) % F.lit(_MOD)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic ``fraction``-sample: keeps rows whose mixed id
    falls below ``fraction`` of the hash space.  Same rows on every
    run and every partitioning; the filter is a pure Catalyst
    expression evaluated scan-side inside whole-stage codegen — no
    shuffle, no RNG state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * _MOD)
    return df.filter(_mix(F.col(id_col).cast("long"), seed) < threshold)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[Tuple[str, float]],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...)
    by consecutive hash-space intervals; weights must sum to 1.

    The assignment depends only on (id, seed, weights), never on row
    order, partitioning, or cluster size — re-running on different
    hardware reproduces the identical split.
    """
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if len(splits) < 1:
        raise ValueError("need at least one split")
    pos = _mix(F.col(id_col).cast("long"), seed)
    bounds = []
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w
        bounds.append((name, int(acc * _MOD)))
    expr = F.lit(splits[-1][0])
    for name, b in reversed(bounds):
        expr = F.when(pos < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    max_per_group: int,
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, chosen by mixed-id
    order (deterministic, partitioning-independent) — per-language /
    per-source quota capping for training mixes.

    One window per group (map-side combinable rank over the group
    shuffle); ties cannot occur for distinct ids because the mix is a
    bijection mod 2^32 composed with the id as tiebreaker.
    """
    if max_per_group < 1:
        raise ValueError("max_per_group must be >= 1")
    w = Window.partitionBy(group_col).orderBy(
        _mix(F.col(id_col).cast("long"), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= max_per_group)
        .drop("__rank")
    )


def temperature_thresholds(
    counts: dict, temperature: float
) -> dict:
    """Integer hash-space thresholds implementing temperature-scaled
    source mixing: target share p_s ∝ w_s^(1/T) over empirical shares
    w_s, realized by per-row Bernoulli rates q_s ∝ w_s^(1/T - 1)
    normalized so the largest rate is 1 (maximal data retention —
    at least one source is kept in full).

    T=1 keeps everything (no reweighting); T>1 flattens the mix toward
    uniform by downsampling dominant sources; T→∞ approaches equal
    effective rates.  Returns ``{source: threshold}`` with threshold
    in [0, 2^32]; a row survives iff its mixed id < threshold.
    Pure function of (counts, T) so oracles and tests can recompute
    it independently.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not counts:
        return {}
    total = sum(counts.values())
    ex = (1.0 - temperature) / temperature
    qraw = {s: (n / total) ** ex for s, n in counts.items()}
    m = max(qraw.values())
    return {s: min(_MOD, int((q / m) * _MOD)) for s, q in qraw.items()}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    temperature: float,
    seed: int = 0,
) -> DataFrame:
    """Deterministic temperature-scaled source mixing: downsample
    dominant sources so the surviving mix approaches share ∝ w^(1/T)
    (the standard multilingual / multi-source training-mix rule).

    Two passes: one map-side-combined count per source (the source
    cardinality is small by definition — languages, domains, corpus
    shards — so the collected histogram is tiny), then a scan-side
    hash filter with per-source integer thresholds from
    :func:`temperature_thresholds`.  The filter is the same
    partitioning-independent mixed-id comparison as
    :func:`hash_sample` — no shuffle on the data path, identical
    survivors on every run and cluster size.

    Rows with a NULL source are dropped: they belong to no source, so
    no mixing rate applies to them (filter them beforehand to keep
    them).
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).count().collect()
        if r[0] is not None
    }
    _guard_source_vocab(len(counts), "temperature_mix")
    thresholds = temperature_thresholds(counts, temperature)
    if not thresholds:  # empty input: nothing to mix
        return df
    return _threshold_filter(df, source_col, id_col, thresholds, seed)


def _guard_source_vocab(n: int, op: str) -> None:
    if n > 10_000:
        raise ValueError(
            f"{n} distinct sources; {op} expects a small source "
            "vocabulary (languages/domains), not a key column"
        )


def _threshold_filter(
    df: DataFrame, source_col: str, id_col: str, thresholds: Dict, seed: int
) -> DataFrame:
    """Scan-side per-source hash filter shared by the mix samplers:
    keep a row iff ``mix(id, seed) < thresholds[source]`` via a sorted
    when-chain (NULL sources fall through the chain and are dropped —
    each caller's documented contract)."""
    pos = _mix(F.col(id_col).cast("long"), seed)
    thr = None
    for s, t in sorted(thresholds.items()):
        cond = F.col(source_col) == F.lit(s)
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
    return df.filter(pos < thr)


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with keep probability
    taken from ``weight_col`` (clamped to [0, 1]) — e.g. keep
    documents proportionally to a quality score.  A row survives iff
    ``mix(id) < floor(weight * 2^32)``: scan-side Catalyst filter,
    no shuffle, no RNG state, identical survivors on every run,
    partitioning, and cluster size."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    threshold = F.floor(w * F.lit(float(_MOD))).cast("long")
    return df.filter(_mix(F.col(id_col).cast("long"), seed) < threshold)


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    position_col: str = "pos",
    buckets: int = 1024,
) -> DataFrame:
    """Assign every row its position in a deterministic seed-keyed
    permutation of the whole dataset — the reproducible global shuffle
    a training pipeline runs before writing example order (re-running
    on any cluster layout yields the identical order; changing
    ``seed`` yields an unrelated one).

    The permutation is ascending ``(mix(id, seed), id)`` — the same
    public integer arithmetic as the rest of this module, so oracles
    replay it verbatim in SQL with ``ROW_NUMBER() OVER (ORDER BY ...)``.
    Positions are dense in ``[0, n)``.

    Scale path — no single-task global sort: the mix's hash space is
    cut into ``buckets`` equal ranges (the mix is uniform, so ranges
    are balanced regardless of id distribution), per-bucket row counts
    (one map-side-combined aggregate over the pruned id column) turn
    into cumulative offsets on the driver (``buckets`` integers), and
    positions are ``offset[bucket] + row_number() - 1`` under a
    per-bucket window.  One tiny aggregate + one balanced window
    exchange; parallelism equals ``buckets``, so set it at or above
    the cluster's core count for a 100 TB run.  Consumers that want
    physical order then range-write by ``position_col`` (e.g.
    ``sources.io.layout_for_scan``).

    Rows must carry non-negative int64 ids; rows SHARING an id are
    interchangeable in the permutation (their relative order within
    the shared slot range is arbitrary), matching the id contract of
    the other samplers here.  String ids that fail the long cast mix
    via ``xxhash64`` of the string instead (deterministic, oracles for
    castable ids unaffected); rows with a NULL id are DROPPED with the
    same rationale as the other samplers (no identity, no
    deterministic slot) — silently losing them through the offsets
    join, as an earlier version did, hid real data loss.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if position_col in df.columns:
        raise ValueError(f"column {position_col!r} already exists")
    spark = df.sparkSession
    df = df.where(F.col(id_col).isNotNull())
    # try_cast, not cast: ANSI mode (the default) throws on a malformed
    # string instead of yielding NULL for the coalesce to catch
    key = F.coalesce(
        F.col(id_col).try_cast("long"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(_MOD)),
    )
    mix = _mix(key, seed)
    width = (_MOD + buckets - 1) // buckets
    bucket = F.floor(mix / F.lit(width)).cast("long")
    # counts prune to the id column only; map-side combine collapses
    # each task's rows to <= `buckets` partial counts before the
    # (tiny) exchange
    counts = dict(
        df.select(bucket.alias("__b"))
        .groupBy("__b")
        .count()
        .collect()
    )
    offsets, acc = [], 0
    for b in range(buckets):
        c = counts.get(b, 0)
        if c:
            offsets.append((b, acc))
            acc += c
    offsets_df = spark.createDataFrame(
        offsets, "___b long, __offset long"
    ) if offsets else spark.createDataFrame([], "___b long, __offset long")
    w = Window.partitionBy("__b").orderBy("__mix", id_col)
    return (
        df.withColumn("__mix", mix)
        .withColumn("__b", bucket)
        .join(F.broadcast(offsets_df), F.col("__b") == F.col("___b"))
        .withColumn(
            position_col,
            (F.col("__offset") + F.row_number().over(w) - F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__mix", "__b", "___b", "__offset")
    )


def token_budget_thresholds(
    totals: Dict, budget: float, weights: Dict = None
) -> Dict:
    """Integer hash-space thresholds realizing a TOKEN-budget mix:
    source ``s`` should contribute ``weights[s]/sum(weights) * budget``
    cost units (tokens, chars, bytes — whatever ``totals`` measures),
    achieved by the per-row keep fraction ``min(1, target_s /
    totals[s])``.  Downsampling only: a source whose target exceeds its
    inventory is kept in full, never upsampled (repeat-epoch policy
    belongs to the training loop, not the corpus filter).

    Pure function of (totals, budget, weights) in plain double/int
    arithmetic — the DuckDB oracle recomputes it verbatim, so keep the
    operation order stable: ``target = budget * (w / wsum)``, ``frac =
    target / total``, ``threshold = int(frac * 2^32)``.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if not totals:  # empty input: nothing to mix
        return {}
    srcs = sorted(totals)
    if weights is None:
        weights = {s: 1.0 for s in srcs}
    wsum = float(sum(float(weights.get(s, 0.0)) for s in srcs))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0 over observed sources")
    out = {}
    for s in srcs:
        total = float(totals[s])
        if total <= 0:
            out[s] = 0
            continue
        target = float(budget) * (float(weights.get(s, 0.0)) / wsum)
        frac = target / total
        if frac > 1.0:
            frac = 1.0
        out[s] = int(frac * _MOD)
    return out


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    cost_col: str,
    budget: float,
    weights: Dict = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic mixture sampling against a TOTAL cost budget:
    keep documents so each source contributes approximately
    ``weights[s]/sum(weights) * budget`` of ``cost_col`` (token
    counts, chars, bytes), the way a training-data mix targets token
    contributions rather than document counts.

    Two passes, same shape as :func:`temperature_mix`: one
    map-side-combined per-source cost total (sources are a small
    vocabulary — the collected histogram is tiny), then a scan-side
    hash filter with per-source thresholds from
    :func:`token_budget_thresholds` — no shuffle on the data path,
    identical survivors on every run, partitioning, and cluster size.
    Because sampling is per document, each source's achieved cost
    concentrates around its target (a cost-exact selection would need
    a global sort); sources with less inventory than target are kept
    whole, never upsampled.  NULL sources are dropped.
    """
    totals = {
        # coalesce: a source whose every cost is NULL sums to NULL;
        # treat it as zero inventory (threshold 0, dropped) instead of
        # crashing float(None) in token_budget_thresholds.  The cost
        # column sums in its NATIVE type — a per-row long cast
        # truncated fractional costs (a source whose every row cost
        # < 1 summed to 0 and was dropped outright).
        r[0]: r[1] if r[1] is not None else 0
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(cost_col)).alias("t"))
        .collect()
        if r[0] is not None
    }
    _guard_source_vocab(len(totals), "token_budget_mix")
    thresholds = token_budget_thresholds(totals, budget, weights)
    if not thresholds:
        # Empty input OR every source NULL: either way no thresholds
        # exist, but NULL-source rows are still dropped per the
        # contract above (the when-chain does it implicitly on the
        # normal path).
        return df.filter(F.col(source_col).isNotNull())
    return _threshold_filter(df, source_col, id_col, thresholds, seed)
