"""Measurements that emit Spark DataFrames.

The privacy-critical physical details (reference
``measurements/spark_measurements.py:58-894``):

* every output is **sanitized**: repartitioned by ``rand()`` and sorted
  within partitions so row order / partitioning cannot leak input
  order, then materialized so noise is sampled exactly once
  (``utils/misc.sanitize_df``);
* noise UDFs are marked ``asNondeterministic()`` so Catalyst never
  re-executes, reorders, or pushes them down.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..base import Measurement
from ..domains import (
    SparkDataFrameDomain,
    SparkFloatColumnDescriptor,
    SparkGroupedDataFrameDomain,
    SparkIntegerColumnDescriptor,
)
from ..exact_number import ExactNumber, ExactNumberInput
from ..measures import ApproxDP, PureDP, RhoZCDP
from ..metrics import (
    OnColumn,
    RootSumOfSquared,
    SumOf,
    SymmetricDifference,
)
from ..utils.distributions import double_sided_geometric_cmf_exact
from ..utils.grouped_dataframe import GroupedDataFrame
from ..utils.misc import sanitize_df
from .noise import AddNoiseToSeries


class SparkMeasurement(Measurement):
    """Base for DataFrame-emitting measurements; handles sanitization."""

    sanitize_output: bool = True
    #: a-priori upper bound on the release's row count, when the caller
    #: knows one (grouped releases: the public-key count).  Passed to
    #: ``sanitize_df`` so the small/large freeze branch is chosen from
    #: a constant instead of an observed probe — see sanitize_df's
    #: accounting notes.  None = probe path.
    known_release_rows = None

    def call_unsanitized(self, data: Any) -> DataFrame:
        raise NotImplementedError

    def release_rows(self, data: Any):
        """A-priori row bound for this release, or None.  Overridden
        where the bound lives on the input (GroupedDataFrame.n_keys)."""
        return self.known_release_rows

    def __call__(self, data: Any) -> DataFrame:
        out = self.call_unsanitized(data)
        if not self.sanitize_output:
            return out
        return sanitize_df(out, known_rows=self.release_rows(data))


class AddNoiseToColumn(SparkMeasurement):
    """Add vectorized noise to one column of a grouped-aggregate DataFrame.

    Input metric is ``OnColumn(measure_column, SumOf|RootSumOfSquared(
    AbsoluteDifference()))`` — the metric produced by CountGrouped /
    SumGrouped.  The noise is attached as an Arrow-batched
    ``pandas_udf`` marked nondeterministic.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        measurement: AddNoiseToSeries,
        measure_column: str,
        known_release_rows=None,
    ):
        """``known_release_rows``: a-priori upper bound on the release
        row count (grouped releases: the public-key count), part of the
        measurement's declared construction so callers cannot forget it
        and silently fall back to the observed-probe freeze path."""
        if measure_column not in input_domain.schema:
            raise ValueError(f"Column {measure_column!r} not in domain")
        # The noise mechanism's scalar domain must match the column's
        # type (reference spark_measurements.py:190-199): integer noise
        # on a FLOAT statistic is not DP at all — the fractional part
        # passes through exactly — and float noise on an integer column
        # silently widens the release type.  The ungrouped path gets
        # this check for free from ChainTM's domain match; this is the
        # grouped path's equivalent (r16 review).
        from ..domains import (
            NumpyFloatDomain,
            NumpyIntegerDomain,
            SparkFloatColumnDescriptor,
            SparkIntegerColumnDescriptor,
        )

        desc = input_domain[measure_column]
        elem = measurement.input_domain.element_domain
        integral_col = isinstance(desc, SparkIntegerColumnDescriptor)
        float_col = isinstance(desc, SparkFloatColumnDescriptor)
        if (integral_col and not isinstance(elem, NumpyIntegerDomain)) or (
            float_col and not isinstance(elem, NumpyFloatDomain)
        ):
            from ..exceptions import DomainMismatchError

            raise DomainMismatchError(
                f"{measure_column} has descriptor {desc!r}, incompatible "
                f"with the noise measurement's element domain {elem!r}: "
                "discrete noise on a float statistic leaks the fractional "
                "part exactly"
            )
        l2 = isinstance(measurement.output_measure, RhoZCDP)
        from ..metrics import AbsoluteDifference

        metric = OnColumn(
            measure_column,
            RootSumOfSquared(AbsoluteDifference())
            if l2
            else SumOf(AbsoluteDifference()),
        )
        super().__init__(input_domain, metric, measurement.output_measure)
        self.measurement = measurement
        self.measure_column = measure_column
        self.known_release_rows = known_release_rows

    def privacy_function(self, d_in: Any) -> Any:
        return self.measurement.privacy_function(d_in)

    def _out_type(self) -> str:
        from .noise import AddGaussianNoise, AddLaplaceNoise

        # Laplace/Gaussian emit continuous values; geometric/discrete
        # Gaussian stay integral.
        return (
            "double"
            if isinstance(
                self.measurement.noise_mechanism,
                (AddLaplaceNoise, AddGaussianNoise),
            )
            else "long"
        )

    def __call__(self, data: DataFrame) -> DataFrame:
        """Grouped releases with a public-key row bound draw their
        noise DRIVER-side over the frozen pre-noise aggregate
        (:func:`~..utils.misc.freeze_noised_release`): one Spark job,
        no ArrowEvalPython stage, no REBALANCE exchange — the same
        single-invocation pattern :class:`GeometricPartitionSelection`
        ships.  Key sets above the small-release threshold (or callers
        without a bound) keep the executor pandas-UDF path unchanged."""
        if self.sanitize_output:
            from ..utils.misc import freeze_noised_release

            inner = self.measurement
            fn = None if inner.adds_no_noise else inner
            frozen = freeze_noised_release(
                data,
                [(self.measure_column, fn, self._out_type())],
                self.known_release_rows,
            )
            if frozen is not None:
                return frozen
        return super().__call__(data)

    def call_unsanitized(self, data: DataFrame) -> DataFrame:
        inner = self.measurement
        out_type = self._out_type()
        if inner.adds_no_noise:
            return data.withColumn(
                self.measure_column, F.col(self.measure_column).cast(out_type)
            )

        noise_udf = F.pandas_udf(
            lambda s: inner(s), returnType=out_type
        ).asNondeterministic()
        return data.withColumn(
            self.measure_column, noise_udf(F.col(self.measure_column))
        )


class ApplyInPandas(SparkMeasurement):
    """Run a pandas aggregation measurement on every group.

    The per-group function sees a pandas DataFrame (empty for public
    keys with no rows) and — **required contract** — must return
    exactly ``rows_per_group`` output rows per group.  Enforcement at
    release time is AGGREGATE-ONLY: the freeze branch declares
    ``n_keys * rows_per_group`` rows a priori and ``sanitize_df``
    raises ``AssertionError`` when the total exceeds that bound, so a
    per-group violation that nets out (one group over, another under)
    is NOT caught — honoring the per-group shape is the aggregation
    function's responsibility.  Every factory-built aggregation
    (quantile, bounds, ...) is one-row-per-group.  A custom
    multi-row-per-group aggregation must construct with
    ``rows_per_group=None`` to opt out into the observed-size freeze
    branch (then its release cardinality must not depend on any noise
    draw), or pass its exact per-group row count (>= 1).
    """

    def __init__(
        self,
        input_domain: SparkGroupedDataFrameDomain,
        input_metric,
        aggregation_function,  # an Aggregate: pd.DataFrame -> pd.DataFrame
        rows_per_group: Optional[int] = 1,
    ):
        super().__init__(
            input_domain, input_metric, aggregation_function.output_measure
        )
        self.aggregation_function = aggregation_function
        if rows_per_group is not None and rows_per_group < 1:
            raise ValueError(
                f"rows_per_group must be >= 1 or None (observed-size "
                f"opt-out), got {rows_per_group}"
            )
        self.rows_per_group = rows_per_group

    def privacy_function(self, d_in: Any) -> Any:
        return self.aggregation_function.privacy_function(d_in)

    def release_rows(self, data: GroupedDataFrame):
        # rows_per_group output rows per public group key: the bound is
        # a property of the keys, so the freeze branch needs no probe.
        # rows_per_group=None opts a multi-row aggregation out into the
        # observed-size branch (see class docstring).
        if self.rows_per_group is None:
            return None
        n_keys = getattr(data, "n_keys", None)
        return None if n_keys is None else n_keys * self.rows_per_group

    def call_unsanitized(self, data: GroupedDataFrame) -> DataFrame:
        agg = self.aggregation_function
        return data.apply_in_pandas(agg, agg.output_spark_schema)


class GeometricPartitionSelection(SparkMeasurement):
    """DP discovery of frequent distinct rows.

    groupBy all columns -> count -> add two-sided geometric noise ->
    keep rows with noisy count >= threshold.  ApproxDP guarantee (for
    d_in = 1): ``(1/alpha, 1 - CMF_alpha(threshold - 2))``; larger
    d_in composes as ``(d eps, d e^{d eps} delta)`` (reference
    ``spark_measurements.py:439-495``).

    At scale this is a single map-side-combined shuffle on the
    grouping columns; the noise+filter run on the aggregated relation.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        threshold: int,
        alpha: ExactNumberInput,
        count_column: Optional[str] = None,
    ):
        for name, desc in input_domain.schema.items():
            if isinstance(desc, SparkFloatColumnDescriptor):
                raise ValueError(f"Float column {name!r} not allowed")
        self.alpha = ExactNumber(alpha)
        if self.alpha < 0:
            raise ValueError("alpha must be >= 0")
        if int(threshold) != threshold:
            raise ValueError("threshold must be integral")
        self.threshold = int(threshold)
        self.count_column = count_column or "count"
        if self.count_column in input_domain.schema:
            raise ValueError(f"count_column {self.count_column!r} collides")
        super().__init__(input_domain, SymmetricDifference(), ApproxDP())
        out_schema = dict(input_domain.schema)
        out_schema[self.count_column] = SparkIntegerColumnDescriptor(size=64)
        self.output_domain = SparkDataFrameDomain(out_schema)

    def privacy_function(self, d_in: Any):
        d = ExactNumber(d_in)
        if d < 0:
            raise ValueError("d_in must be >= 0")
        if d == 0:
            return (ExactNumber(0), ExactNumber(0))
        if self.alpha == 0:
            return (ExactNumber(float("inf")), ExactNumber(0))
        import sympy as sp

        base_eps = ExactNumber(1) / self.alpha
        base_delta = ExactNumber(1) - double_sided_geometric_cmf_exact(
            self.threshold - 2, self.alpha
        )
        if d == 1:
            return (base_eps, base_delta)
        eps = d * base_eps
        delta = d * ExactNumber(sp.exp(eps.expr)) * base_delta
        if delta > 1:
            delta = ExactNumber(1)
        return (eps, delta)

    def _pre_noise_counts(self, data: DataFrame) -> DataFrame:
        cols = list(self.input_domain.schema)
        return data.groupBy(*cols).agg(F.count(F.lit(1)).alias(self.count_column))

    def _noise_and_filter(self, counts: DataFrame) -> DataFrame:
        from .noise import AddGeometricNoise

        if self.alpha == 0:
            noisy = counts
        else:
            mech = AddNoiseToSeries(AddGeometricNoise(self.alpha))
            udf = F.pandas_udf(
                lambda s: mech(s), returnType="long"
            ).asNondeterministic()
            noisy = counts.withColumn(
                self.count_column, udf(F.col(self.count_column))
            )
        return noisy.filter(F.col(self.count_column) >= self.threshold)

    def call_unsanitized(self, data: DataFrame) -> DataFrame:
        return self._noise_and_filter(self._pre_noise_counts(data))

    def __call__(self, data: DataFrame) -> DataFrame:
        """Release with a noise-independent freeze branch (r14).

        The release cardinality here depends on the noise draws (only
        groups whose NOISY count clears the threshold survive), so the
        base class's observed-size freeze branch would observe a
        discarded mechanism invocation.  Instead, ONE fused job
        (scan + map-side combine + shuffle + limit collect) freezes the
        PRE-noise candidate relation: no noise draw exists yet, so
        nothing observed here depends on any draw, the small/large
        branch below is a function of the data alone, and no mechanism
        invocation is ever discarded on either path.

        Small candidate sets (<= SMALL_RELEASE_ROWS, the overwhelmingly
        common case — candidates are group-cardinality-sized) then draw
        their noise DRIVER-side through the same
        :class:`AddNoiseToSeries` mechanism the executor path runs
        (one invocation, certified sampler) and release an immutable
        local relation — the whole measurement is one Spark job.  A
        huge candidate set forces the large parquet branch with
        ``known_rows`` = the exact candidate count (> the small
        threshold by construction, still noise-independent).
        """
        if not self.sanitize_output:
            return self.call_unsanitized(data)
        from ..utils import misc as _misc

        counts = self._pre_noise_counts(data)
        head = counts.limit(_misc.SMALL_RELEASE_ROWS + 1).toArrow()
        if head.num_rows <= _misc.SMALL_RELEASE_ROWS:
            return self._release_from_candidates(
                data.sparkSession, head, counts.schema
            )
        # Rare huge-candidate-set path: re-aggregate once into a
        # persisted relation (the raw input pays one more scan total),
        # draw noise on executors, freeze as one parquet write.  The
        # cache check keeps ownership with the caller: Spark's
        # CacheManager is keyed by plan, so unpersisting here would
        # otherwise drop a caller's cache of the identical aggregate.
        already_cached = counts.is_cached
        if not already_cached:
            counts = counts.persist()
        try:
            return sanitize_df(
                self._noise_and_filter(counts), known_rows=counts.count()
            )
        finally:
            if not already_cached:
                counts.unpersist()

    def _release_from_candidates(self, spark, head, schema) -> DataFrame:
        """Driver-side noise + threshold over the frozen candidate
        Arrow table: the same mechanism object the executor path wraps
        in a pandas UDF, applied once to <= SMALL_RELEASE_ROWS counts.
        Row order is the canonical all-columns sort — a function of the
        released values only, so it cannot leak input order — and the
        result embeds as an immutable JVM ``LocalTableScan`` exactly
        like every other small release.

        The GROUP columns never round-trip through pandas: a nullable
        int64 group column (e.g. 64-bit hash ids with a null group)
        would coerce to float64 there and silently corrupt keys above
        2^53.  Only the count column — int64 and non-null by
        construction (it is ``F.count``'s output) — is handed to the
        mechanism as a pandas Series; everything else stays Arrow."""
        import pyarrow as pa

        from .noise import AddGeometricNoise

        counts = head.column(self.count_column).to_pandas()
        if self.alpha != 0 and head.num_rows:
            mech = AddNoiseToSeries(AddGeometricNoise(self.alpha))
            counts = mech(counts).astype("int64")
        idx = head.schema.get_field_index(self.count_column)
        tbl = head.set_column(
            idx, head.schema.field(idx), pa.array(counts, pa.int64())
        )
        tbl = tbl.filter(pa.array(counts >= self.threshold))
        tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
        return spark.createDataFrame(tbl, schema=schema)


class SparseVectorPrefixSums(SparkMeasurement):
    """AboveThreshold / SVT over ranked per-group bin counts.

    For each group: compute the noisy total (geometric noise at scale
    ``alpha/2``), set the threshold to ``threshold_fraction`` of it,
    add geometric noise at scale ``alpha`` to every rank-ordered prefix
    sum, and release the first rank whose noisy prefix crosses the
    threshold.  PureDP: ``privacy_function(d) = 4 d / alpha``
    (reference ``spark_measurements.py:590-736``).

    Physical plan: one windowed prefix sum partitioned by group (the
    input here is already a tiny bin-count relation, <=201 rows per
    group), one per-group aggregate for totals joined back, noise via
    nondeterministic pandas UDFs, then a min() pick per group.
    """

    def __init__(
        self,
        input_domain: SparkDataFrameDomain,
        count_column: str,
        rank_column: str,
        alpha,
        grouping_columns=None,
        threshold_fraction: float = 0.95,
        known_input_rows: Optional[int] = None,
    ):
        """``known_input_rows``: a-priori upper bound on the bin-count
        input's TOTAL row count when the caller knows one — for the
        bounds factory the input is the public rank grid 0-fill-joined
        per public group key, so the bound is (#ranks) x (#keys), a
        public constant.  With the bound declared (and unique ranks
        per group, verified pre-draw), the whole SVT release runs
        DRIVER-side over one collected Arrow table: one Spark job, no
        window/join stages, no ArrowEvalPython stages, same mechanisms
        invoked once each.  ``None`` keeps the distributed path."""
        from ..metrics import AbsoluteDifference as _AD

        grouping_columns = list(grouping_columns or [])
        for c in (count_column, rank_column, *grouping_columns):
            if c not in input_domain.schema:
                raise ValueError(f"Column {c!r} not in domain")
        if count_column in grouping_columns or rank_column in grouping_columns:
            raise ValueError("Grouping columns cannot contain count/rank columns")
        self.alpha = ExactNumber(alpha)
        if self.alpha < 0:
            raise ValueError("alpha must be >= 0")
        if not 0 < threshold_fraction <= 1:
            raise ValueError("threshold_fraction must be in (0, 1]")
        super().__init__(
            input_domain,
            OnColumn(count_column, SumOf(_AD())),
            PureDP(),
        )
        self.count_column = count_column
        self.rank_column = rank_column
        self.grouping_columns = grouping_columns
        self.threshold_fraction = threshold_fraction
        self.known_input_rows = known_input_rows

    def privacy_function(self, d_in: Any) -> ExactNumber:
        d = ExactNumber(d_in)
        if d < 0:
            raise ValueError("d_in must be >= 0")
        if d == 0:
            return ExactNumber(0)
        if self.alpha == 0:
            return ExactNumber(float("inf"))
        return ExactNumber(4) * d / self.alpha

    def release_rows(self, data: DataFrame):
        # exactly one released row per group PRESENT in the input — a
        # function of the data alone (no noise draw moves a group in or
        # out of the release), so the freeze branch needs no probe.
        # The input here is a tiny bin-count relation by construction,
        # so the extra distinct-count job is negligible.
        if self.grouping_columns:
            return data.select(*self.grouping_columns).distinct().count()
        return 1

    def _driver_release(self, data: DataFrame) -> Optional[DataFrame]:
        """DRIVER-side SVT release over one collected Arrow table.

        Eligible when the caller declared ``known_input_rows`` (the
        bounds factory's public (#ranks) x (#keys) grid) at or below
        the small-release gate.  One Spark job (the bounded collect of
        the pre-noise bin counts) replaces the distributed plan's
        group-count job, totals-count job, window, join, REBALANCE
        exchange, and two ArrowEvalPython stages.  The release law is
        identical: the same two :class:`AddNoiseToSeries` mechanisms
        are invoked exactly once each over the same vectors (per-group
        totals; rank-ordered prefix sums), and the pick rule — the
        minimum rank whose noisy prefix crosses ``threshold_fraction``
        of the noisy total, else the maximum rank — is unchanged.

        Returns ``None`` (fall back to the distributed path, BEFORE
        any draw) when: no bound / bound over the gate, a column type
        outside the Arrow driver-release set, nulls in any used
        column, or duplicate (group, rank) pairs.  The bound and every
        bail-out condition are functions of the public grid or of the
        pre-noise data alone, never of a draw, so the branch adds no
        observation and each mechanism still runs exactly once.  Row
        order is the canonical all-columns sort of the released values
        and the result embeds as an immutable ``LocalTableScan`` — the
        same freeze contract as ``sanitize_df``'s small branch.
        """
        from ..utils.misc import SMALL_RELEASE_ROWS, _DRIVER_RELEASE_TYPES

        bound = self.known_input_rows
        if bound is None or bound > SMALL_RELEASE_ROWS:
            return None
        gcols = self.grouping_columns
        rank, cnt = self.rank_column, self.count_column
        used = [*gcols, rank, cnt]
        narrow = data.select(*used)
        for fld in narrow.schema.fields:
            if fld.dataType.simpleString() not in _DRIVER_RELEASE_TYPES:
                return None

        import numpy as np
        import pyarrow as pa

        from .noise import AddGeometricNoise

        head = narrow.limit(bound + 1).toArrow()
        if head.num_rows > bound:
            raise AssertionError(
                f"SVT input produced more than the declared "
                f"known_input_rows={bound} rows (>= {head.num_rows}); "
                "the bin-count relation must have at most one row per "
                "public (group, rank) pair"
            )
        if any(head.column(c).null_count for c in used):
            return None
        pdf = head.to_pandas()
        # unique rank per (group,) row — guaranteed for the factory's
        # 0-filled public grid, verified pre-draw for external callers
        if pdf.duplicated(subset=[*gcols, rank]).any():
            return None
        pdf = pdf.sort_values([*gcols, rank], kind="mergesort").reset_index(
            drop=True
        )

        if gcols:
            grouped = pdf.groupby(gcols, sort=True, dropna=False)
            totals = grouped[cnt].sum()
            prefix = grouped[cnt].cumsum()
            group_codes = grouped.ngroup().to_numpy()
        else:
            import pandas as pd

            totals = pd.Series([pdf[cnt].sum()])
            prefix = pdf[cnt].cumsum()
            group_codes = np.zeros(len(pdf), dtype=np.int64)

        if self.alpha == 0:
            noisy_totals = totals.astype("float64")
            noisy_prefix = prefix.to_numpy()
        else:
            total_mech = AddNoiseToSeries(AddGeometricNoise(self.alpha / 2))
            prefix_mech = AddNoiseToSeries(AddGeometricNoise(self.alpha))
            noisy_totals = total_mech(totals.astype("int64"))
            noisy_prefix = prefix_mech(prefix.astype("int64")).to_numpy()
        thresholds = (
            float(self.threshold_fraction) * noisy_totals.to_numpy().astype("float64")
        )
        ranks = pdf[rank].to_numpy()
        crossed = noisy_prefix >= thresholds[group_codes]
        n_groups = len(thresholds)
        picked = np.empty(n_groups, dtype=ranks.dtype)
        for g in range(n_groups):
            mask = group_codes == g
            hits = ranks[mask][crossed[mask]]
            picked[g] = hits.min() if hits.size else ranks[mask].max()

        out_fields = [narrow.schema[c] for c in gcols] + [narrow.schema[rank]]
        out_schema = T.StructType(out_fields)
        arrays = []
        if gcols:
            key_rows = totals.index
            for i, c in enumerate(gcols):
                vals = (
                    key_rows.get_level_values(i)
                    if len(gcols) > 1
                    else key_rows
                )
                arrays.append(
                    pa.array(list(vals), type=head.schema.field(c).type)
                )
        arrays.append(pa.array(picked, type=head.schema.field(rank).type))
        tbl = pa.table(arrays, names=[*gcols, rank])
        tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
        return data.sparkSession.createDataFrame(tbl, schema=out_schema)

    def __call__(self, data: DataFrame) -> DataFrame:
        """Sanitized release with the input persisted for the call.

        The bin-count input plan is referenced four times per release —
        the group-count job (``release_rows``), the totals size-gate
        count, and twice inside the freeze job (the totals side and the
        prefix side of the join) — and the plan BEHIND it is typically
        a full scan+aggregate of raw data (``create_bounds_measurement``
        bins the measure column upstream).  The input itself is tiny by
        construction (<= 201 bins per group), so persisting it for the
        duration of the call cuts four upstream evaluations to one at
        no memory risk; the release is already frozen when ``sanitize_df``
        returns, so the unpersist cannot unfreeze anything.

        Measured trade (sf0.1 bounds workload, idle 32-core box): the
        persist costs ~0.15 s of constant cache/job overhead per
        release (min 1.07 s vs 0.89 s unpersisted) while replacing
        three additional full scans of the upstream plan with cache
        reads — a small loss at 600k rows, the only sane plan when the
        upstream is a 100 TB scan+aggregate.

        With ``known_input_rows`` declared (r18), the whole release
        instead runs driver-side over ONE collected Arrow table — see
        :meth:`_driver_release`; ineligible inputs keep the persisted
        distributed path below unchanged.
        """
        if not self.sanitize_output:
            return self.call_unsanitized(data)
        frozen = self._driver_release(data)
        if frozen is not None:
            return frozen
        from pyspark.storagelevel import StorageLevel

        # Cache ownership stays with the caller: if the input is
        # already persisted, re-persisting would be a no-op but the
        # finally-unpersist would DROP the caller's cache entry and
        # force every later use to re-run the full upstream plan.
        already_cached = data.is_cached
        if not already_cached:
            data = data.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return sanitize_df(
                self.call_unsanitized(data), known_rows=self.release_rows(data)
            )
        finally:
            if not already_cached:
                data.unpersist()

    def call_unsanitized(self, data: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        from .noise import AddGeometricNoise, AddNoiseToSeries

        gcols = self.grouping_columns
        rank, cnt = self.rank_column, self.count_column
        frac = self.threshold_fraction

        if self.alpha == 0:
            noise_total = noise_prefix = lambda c: c
        else:
            total_mech = AddNoiseToSeries(AddGeometricNoise(self.alpha / 2))
            prefix_mech = AddNoiseToSeries(AddGeometricNoise(self.alpha))
            total_udf = F.pandas_udf(
                lambda s: total_mech(s), returnType="long"
            ).asNondeterministic()
            prefix_udf = F.pandas_udf(
                lambda s: prefix_mech(s), returnType="long"
            ).asNondeterministic()
            noise_total = total_udf
            noise_prefix = prefix_udf

        # per-group noisy totals (one noise draw per group)
        agg_exprs = [F.sum(cnt).alias("__total")]
        if gcols:
            totals = data.groupBy(*gcols).agg(*agg_exprs)
            # size-gate the per-group totals broadcast: group count is
            # unbounded, so count the PRE-noise aggregate (no released
            # draw depends on it) and fall back to a shuffle join for
            # huge group sets instead of an unbounded broadcast
            n_groups = totals.count()
        else:
            totals = data.agg(*agg_exprs)
            n_groups = 1
        totals = totals.withColumn(
            "__noisy_threshold",
            (F.lit(frac) * noise_total(F.col("__total"))).cast("double"),
        ).drop("__total")

        w = (
            Window.partitionBy(*gcols).orderBy(rank)
            if gcols
            else Window.partitionBy().orderBy(rank)
        )
        prefixed = data.withColumn(
            "__prefix", noise_prefix(F.sum(cnt).over(w).cast("long"))
        )
        from tumult_core_spark.utils.scale import broadcast_below

        totals_hinted = broadcast_below(
            totals, n_groups, est_row_bytes=32 * len(gcols) + 48
        )
        if gcols:
            joined = prefixed.join(totals_hinted, on=gcols, how="inner")
        else:
            joined = prefixed.crossJoin(totals_hinted)

        crossing = F.when(
            F.col("__prefix") >= F.col("__noisy_threshold"), F.col(rank)
        )
        max_rank = F.max(rank)
        if gcols:
            picked = joined.groupBy(*gcols).agg(
                F.coalesce(F.min(crossing), max_rank).alias(rank)
            )
        else:
            picked = joined.agg(
                F.coalesce(F.min(crossing), max_rank).alias(rank)
            )
        return picked
