"""Session helpers and output sanitization / materialization.

``sanitize_df`` implements the measurement-boundary hardening the
reference performs via a ``saveAsTable`` round-trip
(``tmlt/core/measurements/spark_measurements.py:58-76,877-894``,
``utils/misc.py:88-105``): destroy row-order / partitioning side
channels and **freeze the sampled noise** so Spark retries or lazy
re-evaluation can never re-sample it.  We materialize via a parquet
write + read-back, which works identically on a real cluster (shared
storage) and in local mode.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MATERIALIZE_ROOT: Optional[str] = None


def get_spark(app_name: str = "tumult_core_spark", cpus: Optional[int] = None) -> SparkSession:
    """Standard local session with the scale-appropriate config."""
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # progress bars interleave carriage returns into harness stdout
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _materialize_root() -> str:
    global _MATERIALIZE_ROOT
    if _MATERIALIZE_ROOT is None:
        configured = os.environ.get("SPARK_GRAFT_MATERIALIZE_DIR")
        if configured:
            # shared-storage root (hdfs://, s3a://, or a shared mount):
            # one session-scoped subdir; cleanup belongs to the
            # deployment's retention policy, not a local atexit hook
            _MATERIALIZE_ROOT = (
                configured.rstrip("/") + "/tcs_materialize_" + uuid.uuid4().hex
            )
        else:
            _MATERIALIZE_ROOT = tempfile.mkdtemp(prefix="tcs_materialize_")
            atexit.register(shutil.rmtree, _MATERIALIZE_ROOT, ignore_errors=True)
    return _MATERIALIZE_ROOT


def materialize(df: DataFrame) -> DataFrame:
    """Write ``df`` to parquet and read it back, forcing one evaluation.

    The write root defaults to a driver-local temp dir (correct for
    local mode, where driver and executors share a filesystem).  On a
    real cluster set ``SPARK_GRAFT_MATERIALIZE_DIR`` to a
    distributed-FS path (hdfs://, s3a://, or a shared mount) — every
    executor must be able to write it and the driver to read it back.
    This is the only place measurement plans are forced.
    """
    path = _materialize_root() + "/" + uuid.uuid4().hex
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def cut_lineage(df: DataFrame, checkpoint_dir: Optional[str] = None) -> DataFrame:
    """Break lineage for one round of an iterative operator.

    Default (``checkpoint_dir=None``): ``localCheckpoint(eager=True)``
    — the fastest cut, but its blocks live only on the executors that
    computed them, so on a real cluster a single lost executor kills
    the whole iterative job (no lineage left to recompute from).  Fine
    on local[N]; NOT fault-tolerant at 1000 executors.

    With ``checkpoint_dir`` set: a RELIABLE ``checkpoint()`` into that
    directory (``sc.setCheckpointDir`` is applied on first use) —
    survives executor loss at the cost of one distributed-FS
    round-trip per iteration.  Point it at HDFS/S3 on a cluster; any
    shared path works on local mode.  Set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` to have
    consumed rounds' files reclaimed automatically.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    cur_val = current.get() if current.isDefined() else None
    # setCheckpointDir appends a fresh UUID subdir each call — only
    # (re)set when unset or pointed elsewhere, so every round of the
    # loop shares one directory.  The comparison is the path-normalized
    # PARENT of the stored UUID subdir (a substring test would treat
    # /a/ckpt2 as already-set when /a/ckpt is stored, and vice versa).
    # NOTE: the checkpoint directory is SparkContext-global — two
    # concurrent iterative jobs on one session that pass different
    # ``checkpoint_dir``s will ping-pong the setting; give them the
    # same directory (the UUID subdirs keep their files apart).
    if cur_val is None or _checkpoint_parent(cur_val) != _strip_file_scheme(
        checkpoint_dir
    ):
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def _strip_file_scheme(path: str) -> str:
    """Normalize a local path or file: URI for equality comparison.

    The stored checkpoint dir comes back as an absolute ``file:/`` URI,
    so a relative caller path must be made absolute too or the equality
    test never matches and every round re-invokes ``setCheckpointDir``
    (a fresh UUID subdir per iteration).
    """
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return os.path.normpath(path[len(prefix):])
    if "://" in path:
        # non-local scheme (hdfs://, s3a://, ...): keep verbatim —
        # normpath would collapse the scheme's double slash
        return path
    return os.path.normpath(os.path.abspath(path))


def _checkpoint_parent(stored: str) -> str:
    """Parent of the UUID subdir SparkContext stores as its checkpoint
    dir, normalized like :func:`_strip_file_scheme`'s output."""
    return os.path.dirname(_strip_file_scheme(stored))


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the block-manager storage behind a ``localCheckpoint``ed
    DataFrame that will NEVER be used again.

    ``localCheckpoint`` pins its blocks until the backing RDD is
    garbage-collected on the JVM side, which through the py4j reference
    graph can lag by many seconds — an iterative operator that
    checkpoints per round (connected components, distributed BPE)
    otherwise accumulates every round's blocks for the whole job and
    repeated runs inherit each other's heap pressure (the observed
    2-3x wall-clock variance of the components benchmark).  The
    checkpointed RDD is exactly the ``LogicalRDD`` of the analyzed
    plan, so it can be dropped deterministically.  After this call any
    action on ``df`` raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — only
    call it once the frame is dead.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover - best-effort cleanup
        pass


#: Releases at or below this many rows freeze as a driver-built Arrow
#: local relation (``LocalTableScan``) instead of a parquet round-trip.
#: Typical DP releases are group-keys-sized (dozens to thousands of
#: rows) and the parquet write/commit/re-read dominated their
#: wall-clock (~0.7 s per release measured at 6 rows); 50k rows keeps
#: the driver transfer bounded (~tens of MB worst case) while covering
#: every grouped release the factories produce short of full
#: histograms.
SMALL_RELEASE_ROWS = 50_000


def sanitize_df(
    df: DataFrame,
    materialize_output: bool = True,
    known_rows: Optional[int] = None,
) -> DataFrame:
    """Randomize partitioning and row order, then freeze the result.

    Steps: add a ``rand()`` column, repartition on it (destroys any
    data-dependent partitioning), sort within partitions by all output
    columns (destroys residual input order), drop the helper column,
    then freeze so nondeterministic noise is sampled exactly once.

    Freezing holds on any cluster because each path has exactly ONE
    release point.  ``limit(SMALL_RELEASE_ROWS + 1).toArrow()`` probes
    the size: when the release fits (the common group-keys-sized case)
    the collected Arrow table IS the frozen result —
    ``createDataFrame(pa.Table)`` embeds it in the plan as an immutable
    JVM ``LocalTableScan`` (NOT a Python-RDD scan: re-reads cost
    ~10 ms, the relation broadcasts for free in downstream joins, and
    the Arrow path round-trips nulls/NaN/date/decimal/nested types
    exactly — all pinned by tests).  A larger release instead runs ONE
    self-contained parquet write job (:func:`materialize`) and the
    written files define the frozen release; the probe's sampled values
    are discarded unobserved (running a mechanism twice and releasing
    only one run's output is still one invocation of the mechanism), so
    there is no cache or multi-job dependency that a lost executor
    could invalidate — frozen-once holds on a real cluster, not just
    local mode.

    **Noise-independent branching (``known_rows``):** when the caller
    knows an a-priori upper bound on the release cardinality — every
    grouped release with PUBLIC group keys has at most one row per
    declared key, so the bound is a property of the public keys, not
    of the data or the noise — pass it as ``known_rows`` and the
    small/large branch is chosen from that constant.  No observed
    quantity influences the branch, so the single-invocation
    accounting is exact.  A collected count EXCEEDING ``known_rows``
    raises (a caller bug, never a data-dependent event, since both
    sides are functions of the public keys).

    **Every shipped measurement branches on a noise-independent bound**
    (r14): grouped releases pass the public-key count, SVT passes the
    input's group count, and partition selection never reaches the
    probe at all — its own ``__call__`` freezes the PRE-noise
    candidate relation in one job and draws its noise driver-side
    (small case) or passes ``known_rows`` = the exact candidate count
    (huge case).  Each bound is a function of the public keys or of
    the data alone, never of a noise draw, so no release path
    observes a discarded mechanism invocation and the
    single-invocation accounting is exact everywhere.  The observed-size probe below
    (``known_rows=None``) remains only as a fallback for EXTERNAL
    callers; its branch choice observes the probe's row count, so a
    caller whose release cardinality depends on a noise draw must
    supply a noise-independent ``known_rows`` instead (as the shipped
    measurements do) or account for the extra observation themselves.
    The probe re-computes ≤50k rows of upstream plan on the large
    path; large releases are rare and aggregate-shaped, so the extra
    partial pass is noise next to the full write.  50k rows of a
    grouped release is far below driver memory; anything bigger
    belongs in parquet on shared storage anyway.
    """
    cols = df.columns
    # A release column literally named "__shuffle_key" must survive:
    # derive a name guaranteed absent from the schema.
    shuffle_key = get_nonconflicting_string(cols)
    shuffled = (
        df.withColumn(shuffle_key, F.rand())
        # REBALANCE (not plain repartition): same privacy effect — a full
        # shuffle keyed on rand() — but AQE right-sizes the partition
        # count to the data.  A 3k-row aggregate release collapses to one
        # output file instead of `shuffle.partitions` near-empty ones
        # (the parquet write+read in materialize() was dominated by
        # per-file commit overhead), while a 100 TB release still fans
        # out to target-sized partitions.
        .hint("REBALANCE", shuffle_key)
        # backticks: column names may contain dots/parens (e.g. "q0.9(x)")
        .sortWithinPartitions(*[F.col(f"`{c}`") for c in cols])
        .drop(shuffle_key)
    )
    if not materialize_output:
        return shuffled
    if known_rows is not None:
        # branch chosen from the a-priori cardinality bound: nothing
        # observed (known_rows is an UPPER bound — GroupBy dedups the
        # public keys, so a caller-supplied key list may overcount)
        if known_rows <= SMALL_RELEASE_ROWS:
            # limit() bounds the driver collect even when the caller's
            # bound is wrong (a buggy aggregation emitting millions of
            # rows must raise below, not OOM the driver first); in the
            # correct case the relation has <= known_rows rows and the
            # limit is a no-op
            head = shuffled.limit(known_rows + 1).toArrow()
            if head.num_rows > known_rows:
                # the limit() caps the collect at known_rows + 1, so the
                # true release size is unknown — only that it exceeds
                # the declared bound
                raise AssertionError(
                    f"release produced more than the declared "
                    f"known_rows={known_rows} rows (>= {head.num_rows}); "
                    "grouped releases must have at most one row per "
                    "public group key"
                )
            return df.sparkSession.createDataFrame(head, schema=shuffled.schema)
        return materialize(shuffled)
    head = shuffled.limit(SMALL_RELEASE_ROWS + 1).toArrow()
    if head.num_rows <= SMALL_RELEASE_ROWS:
        return df.sparkSession.createDataFrame(head, schema=shuffled.schema)
    return materialize(shuffled)


def coerce_lit(value, data_type):
    """A typed literal Column for ``value`` cast to ``data_type``."""
    return F.lit(value).cast(data_type)


#: Spark simpleString type names sortable/collectable through the Arrow
#: driver-release path below (primitive, pa.Table.sort_by-supported).
_DRIVER_RELEASE_TYPES = frozenset(
    {
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "string", "boolean", "date", "timestamp", "timestamp_ntz",
    }
)


def freeze_noised_release(df, noise_specs, known_rows):
    """Freeze a small grouped noisy release with DRIVER-side noise.

    ``df`` is the PRE-noise release relation (e.g. the 0-filled grouped
    aggregate), ``known_rows`` the caller's a-priori public-key row
    bound, and ``noise_specs`` an ordered list of
    ``(column, series_fn, out_type)`` — ``series_fn`` a
    ``pd.Series -> pd.Series`` mechanism (:class:`AddNoiseToSeries`)
    or ``None`` for a pure cast, ``out_type`` ``"long"`` / ``"double"``.

    Returns the frozen release, or **None when ineligible** (caller
    falls back to the executor pandas-UDF path + :func:`sanitize_df`):
    no bound, bound over :data:`SMALL_RELEASE_ROWS`, a non-primitive
    column type, or nulls in a noise column.  Every ineligibility check
    runs BEFORE any mechanism invocation, so bailing out never discards
    a draw and the executor fallback is still the mechanism's single
    invocation.

    Why: the executor path runs one ``ArrowEvalPython`` stage plus a
    ``REBALANCE`` exchange per release just to noise a public-key-sized
    relation (dozens-to-thousands of rows) — each a full Python-runner
    round trip.  For a release whose row bound is a public constant,
    the same mechanism applied ONCE driver-side to the collected
    pre-noise Arrow table is the identical distribution with zero
    Python stages and zero extra exchanges; this is exactly the
    pattern :class:`GeometricPartitionSelection` has shipped since r14
    (``_release_from_candidates``).  The accounting is unchanged: the
    branch is chosen from ``known_rows`` (noise-independent), nothing
    observed here depends on a draw, and each mechanism is invoked
    exactly once.  Row order is the canonical all-columns sort of the
    RELEASED values — a function of the release alone, so it carries
    no input-order side channel — and the result embeds as an
    immutable JVM ``LocalTableScan``, so the noise is frozen (re-reads
    cannot re-sample).  At scale nothing changes: key sets above
    :data:`SMALL_RELEASE_ROWS` keep the distributed executor path.
    """
    if known_rows is None or known_rows > SMALL_RELEASE_ROWS:
        return None
    for fld in df.schema.fields:
        if fld.dataType.simpleString() not in _DRIVER_RELEASE_TYPES:
            return None
    spec_cols = {c for c, _, _ in noise_specs}
    if not spec_cols.issubset(set(df.columns)):
        return None

    import pyarrow as pa
    from pyspark.sql import types as T

    head = df.limit(known_rows + 1).toArrow()
    if head.num_rows > known_rows:
        raise AssertionError(
            f"release produced more than the declared "
            f"known_rows={known_rows} rows (>= {head.num_rows}); "
            "grouped releases must have at most one row per "
            "public group key"
        )
    # nulls in a spec column (impossible for the 0-filled factory
    # releases) would reach the mechanism as NaN — or silently turn
    # null into NaN on a pure cast: bail out pre-draw either way
    for col, _, _ in noise_specs:
        if head.column(col).null_count:
            return None

    target_fields = []
    by_name = {c: (fn, out_type) for c, fn, out_type in noise_specs}
    for fld in df.schema.fields:
        if fld.name in by_name:
            out_type = by_name[fld.name][1]
            dt = T.LongType() if out_type == "long" else T.DoubleType()
            target_fields.append(T.StructField(fld.name, dt, fld.nullable))
        else:
            target_fields.append(fld)
    target_schema = T.StructType(target_fields)

    for col, fn, out_type in noise_specs:
        ser = head.column(col).to_pandas()
        if fn is not None:
            ser = fn(ser)
        pa_type = pa.int64() if out_type == "long" else pa.float64()
        idx = head.schema.get_field_index(col)
        arr = pa.array(ser.to_numpy(), type=pa_type)
        head = head.set_column(idx, pa.field(col, pa_type), arr)
    head = head.sort_by([(c, "ascending") for c in head.column_names])
    return df.sparkSession.createDataFrame(head, schema=target_schema)


_LOCAL_ROWS_PER_PARTITION = 25_000


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A small driver-known row list as a JVM-local relation.

    ``spark.createDataFrame(list)`` routes through ``parallelize`` +
    ``applySchemaToPythonRDD``: every *evaluation* of the relation runs
    one near-empty **Python** task per default-parallelism partition
    (~150-300 ms of Python-runner round trip each on a warm worker),
    and public-key relations are evaluated several times per
    measurement — the 0-fill left join, the apply semi/anti joins, the
    release freeze.  Building the same rows as a pyarrow Table instead
    embeds them as an immutable JVM ``LocalTableScan`` (the same
    mechanism :func:`sanitize_df` uses for frozen releases): zero
    Python tasks, no parallelize stage, and a ``coalesce`` sized to the
    row count keeps every downstream stage of the keys' lineage (the
    per-group noise UDF above the fill join) at one task per ~25k rows
    instead of one near-empty task per core.  At scale nothing changes:
    key grids too large for the driver are built distributed
    (``compute_full_domain_df``'s crossJoin branch) and never pass
    through here.

    Falls back to the classic ``createDataFrame`` for values the Arrow
    bridge cannot represent; the result is identical either way (the
    relation is the same multiset of rows).
    """
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(schema)
        arrays = [
            pa.array([row[i] for row in rows], type=arrow_schema.field(i).type)
            for i in range(len(arrow_schema))
        ]
        tbl = pa.Table.from_arrays(arrays, schema=arrow_schema)
        df = spark.createDataFrame(tbl, schema=schema)
    except Exception:  # exotic types: keep the classic path
        df = spark.createDataFrame(rows, schema=schema)
    n_part = max(1, -(-len(rows) // _LOCAL_ROWS_PER_PARTITION))
    default_par = spark.sparkContext.defaultParallelism
    return df.coalesce(min(n_part, default_par))


def get_nonconflicting_string(strs) -> str:
    """A string guaranteed distinct from every input (reference
    ``utils/misc.py:19-26``): one character longer than the longest
    input can never collide."""
    longest = max((len(s) for s in strs), default=0)
    return "A" * (longest + 1)


def print_sdf(sdf: DataFrame) -> None:
    """Print a Spark DataFrame deterministically (sorted pandas form;
    reference ``utils/misc.py:28-33``)."""
    pdf = sdf.toPandas()
    print(pdf.sort_values(list(pdf.columns), ignore_index=True))


def get_fullname(obj) -> str:
    """Fully qualified class name of an object or type (reference
    ``utils/misc.py:55-70``)."""
    cls = obj if isinstance(obj, type) else obj.__class__
    module = cls.__module__
    if module is None or module == str.__class__.__module__:
        return cls.__name__
    return f"{module}.{cls.__name__}"


def escape_column_name(column_name: str) -> str:
    """Backtick-escape a column name containing special characters,
    unless already escaped (reference ``utils/misc.py:71-86``).

    Embedded backticks are doubled (Spark SQL's escape for a literal
    backtick inside a quoted identifier) — ``a`b`` becomes ```a``b```;
    without the doubling the emitted fragment mis-parses.  "Already
    escaped" requires the WHOLE name to be one quoted identifier, not
    merely backticks at both ends (```a`x`b``` is two identifiers)."""
    import re

    if not re.search(r"[^a-zA-Z0-9_]", column_name):
        return column_name
    if (
        len(column_name) >= 2
        and column_name.startswith("`")
        and column_name.endswith("`")
        # inner backticks must all be doubled for this to be ONE
        # already-quoted identifier
        and "`" not in column_name[1:-1].replace("``", "")
    ):
        return column_name
    return "`" + column_name.replace("`", "``") + "`"


def copy_if_mutable(value):
    """Deep-copy mutable containers, pass immutable values through
    (reference ``utils/misc.py:38-52``) — the defensive-copy helper
    component constructors use for list/dict parameters."""
    import copy as _copy

    if isinstance(value, (int, float, str, bytes, bool, frozenset, type(None))):
        return value
    if isinstance(value, tuple):
        return tuple(copy_if_mutable(v) for v in value)
    if isinstance(value, list):
        return [copy_if_mutable(v) for v in value]
    if isinstance(value, set):
        return {copy_if_mutable(v) for v in value}
    if isinstance(value, dict):
        return {copy_if_mutable(k): copy_if_mutable(v) for k, v in value.items()}
    return _copy.deepcopy(value)
