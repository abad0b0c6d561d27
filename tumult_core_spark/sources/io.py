"""Typed source/sink pass-throughs.

The reference has no file-format operators (data arrives as in-memory
DataFrames; SURVEY §2.7) — these thin wrappers bind Spark's native
scans to the domain layer so a pipeline can declare "parquet at PATH
conforming to DOMAIN" and get schema enforcement plus the scan-level
optimizations (column pruning, predicate pushdown, partition pruning)
for free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..domains import SparkDataFrameDomain


def _conform(df: DataFrame, domain: Optional[SparkDataFrameDomain]) -> DataFrame:
    if domain is None:
        return df
    # project to the domain's columns in order and validate types
    out = df.select(*domain.columns)
    domain.validate(out)
    return out


def read_parquet(
    spark: SparkSession, path: str, domain: Optional[SparkDataFrameDomain] = None
) -> DataFrame:
    """Parquet scan; with a domain, projects/validates to it (column
    pruning reaches the reader via the projection)."""
    return _conform(spark.read.parquet(path), domain)


def convert_nano_ts_cols(df: DataFrame, ts_cols: Optional[list]) -> DataFrame:
    """Shared epoch-nano / NTZ event-time normalization used by BOTH the
    batch (:func:`read_parquet_nanos_ts`) and streaming
    (``streaming.ops.read_stream_parquet``) readers — one copy, so a
    precision or type fix can never drift between the two paths."""
    from pyspark.sql import functions as F

    for c in ts_cols or []:
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            # integer div: double division loses precision at
            # epoch-nano magnitude (ULP ~256 ns at 1.7e18) and the
            # truncating cast then yields off-by-one-us timestamps
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            # event-time operators (withWatermark) require TimestampType;
            # parquet TIMESTAMP without isAdjustedToUTC reads as NTZ under
            # Spark 4's inferTimestampNTZ, so pin requested event-time
            # columns to LTZ (UTC session tz preserves wall-clock)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_parquet_nanos_ts(
    spark: SparkSession, path: str, ts_cols: Optional[list] = None
) -> DataFrame:
    """Parquet scan tolerating TIMESTAMP(NANOS) columns.

    Spark rejects nanosecond parquet timestamps outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as epoch-nano
    longs, which this helper converts back to (microsecond) timestamps.

    NOTE: ``nanosAsLong`` is a SESSION-global flag and is deliberately
    left set — the flag is consulted again when the scan tasks run, so
    restoring it immediately after ``read()`` would fail the deferred
    execution.  Side effect on the session: later plain
    ``spark.read.parquet`` calls in the same session read
    TIMESTAMP(NANOS) columns as bigint instead of raising; route such
    reads through this helper (which normalizes them) rather than
    relying on the loud failure.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return convert_nano_ts_cols(spark.read.parquet(path), ts_cols)


def read_csv(
    spark: SparkSession,
    path: str,
    domain: Optional[SparkDataFrameDomain] = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan; the domain's schema (when given) is applied at read
    time so no inference pass runs.

    With BOTH a header and a domain, ``enforceSchema`` is turned off so
    Spark VALIDATES the header names against the schema and fails
    loudly on a mismatch — the default (enforceSchema=true) binds the
    schema positionally and silently mis-assigns columns when the
    file's header order differs from the domain's column order.
    """
    reader = spark.read.option("header", str(header).lower())
    if header and domain is not None and "enforceSchema" not in options:
        reader = reader.option("enforceSchema", "false")
    for k, v in options.items():
        reader = reader.option(k, v)
    if domain is not None:
        reader = reader.schema(domain.spark_schema)
    return _conform(reader.csv(path), domain)


def read_json(
    spark: SparkSession,
    path: str,
    domain: Optional[SparkDataFrameDomain] = None,
    **options,
) -> DataFrame:
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if domain is not None:
        reader = reader.schema(domain.spark_schema)
    return _conform(reader.json(path), domain)


def write_parquet(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list,
    mode: str = "error",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Hive-partitioned sink: downstream scans on the partition
    columns prune directories instead of reading data."""
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_table(
    spark: SparkSession,
    table_name: str,
    domain: Optional[SparkDataFrameDomain] = None,
) -> DataFrame:
    """Catalog-table scan (the read side of
    :func:`~tumult_core_spark.utils.scale.write_bucketed_table`); with
    a domain, projects/validates to it.  Bucketing metadata rides
    along: joins and groupBys on the bucket columns plan without an
    Exchange (tests/test_plans.py::TestBucketedLayout pins the
    plans)."""
    return _conform(spark.table(table_name), domain)


def read_orc(
    spark: SparkSession, path: str, domain: Optional[SparkDataFrameDomain] = None
) -> DataFrame:
    """ORC source (columnar, predicate-pushdown-capable like parquet);
    optional domain conformance like the other readers."""
    return _conform(spark.read.orc(path), domain)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: Optional[str] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Line-delimited JSON sink — the interchange format most training
    corpora ship as.  Spark's json source is JSONL natively (one
    object per line), so the round trip through :func:`read_json`
    preserves rows; ``compression`` accepts gzip/zstd/etc."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_col: str = "value",
) -> DataFrame:
    """Plain-text corpus source.

    Line mode (default): one row per line (``value`` string) — the
    shape of most raw text dumps; splittable, so a 100 TB directory
    parallelizes by file blocks.  ``whole_file=True``: one row per
    FILE (wholetext), for document-per-file corpora — files then
    cannot be split, so parallelism is bounded by file count.
    """
    # NOTE: must go through the text() kwarg — a prior .option call is
    # discarded by PySpark's text() wrapper
    df = spark.read.text(path, wholetext=whole_file)
    return df.withColumnRenamed("value", line_col) if line_col != "value" else df


def read_binary_files(
    spark: SparkSession,
    path: str,
    path_glob: Optional[str] = None,
) -> DataFrame:
    """Opaque-binary source for multimodal corpora: one row per file
    with ``(path, modificationTime, length, content binary)`` — the
    input shape of :mod:`tumult_core_spark.extensions.multimodal`.
    Files are never split; size the input directories so file count
    >> executor count.  ``path_glob`` filters (e.g. ``*.wav``)
    scan-side via ``pathGlobFilter``.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def zorder_key(
    df: DataFrame,
    columns: list,
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Morton (Z-order) key column interleaving up to 4 numeric
    columns, entirely as Catalyst bit arithmetic (no Python).

    Each column is linearly rank-scaled to ``bits`` bits against its
    own min/max (one tiny aggregate, a 2xN-scalar driver collect), then
    the ranks' bits interleave: bit ``i`` of column ``j`` lands at
    position ``len(columns)*i + j``.  Rows close in EVERY dimension get
    close keys, so range-partitioning + sorting by the key clusters the
    table for row-group/file skipping on ANY of the dimensions — the
    multi-dimensional generalization of a single sort column, same
    construction as Delta/Iceberg OSS Z-ordering.  Nulls rank 0.

    ``len(columns) * bits`` must fit a signed 64-bit key (<= 62).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    k = len(columns)
    if not 1 <= k <= 4:
        raise ValueError(f"zorder_key interleaves 1-4 columns, got {k}")
    if k * bits > 62:
        raise ValueError(f"{k} columns x {bits} bits exceeds a 63-bit key")
    # NaN-filter the min/max: Spark orders NaN greatest, so a single
    # NaN row would make mx = NaN, span = NaN, and the rank expression
    # NaN for EVERY row of that column — the whole dimension would
    # silently collapse to one constant and its row-group stats stop
    # being selective.  NaN rows themselves rank 0, like nulls.
    def _clean(c):
        col = F.col(c).cast("double")
        return F.when(~F.isnan(col), col)

    stats = df.agg(
        *[F.min(_clean(c)).alias(f"mn{j}") for j, c in enumerate(columns)],
        *[F.max(_clean(c)).alias(f"mx{j}") for j, c in enumerate(columns)],
    ).first()
    m = (1 << bits) - 1
    terms = []
    for j, c in enumerate(columns):
        mn = stats[f"mn{j}"]
        mx = stats[f"mx{j}"]
        mn = 0.0 if mn is None else float(mn)
        span = 1.0 if mx is None or float(mx) == mn else float(mx) - mn
        rank = F.least(
            F.lit(m).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((_clean(c) - F.lit(mn)) / F.lit(span) * F.lit(m)),
            ),
        )
        rank = F.coalesce(rank, F.lit(0).cast("long"))
        terms.extend(
            F.shiftleft(F.shiftright(rank, i).bitwiseAND(F.lit(1)), k * i + j)
            for i in range(bits)
        )
    return df.withColumn(out_col, reduce(lambda a, b: a.bitwiseOR(b), terms))


def layout_for_scan(
    df: DataFrame,
    path: str,
    partition_by: Optional[list] = None,
    sort_by: Optional[list] = None,
    zorder_by: Optional[list] = None,
    target_partitions: Optional[int] = None,
    mode: str = "error",
    zorder_bits: int = 16,
) -> None:
    """Write with a scan-optimized layout: hive directory partitioning
    on ``partition_by`` (directory pruning for equality/range filters
    on those columns) plus ``repartitionByRange`` + in-file sorting on
    ``sort_by`` — or, for range filters over SEVERAL dimensions at
    once, ``zorder_by``: rows cluster along a Morton curve over those
    columns (:func:`zorder_key`) so parquet row-group/file min-max
    statistics stay selective on each of them, where a single sort
    column would only skip on itself.

    A filtered read back shows ``PartitionFilters`` (directories never
    listed) and tight ``PushedFilters`` row-group skipping — the two
    mechanisms that make a 100 TB table behave like the small slice a
    query touches.
    """
    from pyspark.sql import functions as F

    if sort_by and zorder_by:
        raise ValueError("pass sort_by or zorder_by, not both")
    out = df
    if zorder_by:
        out = zorder_key(out, zorder_by, bits=zorder_bits, out_col="__zkey")
        cols = [F.col("__zkey")]
    else:
        cols = [F.col(c) for c in sort_by] if sort_by else []
    if cols:
        out = (
            out.repartitionByRange(target_partitions, *cols)
            if target_partitions
            else out.repartitionByRange(*cols)
        )
        out = out.sortWithinPartitions(*cols)
    elif target_partitions:
        # no clustering column: still honor the caller's output-file
        # sizing instead of silently writing df's incoming partitioning
        out = out.repartition(target_partitions)
    if zorder_by:
        out = out.drop("__zkey")
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Incremental file-batch processing
# ---------------------------------------------------------------------------


def list_data_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """(path, length, modification_time) for every file matching
    ``path_glob`` — a pure-metadata listing via the ``binaryFile``
    source with the content column pruned, so no file bodies are read
    (the source skips content IO for unprojected columns).  Works on
    any Hadoop-compatible filesystem the session can reach."""
    from pyspark.sql import functions as F

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.col("path"),
            F.col("length"),
            F.col("modificationTime").alias("modification_time"),
        )
    )


def _escape_glob(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a LITERAL path
    so ``spark.read`` cannot expand it (a listed ``part[1].parquet``
    would otherwise be read as a character class)."""
    return "".join(
        ("\\" + ch) if ch in "*?[]{}\\" else ch for ch in path
    )


def new_files_since(
    spark: SparkSession, path_glob: str, manifest_path: str
) -> DataFrame:
    """Files matching ``path_glob`` not yet recorded in the manifest
    parquet at ``manifest_path`` — the discovery half of incremental
    batch processing ("process only what arrived since the last run").

    A file counts as NEW when its (path, length, modification_time)
    triple is absent: an overwritten file (same path, new size/mtime)
    is re-processed, an untouched one is skipped.  A missing manifest
    means everything is new (first run).  Any OTHER manifest failure
    (corrupt parquet, permissions, transient FS error) raises: silently
    treating it as a first run would reprocess the entire corpus — an
    expensive mistake at 100 TB — and ``commit_manifest`` would then
    append duplicate rows.  The diff is one left-anti join on a
    manifest that is file-count-sized — tiny next to the data, and
    broadcast by AQE."""
    from pyspark.errors import AnalysisException

    current = list_data_files(spark, path_glob)
    try:
        manifest = spark.read.parquet(manifest_path)
        # force schema resolution so a missing path surfaces here, not
        # at the join's action
        manifest.schema
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return current  # first run: no manifest yet
        raise
    return current.join(
        manifest.select("path", "length", "modification_time"),
        ["path", "length", "modification_time"],
        "left_anti",
    )


def read_incremental_parquet(
    spark: SparkSession, path_glob: str, manifest_path: str
):
    """(data, batch_manifest) for one incremental run over a growing
    parquet directory: ``data`` contains ONLY the rows of files not in
    the manifest (empty schema-correct frame when nothing is new), and
    ``batch_manifest`` lists those files.  After the batch's outputs
    are durably written, call :func:`commit_manifest` with
    ``batch_manifest`` — committing only after the work succeeds gives
    at-least-once processing (a crashed run re-processes its batch;
    pair with idempotent/overwrite-by-batch sinks for exactly-once).

    The new-file paths are collected to the driver to drive the scan —
    a manifest-sized (file-count) collect, the same order of driver
    state every incremental system keeps.  ``batch_manifest`` is FROZEN
    from that same collect (a local relation), never the lazy listing
    plan: a lazy plan re-listed the filesystem at commit time, so a
    file landing between read and commit was appended to the manifest
    WITHOUT its rows ever being read — silent permanent data loss.
    Paths fed back to the reader are glob-escaped (``spark.read``
    glob-interprets its arguments; a literal ``part[1].parquet`` would
    otherwise read the wrong file or none).
    """
    from pyspark.sql import types as T

    batch_rows = new_files_since(spark, path_glob, manifest_path).collect()
    # freeze the batch as a local relation so commit_manifest appends
    # EXACTLY the files this run read.  The schema is the FIXED
    # list_data_files contract, written out literally: deriving it via
    # list_data_files(...).schema re-listed the whole directory tree a
    # second time (the expensive metadata op at millions-of-files
    # scale) just to learn three field names.
    batch = spark.createDataFrame(
        batch_rows,
        schema=T.StructType(
            [
                T.StructField("path", T.StringType(), True),
                T.StructField("length", T.LongType(), True),
                T.StructField("modification_time", T.TimestampType(), True),
            ]
        ),
    )
    if not batch_rows:
        schema = spark.read.parquet(path_glob).schema
        data = spark.createDataFrame([], schema)
    else:
        data = spark.read.parquet(
            *[_escape_glob(r["path"]) for r in batch_rows]
        )
    return data, batch


def commit_manifest(batch_manifest: DataFrame, manifest_path: str) -> None:
    """Append a processed batch's file records to the manifest parquet.
    Call once per successful batch, after its outputs are durable."""
    batch_manifest.write.mode("append").parquet(manifest_path)
