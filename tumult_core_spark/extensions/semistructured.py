"""Semi-structured (JSON string) column operators.

Event properties, crawl metadata, and model-output sidecars arrive as
JSON strings inside otherwise-typed tables; at corpus scale the engine
must project typed fields out of them WITHOUT a Python UDF or a
separate parse job.  Everything here is pure Catalyst
(``get_json_object`` / ``from_json`` / ``schema_of_json``), so
extraction runs inside whole-stage codegen at scan speed, filters on
extracted fields push into the same stage, and no shuffle is
introduced.

Malformed rows follow Spark's JSON semantics: ``get_json_object``
yields NULL for unparseable input or missing paths, and ``from_json``
yields a NULL struct — corrupt records degrade to NULLs the caller can
count (:func:`profile_table`) rather than failing the job.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: Dict[str, Union[str, Tuple[str, str]]],
    keep_json: bool = False,
) -> DataFrame:
    """Project typed fields out of a JSON-string column.

    ``fields`` maps output column name -> JSONPath (``"$.a.b"``), or
    ``(path, cast_type)`` to cast the extracted string (``"long"``,
    ``"double"``, ``"boolean"``...).  Missing paths and malformed JSON
    become NULL.  One Catalyst projection — no Python, no shuffle; at
    100 TB this is a scan-stage map the same as any other column
    expression.
    """
    if json_col not in df.columns:
        raise ValueError(f"No such column: {json_col!r}")
    kept = [c for c in df.columns if keep_json or c != json_col]
    clash = set(fields) & set(kept)
    if clash:
        # same guard as flatten_json: a duplicate output name makes
        # every later reference to it ambiguous
        raise ValueError(
            f"extracted field names collide with existing columns: "
            f"{sorted(clash)}"
        )
    cols = [F.col(c) for c in kept]
    for name, spec in fields.items():
        path, cast = spec if isinstance(spec, tuple) else (spec, None)
        if not path.startswith("$"):
            raise ValueError(f"JSONPath must start with '$': {path!r}")
        expr = F.get_json_object(F.col(json_col), path)
        if cast is not None:
            expr = expr.cast(cast)
        cols.append(expr.alias(name))
    return df.select(*cols)


def infer_json_schema(
    df: DataFrame, json_col: str, sample_rows: int = 1000
) -> T.StructType:
    """Infer a merged struct schema from a bounded sample of the JSON
    column (for pipelines whose producers don't publish one).

    The sample (first ``sample_rows`` non-null strings — bounded
    driver transfer, never the whole column) is parsed by Spark's own
    JSON schema inference, so the result plugs directly into
    :func:`flatten_json`.  Inference is only as complete as the
    sample: fields absent from all sampled rows are absent from the
    schema — pass an explicit schema for contractual pipelines.
    """
    spark = df.sparkSession
    sample = [
        r[0]
        for r in df.select(json_col)
        .where(F.col(json_col).isNotNull())
        .limit(sample_rows)
        .collect()
    ]
    if not sample:
        raise ValueError(f"No non-null values in {json_col!r} to infer from")
    # bounded RDD of <= sample_rows strings — the one sanctioned RDD
    # use here (spark.read.json has no DataFrame-column input); the
    # full column never leaves the executors
    inferred = spark.read.json(spark.sparkContext.parallelize(sample, 1))
    corrupt = spark.conf.get(
        "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
    )
    # malformed sampled rows surface as a _corrupt_record string field;
    # this module's contract is corrupt-degrades-to-NULL, so the field
    # must not pollute the schema handed to flatten_json
    fields = [f for f in inferred.schema.fields if f.name != corrupt]
    if not fields:
        raise ValueError(
            f"every sampled value of {json_col!r} is malformed JSON; "
            "no schema to infer"
        )
    return T.StructType(fields)


def flatten_json(
    df: DataFrame,
    json_col: str,
    schema: Union[T.StructType, str],
    prefix: str = "",
    keep_json: bool = False,
) -> DataFrame:
    """Parse ``json_col`` against ``schema`` and flatten the top-level
    struct fields to columns (``prefix`` guards against collisions).

    ``from_json`` with an explicit schema is a single codegen'd
    expression; unlike per-field ``get_json_object`` chains it parses
    each JSON string ONCE however many fields are projected, which is
    the right shape when extracting many fields at corpus scale.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    parsed = F.from_json(F.col(json_col), schema)
    base = [F.col(c) for c in df.columns if keep_json or c != json_col]
    flat = [
        parsed.getField(f.name).alias(f"{prefix}{f.name}") for f in schema.fields
    ]
    out_names = [c for c in df.columns if keep_json or c != json_col] + [
        f"{prefix}{f.name}" for f in schema.fields
    ]
    if len(set(out_names)) != len(out_names):
        raise ValueError(
            "Flattened field names collide with existing columns; "
            "set a prefix"
        )
    return df.select(*base, *flat)


def json_array_explode(
    df: DataFrame,
    json_col: str,
    element_schema: Union[T.DataType, str],
    out_col: str = "element",
    keep_json: bool = False,
) -> DataFrame:
    """Explode a JSON array column into one row per element, parsed
    against ``element_schema`` (a DDL string like ``"a long, b string"``
    for object elements, or a primitive like ``"long"``).

    The flatMap shape for JSON payloads (tool-call lists, span
    annotations): ``from_json`` to ``array<element>`` then a Catalyst
    ``explode_outer`` — rows whose array is NULL/malformed survive
    with a NULL element, so corrupt records remain countable.
    """
    if out_col in df.columns and not (keep_json is False and out_col == json_col):
        # same loud collision contract as extract_json_fields /
        # flatten_json — a silent duplicate column surfaces later as an
        # AMBIGUOUS_REFERENCE far from the cause
        raise ValueError(
            f"out_col {out_col!r} collides with an existing column"
        )
    if isinstance(element_schema, str):
        # DataType.fromDDL handles primitives ("long") and struct DDL
        # ("a long, b string") alike
        elem_t: T.DataType = T.DataType.fromDDL(element_schema)
    else:
        elem_t = element_schema
    arr = F.from_json(F.col(json_col), T.ArrayType(elem_t))
    base = [F.col(c) for c in df.columns if keep_json or c != json_col]
    return df.select(*base, F.explode_outer(arr).alias(out_col))
