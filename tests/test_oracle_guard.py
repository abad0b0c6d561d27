"""Guard rails for the driver's oracle comparison.

Every red driver row in rounds 4-5 came from exactly two output-shape
classes, both invisible to the queries' own unit tests:

* a DuckDB oracle column of type HUGEINT (uncast ``SUM`` over an
  integer column) — pandas materializes it as float64 and the value
  hash diverges from Spark's int64;
* an array/list-valued output column on either engine — the driver's
  pandas canonicalizer lexsorts columns and cannot factorize list
  cells (TypeError).

The five known sites were fixed in rounds 5-6; this sweep pins the
whole registry so a NEW entry cannot reintroduce either class.  Shape
only — value parity is the driver's (and tests/oracle_check.py's) job.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_BANNED_DUCK = ("HUGEINT", "UHUGEINT", "[]", "LIST", "STRUCT", "MAP(")


def _entry():
    import __spark_entry__ as entry_mod

    return entry_mod


def test_every_oracle_column_is_hashable_scalar(sf_dir):
    """All oracle_sql() results must come back from DuckDB with
    scalar, pandas-exact column types: no HUGEINT (silently becomes
    float64) and no list/struct/map cells (unsortable)."""
    entry_mod = _entry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in _BANNED_DUCK):
                bad.append(f"{name}.{col}: {t}")
    assert not bad, f"oracle columns the driver canonicalizer breaks on: {bad}"


def test_every_query_schema_is_flat(spark, sf_dir):
    """All queries() outputs must have flat scalar schemas: the
    driver's pandas canonicalizer cannot sort array/map/struct cells.
    Serialize (array_join / to_json) on both engines instead."""
    from pyspark.sql import types as T

    entry_mod = _entry()
    bad = []
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar query output columns: {bad}"


def test_query_and_oracle_registries_align():
    """Every oracle key must have a query; queries without an oracle
    are the documented weaker rows-only check, but an oracle without a
    query is dead SQL the driver never validates."""
    entry_mod = _entry()
    q, o = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert o <= q, f"oracles without a query: {sorted(o - q)}"


SF_KEYED_ORACLES = [
    # (entry name, table whose fingerprint keys the fixture)
    ("multimodal_features", "documents"),
    ("pca_project", "embeddings"),
    ("bpe_tokens", "documents"),
    ("temperature_mix", "documents"),
    ("dedup_minhash", "documents"),
    ("dedup_simhash", "documents"),
    ("ngram_jaccard", "documents"),
]


@pytest.mark.parametrize("name,fp_table", SF_KEYED_ORACLES)
def test_sf_keyed_oracle_errs_loudly_on_unknown_corpus(sf_dir, name, fp_table):
    """Every fixture-backed oracle is keyed on a content fingerprint of
    its source table and must raise DuckDB's error() — never return an
    empty or silently-wrong result — when run against a corpus the
    fixture has no block for.  Simulated by shifting the id column,
    which changes the fingerprint but keeps the schema intact."""
    oracles = _entry().oracle_sql()
    con = duckdb.connect()
    id_col = {"documents": "doc_id", "embeddings": "vec_id"}[fp_table]
    for t in TABLES:
        if t == fp_table:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE ({id_col} + 999999 AS"
                f" {id_col}) FROM '{sf_dir}/{t}.parquet'"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    with pytest.raises(duckdb.Error, match="fixture has no"):
        con.execute(oracles[name]).fetchall()
