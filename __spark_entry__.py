"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship DP query; ``queries`` exposes one entry
per implemented operator family (SURVEY.md §2 + extensions), each
deterministic (noise scale 0 / infinite budget) so the DuckDB oracle
in ``oracle_sql`` hash-matches.  Non-SQL-expressible pipelines are
still oracled: hash/signature-based dedup pins the planted pairs plus
the full deterministic pair count, and the multimodal stub compares
against a fixture produced by an independent pyarrow+numpy path.

The implementations live beside this file — ``entry_queries.py`` (the
Spark side) and ``entry_oracles.py`` (the DuckDB side); this module is
the stable import surface the driver uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entry_queries import entry, queries  # noqa: E402,F401
from entry_oracles import oracle_sql  # noqa: E402,F401

__all__ = ["entry", "queries", "oracle_sql"]
