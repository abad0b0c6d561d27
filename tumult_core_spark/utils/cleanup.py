"""Explicit cleanup of materialization storage (reference parity).

The reference exposes ``cleanup()`` / ``remove_all_temp_tables()``
(``tmlt/core/utils/cleanup.py:27-49``) for its ``saveAsTable``
round-trip databases; here measurement outputs are frozen as parquet
directories under a per-process temp root (``utils/misc.py``), so the
equivalents operate on those directories:

* :func:`cleanup` — drop THIS process's materialization root now
  (call before ``spark.stop()`` if you want eager reclamation; an
  ``atexit`` hook covers normal interpreter exit);
* :func:`remove_all_temp_tables` — sweep ALL materialization roots in
  the system temp dir, including orphans left by crashed sessions.

A DataFrame returned by a measurement reads from this storage — after
cleanup it can no longer be recomputed (by design: recomputation would
re-sample noise).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from . import misc


def cleanup() -> None:
    """Remove this process's materialization root.

    If you call ``spark.stop()``, call this first (reference
    ``cleanup.py:27-32``).  Safe to call when nothing was ever
    materialized.
    """
    root = misc._MATERIALIZE_ROOT
    if root is not None:
        shutil.rmtree(root, ignore_errors=True)
        misc._MATERIALIZE_ROOT = None


def materialization_root() -> str | None:
    """Path currently holding this process's frozen measurement
    outputs, or None if nothing was materialized yet (the analogue of
    the reference's ``Config.temp_db_name()``,
    ``configuration.py:13-21``)."""
    return misc._MATERIALIZE_ROOT


def remove_all_temp_tables() -> None:
    """Remove ALL materialization roots under the system temp dir,
    including ones abandoned by previous (crashed) sessions
    (reference ``cleanup.py:34-49``)."""
    cleanup()
    for path in glob.glob(os.path.join(tempfile.gettempdir(), "tcs_materialize_*")):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
