"""Session configuration helpers (reference ``utils/configuration.py``).

Parity surface: :class:`Config` (stable per-process temp database
name) and :func:`get_java11_config` (netty reflection opt-in for
Java 11+).  Rebuild addition: :func:`check_spark_config` validates the
settings this engine actually depends on — Java version, Arrow
transfer, session timezone — and raises a typed
:class:`SparkConfigError` instead of letting a misconfigured session
fail obscurely deep inside a pandas UDF.
"""

from __future__ import annotations

import time
from typing import Dict, List
from uuid import uuid4

from pyspark.conf import SparkConf
from pyspark.sql import SparkSession


class SparkConfigError(ValueError):
    """The active SparkSession is configured in a way this engine
    cannot run correctly under."""


class Config:
    """Global configuration for programs using this package."""

    _temp_db_name = f'tumult_temp_{time.strftime("%Y%m%d_%H%M%S")}_{uuid4().hex}'

    @classmethod
    def temp_db_name(cls) -> str:
        """Name of the per-process temporary database (stable for the
        lifetime of the process, unique across processes)."""
        return cls._temp_db_name


def _java11_config_opts() -> Dict[str, str]:
    return {
        "spark.driver.extraJavaOptions": "-Dio.netty.tryReflectionSetAccessible=true",
        "spark.executor.extraJavaOptions": "-Dio.netty.tryReflectionSetAccessible=true",
    }


def get_java11_config() -> SparkConf:
    """Spark config suitable for Java 11+ (Arrow needs netty's
    reflective access): ``SparkSession.builder.config(
    conf=get_java11_config()).getOrCreate()``."""
    conf = SparkConf()
    for k, v in _java11_config_opts().items():
        conf = conf.set(k, v)
    return conf


def check_spark_config(spark: SparkSession, strict: bool = False) -> List[str]:
    """Validate the active session against this engine's requirements.

    Hard failures (always raise :class:`SparkConfigError`):

    - Java runtime older than 11 (Spark 4 itself requires 17; the
      check surfaces a broken ``JAVA_HOME`` as a typed error).
    - ANSI mode enabled (``spark.sql.ansi.enabled=true``): the
      engine's clip/overflow semantics assume non-ANSI null-on-error
      arithmetic; under ANSI the same plans throw mid-job instead.

    Soft diagnostics (returned; raise when ``strict=True``):

    - Arrow disabled (``spark.sql.execution.arrow.pyspark.enabled``):
      every pandas-UDF path still runs but falls back to pickled
      row-at-a-time transfer — 10-100x slower.
    - Session timezone not UTC: timestamp-NTZ casts used by the
      time-series operators are wall-clock preserving only under a
      UTC session timezone.
    """
    problems: List[str] = []

    version = spark.sparkContext._jvm.System.getProperty("java.version")
    major = version.split(".")[0]
    if major == "1":  # 1.8 style
        major = version.split(".")[1]
    try:
        major_num = int(major)
    except ValueError:
        major_num = 0
    if major_num and major_num < 11:
        raise SparkConfigError(
            f"Java {version} is too old: this engine requires Java 11+ "
            "(Spark 4 requires 17). Fix JAVA_HOME."
        )

    if spark.conf.get("spark.sql.ansi.enabled", "false").lower() == "true":
        raise SparkConfigError(
            "spark.sql.ansi.enabled=true: this engine's clip/overflow "
            "semantics require non-ANSI arithmetic (errors become NULLs "
            "that the operators handle explicitly); disable ANSI mode"
        )

    if (
        spark.conf.get(
            "spark.sql.execution.arrow.pyspark.enabled", "false"
        ).lower()
        != "true"
    ):
        problems.append(
            "Arrow transfer is disabled "
            "(spark.sql.execution.arrow.pyspark.enabled=false): pandas-UDF "
            "operators fall back to pickled row-at-a-time transfer"
        )

    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        problems.append(
            f"Session timezone is {tz!r}, not UTC: timestamp-NTZ casts in "
            "the time-series operators are wall-clock preserving only "
            "under UTC"
        )

    if strict and problems:
        raise SparkConfigError("; ".join(problems))
    return problems
