"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full CDC-engine replay of the
events feed into a lake table) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 (CDC core + webtext training-data
ops); ``oracle_sql()`` carries the DuckDB-equivalent SQL for each —
column names and value representations match exactly (ints/strings only;
timestamps as unix micros; reals as scaled integers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# pin worker python to the driver's interpreter BEFORE any session exists:
# Spark otherwise launches the first `python3` on PATH, and a driver/worker
# minor-version mismatch is a hard error ([PYTHON_VERSION_MISMATCH]) when a
# different toolchain (e.g. a conda base env) gets ahead of the driver's
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

from clever_canal_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine replay (feed → LWW → exactly-once MERGE →
    scan) on /root/testdata/sf0.001."""
    return QUERIES["cdc_engine_replay"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
