"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC final-state query; ``queries`` /
``oracle_sql`` expose the full operator catalog from
``migration_pair_spark.queries`` (SURVEY.md §2 coverage). Every entry has an
exact DuckDB oracle — including ANN similarity search, whose integer-SRP
signature pipeline is reproduced bit-identically in SQL (operators/
similarity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from migration_pair_spark.queries import REGISTRY  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    """Defensive session prep for a driver-owned SparkSession: executors
    must be able to import the engine (pandas/Arrow UDFs unpickle it there),
    and timestamp semantics must match the DuckDB oracle's UTC-naive view."""
    from migration_pair_spark.packaging import ship_package

    ship_package(spark)
    # runtime-modifiable conf; pins timestamp semantics to the oracle's view
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC final-state materialization (LWW winner per key with
    tombstone drop) on /root/testdata/sf0.001."""
    _prepare(spark)
    return REGISTRY["cdc_final_state"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return REGISTRY[name].fn(spark, sf_dir)

        return run

    return {name: wrap(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
