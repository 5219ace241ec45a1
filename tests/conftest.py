"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pytest

from migration_pair_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "migration_pair_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/mps-warehouse"},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")
