"""Driver-contract smoke + fast oracle regression at sf0.001.

The full 32-query oracle sweep runs via tools/check_oracle.py at sf0.01;
here a representative subset guards against regressions cheaply.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_SUBSET = [
    "lww_latest_state",
    "cdc_final_state",
    "epoch_millis_norm",
    "sessionize_events",
    "q1_pricing_summary",
    "rollup_order_status",
    "simhash_docs",
    "embedding_topk_cosine",
    "multimodal_meta",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tb in TABLES:
        p = f"{SF_DIR}/{tb}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"user_id", "last_event_id", "last_ts", "last_value"}


def test_every_query_has_registry_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # at most a couple of rows-only entries (approximate operators)
    assert len(set(qs) - set(oracles)) <= 2


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle_sf0001(spark, duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)
