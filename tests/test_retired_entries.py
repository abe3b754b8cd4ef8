"""Oracle hash gates for entries retired from the 50-slot driver window.

q10 (single-probe brute ANN) and q20 (hourly event aggregation) were
consolidated out of the driver's correctness window in round 5 — q10 is
subsumed by q12/q32 and q20 by q40's 3600 s rollup level — but their
implementations and DuckDB twins remain, so this test keeps them under
the SAME rows/schema/value-hash check the driver runs, at sf0.001.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from parity_check import value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

RETIRED = {
    "q10_ann_topk": ("q10_ann_topk", "_Q10_SQL"),
    "q20_events_hourly": ("q20_events_hourly", "_Q20_SQL"),
}


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_entry_matches_oracle(spark, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"driver testdata missing: {SF_DIR}")
    import prom_spark.queries as Q

    fn_name, sql_name = RETIRED[name]
    sdf = getattr(Q, fn_name)(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    res = con.execute(getattr(Q, sql_name))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
