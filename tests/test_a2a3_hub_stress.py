"""Hot-user stress for the round-3 a2a3 rewrite (r2 verdict "What's wrong"
#1): one user with 100k events spread over ~69 days.  The round-2 bare
user_id join would materialize 10^10 pairs before the band filter — not
runnable; the bucketed join materializes only the ~12M true within-band
edges.  Counts are verified analytically: events sit on a 1-minute grid,
so every interior event has exactly 120 in-band neighbors (60 either
side), thinning linearly at the edges.
"""

from __future__ import annotations

import os

import pandas as pd

from kie_invoice_minimal_spark.operators.relational_ext import a2a3_message_pass

N = 100_000
BAND_MIN = 60  # 1h band on a 1-minute grid


def test_a2a3_bucketed_survives_100k_event_hot_user(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(N), dtype="int64"),
            "user_id": pd.array([0] * N, dtype="int64"),
            "event_type": pd.array(["click"] * N, dtype="string"),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(N), unit="m"),
            "value": pd.array([float(i % 100) / 10 for i in range(N)], dtype="float64"),
            "props": pd.array([""] * N, dtype="string"),
        }
    )
    out = os.path.join(str(tmp_path), "events.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(out)
    res = a2a3_message_pass(spark, str(tmp_path))
    rows = {r.event_id: r.n_in for r in res.collect()}
    assert len(rows) == N
    # interior events: exactly BAND_MIN neighbors on each side
    for eid in (BAND_MIN, N // 2, N - BAND_MIN - 1):
        assert rows[eid] == 2 * BAND_MIN, (eid, rows[eid])
    # boundary events thin linearly
    assert rows[0] == BAND_MIN
    assert rows[N - 1] == BAND_MIN
    assert rows[10] == BAND_MIN + 10
    # total directed edge count: sum over events of in-degree
    total = sum(rows.values())
    assert total == 2 * (N * BAND_MIN - BAND_MIN * (BAND_MIN + 1) // 2)
