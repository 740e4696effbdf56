"""The four scale-rewritten joins (as-of g3, bucketed e2, bucketed interval
overlap, bucketed a2a3 message passing) must equal their naive quadratic
formulations on ARBITRARY inputs, not just the fixture.  Hypothesis
generates random event tables; both formulations run in DuckDB (the Spark
twins are hash-compared to these same SQL strings by the harness, so
equality here transfers)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from kie_invoice_minimal_spark.operators.relational import E2_SQL, G3_SQL, ROUND_DP
from kie_invoice_minimal_spark.operators.relational_ext import (
    A2A3_SQL,
    INTERVAL_OVERLAP_SQL,
)

EVENT = st.tuples(
    st.integers(min_value=0, max_value=4),  # user_id (few users -> collisions)
    st.sampled_from(["click", "purchase", "view"]),
    st.integers(min_value=0, max_value=60_000),  # ts offset seconds (~16h span)
    # up to 700 min: deliberately LONGER than INTERVAL_BUCKET_US (512 min)
    # so the fuzz covers intervals spanning 3+ buckets
    st.floats(min_value=0.01, max_value=700.0, allow_nan=False),
)


def _con(rows):
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta([r[2] for r in rows], unit="s"),
            "value": [round(r[3], 2) for r in rows],
            "props": "",
        }
    )
    con = duckdb.connect()
    con.register("events_pdf", pdf)
    con.execute("CREATE VIEW events AS SELECT * FROM events_pdf")
    return con


NAIVE_G3 = """
SELECT user_id, click_id, purchase_id, dt_us FROM (
  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS dt_us,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), p.event_id) AS rn
  FROM events c JOIN events p ON c.user_id = p.user_id
  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
) WHERE rn = 1
"""

NAIVE_E2 = """
SELECT a.user_id AS user_id, a.event_id AS src_id, b.event_id AS dst_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_id < b.event_id
  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
"""

NAIVE_INTERVAL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 600000 AS e_us
  FROM events
)
SELECT a.user_id AS user_id, a.event_id AS event_a, b.event_id AS event_b,
       least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
FROM ev a JOIN ev b ON a.user_id = b.user_id
WHERE a.event_id < b.event_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
"""


def _rows(con, sql):
    return sorted(map(tuple, con.execute(sql).fetchall()))


@settings(max_examples=40, deadline=None)
@given(st.lists(EVENT, min_size=0, max_size=40))
def test_g3_asof_equals_naive_argmin(rows):
    con = _con(rows)
    assert _rows(con, G3_SQL) == _rows(con, NAIVE_G3)


@settings(max_examples=40, deadline=None)
@given(st.lists(EVENT, min_size=0, max_size=40))
def test_e2_bucketed_equals_naive_band(rows):
    con = _con(rows)
    assert _rows(con, E2_SQL) == _rows(con, NAIVE_E2)


@settings(max_examples=40, deadline=None)
@given(st.lists(EVENT, min_size=0, max_size=40))
def test_interval_bucketed_equals_naive(rows):
    con = _con(rows)
    assert _rows(con, INTERVAL_OVERLAP_SQL) == _rows(con, NAIVE_INTERVAL)


# round-3 rewrite: the round-2 quadratic formulation, kept here as the oracle
NAIVE_A2A3 = f"""
WITH ev AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
),
edges AS (
  SELECT b.event_id AS event_id,
         (1.0 / (1.0 + exp(abs(a.ts_us - b.ts_us) / 3600000000.0 - 0.5))) * a.value AS gv,
         1.0 / (1.0 + exp(abs(a.ts_us - b.ts_us) / 3600000000.0 - 0.5)) AS g
  FROM ev a JOIN ev b ON a.user_id = b.user_id
  WHERE a.event_id != b.event_id AND abs(a.ts_us - b.ts_us) <= 3600000000
)
SELECT event_id, round(sum(gv) / (sum(g) + 1e-6), {ROUND_DP}) AS h_agg,
       count(*) AS n_in
FROM edges GROUP BY event_id
"""


@settings(max_examples=40, deadline=None)
@given(st.lists(EVENT, min_size=0, max_size=40))
def test_a2a3_bucketed_equals_naive(rows):
    con = _con(rows)
    new = _rows(con, A2A3_SQL)
    old = _rows(con, NAIVE_A2A3)
    # edge SET identity -> (event_id, n_in) must match exactly; the gated
    # sums are doubles accumulated in a different order after the bucketed
    # DISTINCT, so h_agg is compared at one ulp of the ROUND_DP rounding.
    assert [(r[0], r[2]) for r in new] == [(r[0], r[2]) for r in old]
    tol = 1.5 * 10 ** (-ROUND_DP)
    assert all(abs(a[1] - b[1]) <= tol for a, b in zip(new, old))
