"""Fixture-boundary audit for self-referential calendar oracles.

Round-4 VERDICT items 1 and 8: q216 computed week-over-week pairing with
(calendar year, ISO week-number), which splits the Dec 29 - Jan 4 ISO
boundary week into two misordered groups; the DuckDB oracle replayed the
same expression, so the driver's hash check was blind to it.  The driver's
events fixture spans January only, never crossing the trap.

These tests build fixtures that DO cross the traps and assert both the
engine semantics and engine==oracle on the crossing data:

- q216: events spanning a Dec/Jan ISO-week boundary (Mon 2025-12-29 owns
  Dec 29-31 AND Jan 1-4) must land in ONE weekly group, with LAG ordering
  following calendar time, not (year, weeknum) sort order.
- q55: a gapped date series — the 7-day moving average must be RANGE over
  calendar days, not ROWS over observed days (audit of the other
  same-expression windowed oracle; q44/q236 were found non-self-referential
  — their oracles independently convert DuckDB's dow convention — and
  q187/q238 gap-safe by construction).
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _compare_with_oracle(spark, sf_dir, name, tables):
    """Run queries()[name] on Spark and oracle_sql()[name] on DuckDB over
    the same fixture dir; return the Spark rows after asserting equality
    the same way scripts/check_oracle.py does."""
    sdf = entrymod.queries()[name](spark, sf_dir)
    spark_rows = sdf.collect()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.sql(entrymod.oracle_sql()[name])
    o_cols = [c.lower() for c in rel.columns]
    o_rows = rel.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(o_cols)
    assert len(spark_rows) == len(o_rows)
    col_order = sorted(sdf.columns, key=lambda c: c.lower())
    idx = [o_cols.index(c.lower()) for c in col_order]
    s_set = sorted(tuple(_norm(r[c]) for c in col_order) for r in spark_rows)
    d_set = sorted(tuple(_norm(row[i]) for i in idx) for row in o_rows)
    assert s_set == d_set, f"{name}: engine/oracle divergence on boundary fixture"
    return spark_rows


def _write_events(dirpath, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))


def test_q216_iso_boundary_week_is_one_group(spark, tmp_path):
    """Dec 29-31 2025 and Jan 1-4 2026 are the SAME ISO week (Mon
    2025-12-29).  The old (year(ts), weekofyear(ts)) pairing tagged the
    Dec days (2025, 1) — sorting before (2025, 52) and apart from the Jan
    days' (2026, 1) — splitting the week and corrupting every LAG pair."""
    sf_dir = str(tmp_path)
    rows = []
    eid = 0

    def emit(day, n):
        nonlocal eid
        for i in range(n):
            rows.append(
                (eid, dt.datetime(day.year, day.month, day.day, 9 + (i % 8)),
                 100 + eid, "click", 1.5)
            )
            eid += 1

    # week A: Mon 2025-12-22 .. Sun 2025-12-28 -> 10 events
    for d, n in [(dt.date(2025, 12, 22), 4), (dt.date(2025, 12, 26), 6)]:
        emit(d, n)
    # week B (boundary): Mon 2025-12-29 .. Sun 2026-01-04 -> 5 events
    # split across the year boundary itself
    for d, n in [
        (dt.date(2025, 12, 30), 2),
        (dt.date(2025, 12, 31), 1),
        (dt.date(2026, 1, 2), 2),
    ]:
        emit(d, n)
    # week C: Mon 2026-01-05 .. -> 8 events
    emit(dt.date(2026, 1, 6), 8)
    _write_events(sf_dir, rows)

    got = _compare_with_oracle(spark, sf_dir, "q216_wow_regression", ["events"])
    by_week = {r["week_start"]: r for r in got}
    # three weekly groups -> two LAG'd result rows; the boundary week is ONE
    # group keyed by its ISO Monday, spanning both calendar years
    assert set(by_week) == {dt.date(2025, 12, 29), dt.date(2026, 1, 5)}
    b = by_week[dt.date(2025, 12, 29)]
    assert b["n"] == 5 and b["n_prev"] == 10
    assert b["wow_delta"] == -0.5 and bool(b["regressed"]) is True
    c = by_week[dt.date(2026, 1, 5)]
    assert c["n"] == 8 and c["n_prev"] == 5


def test_q55_moving_average_is_calendar_range_not_rows(spark, tmp_path):
    """A gap in the daily series: days 1-3 then day 10.  ROWS(-6,0) would
    average all four observed days at day 10 (25.0); a true 7-calendar-day
    window covers day 10 alone (40.0)."""
    sf_dir = str(tmp_path)
    dates = [dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 3),
             dt.date(2024, 1, 10)]
    revs = [10.0, 20.0, 30.0, 40.0]
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(len(dates)), pa.int64()),
            "o_orderdate": pa.array(dates, pa.date32()),
            "o_totalprice": pa.array(revs, pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "orders.parquet"))

    got = _compare_with_oracle(spark, sf_dir, "q55_rolling_avg", ["orders"])
    ma = {r["day"]: r["ma7"] for r in got}
    assert ma["2024-01-01"] == pytest.approx(10.0)
    assert ma["2024-01-03"] == pytest.approx(20.0)  # mean(10,20,30)
    # day 10: days 4..10 in range -> only itself; ROWS would give 25.0
    assert ma["2024-01-10"] == pytest.approx(40.0)


def test_dst_transition_invariance_under_hostile_session_tz(spark, tmp_path):
    """Events crossing BOTH US DST transitions (spring-forward 2026-03-08
    02:30 — a wall-clock time that does not exist in America/New_York —
    and fall-back 2026-11-01 01:30, which exists twice).  The _events/
    _utc contract pins the session to UTC inside every query, so results
    must be (1) equal to the DuckDB oracle's naive-timestamp semantics
    and (2) bit-identical whether the ambient session zone is UTC or a
    DST zone set just before the query runs — the blind spot the
    SPARK_GRAFT_TZ sweep gates repo-wide."""
    sf_dir = str(tmp_path)
    rows = []
    stamps = [
        dt.datetime(2026, 3, 8, 0, 30),
        dt.datetime(2026, 3, 8, 1, 30),
        dt.datetime(2026, 3, 8, 2, 30),   # nonexistent NY wall time
        dt.datetime(2026, 3, 8, 3, 30),
        dt.datetime(2026, 11, 1, 0, 30),
        dt.datetime(2026, 11, 1, 1, 30),  # ambiguous NY wall time
        dt.datetime(2026, 11, 1, 2, 30),
    ]
    for i, ts in enumerate(stamps):
        rows.append((i, ts, 100 + i, "click" if i % 2 else "view", 2.0 + i))
    _write_events(sf_dir, rows)

    def run(name, ambient):
        spark.conf.set("spark.sql.session.timeZone", ambient)
        try:
            got = _compare_with_oracle(spark, sf_dir, name, ["events"])
            cols = sorted(got[0].asDict().keys()) if got else []
            return sorted(tuple(_norm(r[c]) for c in cols) for r in got)
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    for name in ["q13_events_tumbling", "q204_burst_detection"]:
        utc = run(name, "UTC")
        ny = run(name, "America/New_York")
        assert utc == ny, f"{name}: ambient DST zone changed the answer"
        assert utc, f"{name}: empty result on the DST fixture"
