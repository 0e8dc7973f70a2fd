"""As-of join: backward-inclusive point-in-time semantics."""

from datetime import datetime

from hbase_rdf_spark.ops.temporal import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2025-01-01 10:00:05"), 100.0),
            ("A", ts("2025-01-01 10:00:10"), 101.0),
            ("A", ts("2025-01-01 09:59:00"), 99.0),  # before any quote
            ("B", ts("2025-01-01 10:00:07"), 50.0),
        ],
        "sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2025-01-01 10:00:00"), 99.5),
            ("A", ts("2025-01-01 10:00:10"), 100.5),  # equal ts → inclusive
            ("B", ts("2025-01-01 10:00:01"), 49.9),
        ],
        "sym string, ts timestamp, bid double",
    )
    out = asof_join(trades, quotes, on=["sym"], suffix="_q")
    got = {
        (r["sym"], r["ts"]): (r["ts_q"], r["bid_q"]) for r in out.collect()
    }
    assert got[("A", ts("2025-01-01 10:00:05"))] == (ts("2025-01-01 10:00:00"), 99.5)
    # equal timestamps match (inclusive)
    assert got[("A", ts("2025-01-01 10:00:10"))] == (ts("2025-01-01 10:00:10"), 100.5)
    # left row before any right row → nulls, row preserved
    assert got[("A", ts("2025-01-01 09:59:00"))] == (None, None)
    assert got[("B", ts("2025-01-01 10:00:07"))] == (ts("2025-01-01 10:00:01"), 49.9)
    assert out.count() == 4


def test_interval_join_inclusive_bounds_and_buckets(spark):
    from hbase_rdf_spark.ops.temporal import interval_join

    intervals = spark.createDataFrame(
        [
            ("u1", ts("2025-01-01 10:00:00"), ts("2025-01-01 12:00:00"), "iv1"),
            ("u1", ts("2025-01-01 15:00:00"), ts("2025-01-01 15:30:00"), "iv2"),
            ("u2", ts("2025-01-01 10:30:00"), ts("2025-01-01 11:30:00"), "iv3"),
        ],
        "k string, start_ts timestamp, end_ts timestamp, iv string",
    )
    points = spark.createDataFrame(
        [
            ("u1", ts("2025-01-01 10:00:00"), "p_start"),   # on start bound
            ("u1", ts("2025-01-01 12:00:00"), "p_end"),     # on end bound
            ("u1", ts("2025-01-01 13:00:00"), "p_gap"),     # between intervals
            ("u1", ts("2025-01-01 15:10:00"), "p_iv2"),
            ("u2", ts("2025-01-01 11:00:00"), "p_u2"),
            ("u2", ts("2025-01-01 15:10:00"), "p_u2_none"), # iv2 is u1's
        ],
        "k string, ts timestamp, p string",
    )
    # small bucket forces multi-bucket interval explosion; result must be
    # identical to the naive theta-join semantics
    out = interval_join(points, intervals, on=["k"], bucket_seconds=900)
    got = {(r["p"], r["iv"]) for r in out.collect()}
    assert got == {
        ("p_start", "iv1"),
        ("p_end", "iv1"),
        ("p_iv2", "iv2"),
        ("p_u2", "iv3"),
    }


def test_asof_does_not_leak_across_keys(spark):
    left = spark.createDataFrame(
        [("A", ts("2025-01-01 12:00:00"), 1.0)],
        "k string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [("B", ts("2025-01-01 11:00:00"), 7.0)],
        "k string, ts timestamp, w double",
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row["w_r"] is None and row["ts_r"] is None
