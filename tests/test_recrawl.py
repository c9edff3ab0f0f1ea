"""recrawl_priority: exact pure-Python golden of the Cho &
Garcia-Molina change-rate estimator, the estimator's monotonicity
contract, and the single-exchange plan shape."""

import math

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _golden():
    tab = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    # normalize to µs regardless of pandas' resolution; naive == UTC
    tab["us"] = tab["ts"].astype("datetime64[us]").astype("int64")
    tab["fp"] = (tab["event_id"] % 500) % 8  # fp of 'doc' || id%500
    out = []
    for url_id, g in tab.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        fps = g["fp"].tolist()
        us = g["us"].tolist()
        n = len(fps) - 1
        t_us = us[-1] - us[0]
        if n < 1 or t_us <= 0:
            continue
        x = sum(1 for a, b in zip(fps, fps[1:]) if a != b)
        lam = -math.log((n - x + 0.5) / (n + 0.5)) * ((float(n) * 86400e6) / t_us)
        out.append((url_id, n, x, math.floor(lam * 1e6 + 0.5) / 1e6))
    out.sort()
    return out


def test_recrawl_priority_matches_python_golden(spark):
    from webcrawlergo_spark.operators.crawl_queries import recrawl_priority

    got = [
        (r.url_id, r.n, r.x, r.lambda_day_6)
        for r in recrawl_priority(spark, SF_DIR).collect()
    ]
    want = _golden()
    assert got == want
    # estimator sanity: no changes -> zero rate; any change -> positive
    for _, n, x, lam in got:
        assert 0 <= x <= n
        if x == 0:
            assert lam == 0.0
        else:
            assert lam > 0.0


def test_recrawl_priority_single_exchange(spark):
    """Lag window and per-URL aggregate share ONE url_id exchange
    (the crawl_delta lesson); no joins anywhere."""
    from webcrawlergo_spark.operators.crawl_queries import recrawl_priority

    plan = (
        recrawl_priority(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, plan
