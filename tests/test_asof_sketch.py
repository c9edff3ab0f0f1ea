"""As-of join semantics and HLL sketch determinism — the guards the
SQL oracle can't express: edge semantics against hand-built goldens,
the sketch's exact agreement with a pure-Python twin, and its
mergeability (the incremental-maintenance contract)."""

import datetime
import hashlib
import math

from pyspark.sql import functions as F

from webcrawlergo_spark.operators.asof import asof_join, purchases_asof_clicks
from webcrawlergo_spark.operators.sketch import (
    HLL_M,
    RHO_MAX,
    W_BITS,
    hll_distinct,
    hll_estimate_frame,
    hll_registers,
)

SF_DIR = "/root/testdata/sf0.001"


def _t(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_asof_join_edge_semantics(spark):
    """Every edge in one fixture: probe before any build (NULLs),
    exact-timestamp build (INCLUSIVE — must match), latest-of-several
    wins, later builds invisible, keys fully isolated."""
    probe = spark.createDataFrame(
        [
            (1, "u1", _t(5)),    # before any u1 build -> NULLs
            (2, "u1", _t(10)),   # == build b10 exactly -> inclusive match
            (3, "u1", _t(25)),   # after b10,b20 -> b20
            (4, "u2", _t(100)),  # u2 has only a LATER build -> NULLs
        ],
        "pid long, k string, pts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("u1", 10, _t(10)),
            ("u1", 20, _t(20)),
            ("u1", 99, _t(30)),   # after every probe -> never matched
            ("u2", 77, _t(200)),  # later than probe 4
        ],
        "k string, bid long, bts timestamp",
    )
    out = {
        r["pid"]: (r["asof_bid"], r["asof_bts"])
        for r in asof_join(probe, build, on="k", probe_ts="pts", build_ts="bts").collect()
    }
    assert out == {
        1: (None, None),
        2: (10, _t(10)),
        3: (20, _t(20)),
        4: (None, None),
    }


def test_asof_plan_one_shuffle_no_python(spark):
    """The scale claim, pinned: the core as-of join compiles to
    EXACTLY one hash exchange (on the key) and zero Python nodes —
    never a range-join cross product, never applyInPandas."""
    probe = spark.createDataFrame([(1, "u", _t(1))], "pid long, k string, pts timestamp")
    build = spark.createDataFrame([("u", 2, _t(0))], "k string, bid long, bts timestamp")
    out = asof_join(probe, build, on="k", probe_ts="pts", build_ts="bts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "hashpartitioning(k" in plan
    assert "Python" not in plan and "NestedLoop" not in plan


def test_asof_fixture_nonvacuous_and_sound(spark):
    """On the real events stream: the tie-free precondition holds,
    both matched and NULL rows occur, and every match is verified
    against the definition (greatest click ts <= purchase ts, same
    user) via an independent Python pass."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert (
        ev.groupBy("user_id", "ts").count().filter(F.col("count") > 1).count() == 0
    ), "fixture has (user, ts) ties — asof determinism precondition broken"
    rows = purchases_asof_clicks(spark, SF_DIR).collect()
    assert rows and any(r["click_id"] is None for r in rows)
    assert any(r["click_id"] is not None for r in rows)
    clicks = {}
    for r in ev.filter(F.col("event_type") == "click").collect():
        clicks.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    for r in rows:
        prior = [c for c in clicks.get(r["user_id"], []) if c[0] <= r["purchase_ts"]]
        want = max(prior) if prior else (None, None)
        assert (r["click_ts"], r["click_id"]) == (want[0], want[1])


def test_asof_randomized_vs_python_golden(spark):
    """Three seeded random build/probe streams (dense ts collisions
    across keys, sparse builds, empty-build keys) — the Spark as-of
    must equal the brute-force Python definition on every row."""
    import random

    for seed in (7, 99, 4242):
        rng = random.Random(seed)
        keys = [f"k{i}" for i in range(6)]
        builds = [
            (rng.choice(keys[:5]), i, _t(rng.randrange(0, 300)))
            for i in range(40)
        ]
        probes = [
            (100 + i, rng.choice(keys), _t(rng.randrange(0, 300)))
            for i in range(60)
        ]
        b = spark.createDataFrame(builds, "k string, bid long, bts timestamp")
        p = spark.createDataFrame(probes, "pid long, k string, pts timestamp")
        got = {
            r["pid"]: r["asof_bid"]
            for r in asof_join(p, b, on="k", probe_ts="pts", build_ts="bts").collect()
        }
        for pid, k, pts in probes:
            prior = [(bts, bid) for bk, bid, bts in builds if bk == k and bts <= pts]
            # latest bts wins; among bts ties the window's struct
            # tiebreak orders by payload (bid first), so max bid —
            # exactly max() over (bts, bid)
            want = max(prior)[1] if prior else None
            assert got[pid] == want, (seed, pid)


def _hll_golden(values):
    regs = [0] * HLL_M
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, w = h >> W_BITS, h & ((1 << W_BITS) - 1)
        rho = RHO_MAX if w == 0 else RHO_MAX - w.bit_length()
        regs[idx] = max(regs[idx], rho)
    zeros = regs.count(0)
    s_scaled = sum(1 << (RHO_MAX - m) for m in regs)
    raw = (0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0 * 2251799813685248.0 / float(s_scaled)
    est = 1024.0 * math.log(1024.0 / float(zeros)) if raw <= 2560.0 and zeros > 0 else raw
    return math.floor(est * 1e6 + 0.5) / 1e6, zeros


def test_hll_matches_python_golden_exactly(spark):
    """The shipped estimates equal the pure-Python HLL bit-for-bit
    (same md5-derived registers, integer harmonic sum, same branch),
    and land within the 12% accuracy ceiling on both live branches."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {r["col_name"]: r for r in hll_distinct(spark, SF_DIR).collect()}
    for col in ("user_id", "event_id"):
        vals = [r[0] for r in ev.select(col).collect()]
        est, zeros = _hll_golden(vals)
        assert got[col]["hll_est_6"] == est
        assert got[col]["zero_registers"] == zeros
        n = len(set(vals))
        assert got[col]["n_exact"] == n
        assert abs(est - n) / n < 0.12
    # the fixture exercises BOTH branches: user_id linear-counting
    # (raw estimate under 2.5m), event_id raw harmonic
    assert got["user_id"]["zero_registers"] > 0
    assert got["event_id"]["n_exact"] >= 1000


def test_hll_registers_merge(spark):
    """Sketch mergeability — union two half-corpus sketches, take the
    per-register max, and the merged sketch (and its estimate) equals
    the whole-corpus sketch. This is the property that lets 100 TB be
    sketched partition-by-partition with a 1024-row final merge."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    merged = (
        hll_registers(lo, "event_id")
        .unionByName(hll_registers(hi, "event_id"))
        .groupBy("idx")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    whole = hll_registers(ev, "event_id")
    assert {(r["idx"], r["m_reg"]) for r in merged.collect()} == {
        (r["idx"], r["m_reg"]) for r in whole.collect()
    }


def test_hll_empty_input_estimates_zero(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter("event_id < 0")
    row = hll_estimate_frame(ev, "event_id", "e").collect()[0]
    assert row["n_exact"] == 0 and row["hll_est_6"] == 0.0
    assert row["zero_registers"] == HLL_M
