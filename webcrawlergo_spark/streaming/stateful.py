"""Custom stateful streaming operator — sessionization with
``applyInPandasWithState`` (SURVEY §2.9 extension surface).

The batch twin is operators/olap.py::sessionize_events (lag → gap >
30 min → cumulative session index → per-session aggregates). Here the
same semantics run as a Structured Streaming stateful operator:
per-user state carries (last_ts, last_session_idx, open-session
aggregates) across micro-batches; each batch's rows are sessionized
vectorized (numpy cumsum over the gap flags — no per-row Python) and
updated session rows are emitted in ``update`` mode.

tests/test_streaming.py asserts the drained stream's final emission
per (user_id, session_idx) equals the batch operator row-for-row.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 1800

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("sum_value", DoubleType()),
    ]
)
# state: last event ts (epoch ns — int64, floats lose sub-µs bits),
# last session idx, open-session aggregates
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("idx", LongType()),
        StructField("n", LongType()),
        StructField("start_ts", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

GAP_NS = SESSION_GAP_S * 1_000_000_000


def _sessionize_user(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    pdf = pd.concat(list(batches), ignore_index=True)
    if pdf.empty:
        return
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts = pdf["ts"].astype("int64").to_numpy()  # epoch ns, exact
    val = pdf["value"].to_numpy()

    if state.exists:
        last_ts, idx0, n0, start0, sum0 = state.get
    else:
        last_ts, idx0, n0, start0, sum0 = None, 0, 0, 0, 0.0

    prev = np.concatenate(
        ([last_ts if last_ts is not None else np.iinfo(np.int64).min // 2], ts[:-1])
    )
    new_flag = (ts - prev) > GAP_NS
    if last_ts is None:
        new_flag[0] = True  # first event ever starts session 1
    sidx = idx0 + np.cumsum(new_flag.astype(np.int64))

    rows: list[dict[str, Any]] = []
    for s in np.unique(sidx):
        m = sidx == s
        n = int(m.sum())
        lo, hi = int(ts[m].min()), int(ts[m].max())
        sv = float(val[m].sum())
        if s == idx0 and not new_flag[0]:
            # continuation of the open session from state
            n += int(n0)
            lo = int(start0)
            sv += float(sum0)
        rows.append(
            {
                "user_id": int(key[0]),
                "session_idx": int(s),
                "n_events": n,
                "session_start": pd.Timestamp(lo),
                "session_end": pd.Timestamp(hi),
                "sum_value": round(sv, 4),
            }
        )
    last = rows[-1]
    state.update(
        (
            int(ts[-1]),
            int(last["session_idx"]),
            int(last["n_events"]),
            int(last["session_start"].value),
            # state carries the EXACT running sum (emissions round,
            # state must not — rounding compounds across batches)
            float(val[sidx == sidx[-1]].sum())
            + (float(sum0) if (sidx[-1] == idx0 and not new_flag[0]) else 0.0),
        )
    )
    yield pd.DataFrame(rows)


_QUERY_SEQ = [0]  # memory-sink names must be unique per session


def sessionize_stream(
    spark: SparkSession, sf_dir: str, query_name: str | None = None
) -> DataFrame:
    """events parquet → file stream → per-user stateful sessionization
    → update-mode memory sink. Returns the sink table after draining;
    the LAST emission per (user_id, session_idx) is the final session
    row (update semantics)."""
    if query_name is None:
        _QUERY_SEQ[0] += 1
        query_name = f"sessions_out_{_QUERY_SEQ[0]}"
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = os.path.join(
        "/tmp", "webcrawlergo_stream_src", hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    sessions = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
