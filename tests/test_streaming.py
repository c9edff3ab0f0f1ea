"""Structured Streaming surface: the streaming tumbling-window query
must agree with its batch twin on the same input (memory sink drained
synchronously via processAllAvailable)."""

from webcrawlergo_spark.sources.tpch import load_table
from webcrawlergo_spark.streaming.windowed import (
    tumbling_event_counts,
    tumbling_event_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    batch = tumbling_event_counts(load_table(spark, SF_DIR, "events"))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    stream = tumbling_event_counts_stream(spark, SF_DIR, query_name="t_out")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream.collect()
    }
    assert got == want
    assert len(got) > 10


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionization (streaming/stateful.py)
    drained over the full events table == the batch window-function
    sessionizer, row for row (final update per session wins)."""
    from webcrawlergo_spark.operators.olap import sessionize_events
    from webcrawlergo_spark.streaming.stateful import sessionize_stream

    batch = sessionize_events(spark, SF_DIR)
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["session_start"], r["session_end"], r["sum_value"]
        )
        for r in batch.collect()
    }
    out = sessionize_stream(spark, SF_DIR, query_name="sess_out")
    got = {}
    for r in out.collect():  # update mode: later emissions overwrite
        got[(r["user_id"], r["session_idx"])] = (
            r["n_events"], r["session_start"], r["session_end"], r["sum_value"]
        )
    assert len(got) == len(want)
    assert got == want


def test_stateful_sessionize_state_continuation():
    """_sessionize_user across TWO micro-batches (state carried) equals
    one pass over the concatenated input — the continuation branch
    (same open session spanning a batch boundary) included."""
    import pandas as pd

    from webcrawlergo_spark.streaming import stateful as st

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def mk(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "value": [r[2] for r in rows],
            }
        )

    base = pd.Timestamp("2024-01-01 10:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        (1, base, 1.0),
        (2, base + 5 * m, 2.0),
        (3, base + 40 * m, 4.0),     # gap > 30min → session 2
        (4, base + 45 * m, 8.0),     # batch boundary INSIDE session 2
        (5, base + 50 * m, 16.0),
        (6, base + 120 * m, 32.0),   # session 3
    ]

    def run(batches):
        state = FakeState()
        final = {}
        for b in batches:
            for pdf in st._sessionize_user((7,), iter([mk(b)]), state):
                for r in pdf.to_dict("records"):
                    final[r["session_idx"]] = r
        return final

    split = run([rows[:4], rows[4:]])
    whole = run([rows])
    assert split == whole
    assert [split[i]["n_events"] for i in (1, 2, 3)] == [2, 3, 1]
    assert split[2]["sum_value"] == 28.0
