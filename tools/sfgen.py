"""Generate an sfN-shaped MEASUREMENT dataset by extrapolating the
empirical marginal distributions of /root/testdata/sf0.1 (vocab, doc
lengths, lang/source mixes, clustered unit embeddings, event-type/user
mixes, TPC-H-ish numerics) to ``scale`` x the sf0.1 row counts.

This is a perf-measurement rig ONLY: correctness is gated on the
driver's own testdata via tools/compare.py; nothing here feeds the
oracle. Deterministic (numpy PCG64 seed=42), fresh draws per row — no
row duplication, so dedup/LSH/df-dependent operators keep realistic
candidate-set sizes at scale (duplicating rows 10x would explode pair
counts quadratically and misrepresent the driver's generator).

Usage: python tools/sfgen.py [scale] [outdir]
       (defaults: 10 /root/sfx/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "sort", "hash", "scan", "query", "agg", "batch", "line",
    "part", "order", "small", "fast", "slow", "group", "join", "shuffle",
    "cache", "plan", "stage", "task", "row", "index", "filter", "a",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def gen(scale: int, out: str) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(name, table.num_rows, flush=True)

    # documents: uniform word draws from the 31-word vocab, 10-100 words
    n_docs = 5000 * scale
    lens = rng.integers(10, 101, n_docs)
    words = np.array(VOCAB)
    texts = [" ".join(words[rng.integers(0, len(words), k)]) for k in lens]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=LANG_P),
        "source": np.char.add("src", rng.integers(0, 20, n_docs).astype(str)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 cluster centers on the unit sphere + noise, renormalized
    n_vec, dim = 2000 * scale, 64
    centers = rng.standard_normal((10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    v = centers[labels] + 0.35 * rng.standard_normal((n_vec, dim))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))

    # events: 30 days, users scale with sf, exponential-ish values
    n_ev = 100_000 * scale
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.sort(rng.integers(0, 30 * 86400 * 10**6, n_ev)).astype("timedelta64[us]")
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 1500 * scale, n_ev), pa.int64()),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.minimum(np.round(rng.exponential(50.0, n_ev), 2), 560.21),
        "props": np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype(str)), "}"),
    }))

    # TPC-H-ish star
    n_li, n_ord = 600_000 * scale, 150_000 * scale
    n_cust, n_part, n_supp = 15_000 * scale, 20_000 * scale, 1_000 * scale
    ship_base = np.datetime64("1995-01-01", "us")
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pa.array(
            ship_base + (rng.integers(0, 8 * 365, n_li) * 86400 * 10**6).astype("timedelta64[us]"),
            pa.timestamp("us")),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": pa.array(
            ship_base + (rng.integers(0, 8 * 365, n_ord) * 86400 * 10**6).astype("timedelta64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": np.char.add("Customer#", np.arange(n_cust).astype(str)),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], n_cust),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add("part ", np.arange(n_part).astype(str)),
        "p_brand": np.char.add("Brand#", rng.integers(11, 56, n_part).astype(str)),
        "p_type": rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"], n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": np.char.add("Supplier#", np.arange(n_supp).astype(str)),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_supp), 2),
    }))
    nations = [f"NATION{i}" for i in range(25)]
    write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": nations,
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    }))
    write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": [f"REGION{i}" for i in range(5)],
    }))
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sfx/sf1.0"
    gen(scale, out)
