"""ANN recall@k report: multi-probe LSH (radius sweep) and IVF vs the
brute-force cosine_topk twin, plus the scanned-fraction cost of each
configuration. Results are recorded in BENCH.md §ann-recall.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webcrawlergo_spark.operators import similarity as sim  # noqa: E402
from webcrawlergo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-recall", cpus=8, shuffle_partitions=8)
    vecs = (
        sim._vecs(spark, sf_dir)
        .withColumn("bucket", sim._bucket_col(F.col("v")).cast("int"))
        .cache()
    )
    n = vecs.count()
    gt = {(r["query_id"], r["neighbor_id"]) for r in sim.cosine_topk(spark, sf_dir).collect()}
    out: dict = {"sf_dir": sf_dir, "n_vecs": n, "k": sim.TOP_K, "queries": sim.N_QUERIES}

    for radius in (0, 1, 2):
        df = sim.lsh_topk(vecs.select("vec_id", "v"), radius=radius)
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        # scanned fraction: candidate rows the probed buckets contain,
        # per query, relative to the corpus (the cost the bucketing saves)
        masks = sim._probe_masks(radius)
        mdf = spark.createDataFrame([(m,) for m in masks], "mask int")
        q = vecs.filter(F.col("vec_id") < sim.N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("bucket").alias("qb")
        )
        probes = q.crossJoin(F.broadcast(mdf)).select(
            "query_id", F.col("qb").bitwiseXOR(F.col("mask")).alias("pb")
        )
        ncand = vecs.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("pb")) & (F.col("vec_id") != F.col("query_id")),
        ).count()
        out[f"lsh_radius{radius}"] = {
            "recall": round(len(gt & got) / len(gt), 3),
            "scanned_frac": round(ncand / (sim.N_QUERIES * n), 4),
        }

    got = {(r["query_id"], r["neighbor_id"]) for r in sim.ivf_topk(spark, sf_dir).collect()}
    out[f"ivf_nprobe{sim.N_PROBE}"] = {
        "recall": round(len(gt & got) / len(gt), 3),
        "scanned_frac": round(sim.N_PROBE / sim.N_CELLS, 4),
    }

    # PQ-ADC: every code is scanned (8 table lookups each — that IS the
    # cheap full scan), so the cost metric is the exact-rerank fraction
    got = {(r["query_id"], r["neighbor_id"]) for r in sim.pq_adc_topk(spark, sf_dir).collect()}
    out[f"pq_adc_shortlist{sim.PQ_SHORTLIST}"] = {
        "recall": round(len(gt & got) / len(gt), 3),
        "reranked_frac": round(sim.PQ_SHORTLIST / n, 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
