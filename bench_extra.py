"""Optimization-round measurement harness (bench.py stays FROZEN).

Times individual declared queries with the same cold/warm methodology
as bench.py (fn -> df.count(), run twice), at any SF dir, without
paying for the 40-query suite + crawl legs on every iteration.

Usage:
    python bench_extra.py [--sf DIR] [--plans OUTDIR] [--reps N] q1 q2 ...

With --plans, also writes `<q>.txt` explain("formatted") files.
Timing uses df.count() (bench.py's frozen methodology, so numbers are
comparable to the driver's) — pass --noop to use the noop sink
(guide §1.4) when isolating compute from agg-pruning effects.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    plans_dir = None
    reps = 2
    use_noop = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--noop":
            use_noop = True; i += 1
        else:
            names.append(a); i += 1

    import __spark_entry__ as entry
    from bench import make_spark, CPUS

    qs = {**entry.retired_queries(), **entry.queries()}
    if not names:
        names = list(qs)
    spark = make_spark(CPUS)
    # same JIT/session warmup as bench.py
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    spark.range(1_000_000).selectExpr("md5(cast(id as string)) h").agg({"h": "max"}).collect()

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
                assert n >= 0
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(json.dumps({"q": name, "sf_dir": sf_dir, "times": times}), flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
    print(json.dumps({"sf_dir": sf_dir, "cpus": CPUS, "all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
