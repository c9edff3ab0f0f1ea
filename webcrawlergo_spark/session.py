"""SparkSession factory.

One place to configure the engine's session so tests, the driver
entry point, and the benchmark all agree on: AQE on (runtime shuffle
re-planning + skew-join splitting), Arrow on (vectorized pandas UDF
transfer), UTC session timezone (DuckDB-oracle comparability), and
shuffle partitions sized to cores rather than the 200 default.

At cluster scale the same factory is used by ``spark-submit
--py-files``; only ``master`` and the memory knobs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "webcrawlergo_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    ``cpus`` controls local-mode parallelism (``local[cpus]``); on a
    real cluster leave ``master`` to spark-submit. ``shuffle_partitions``
    defaults to 2x cores locally — at 100 TB you would instead size it
    as total_shuffle_bytes / ~128MB and let AQE coalesce.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64MB advisory over-coalesces stages that feed an
        # explode (links fan out ~16x after the scan) — keep post-
        # shuffle partitions smaller so fan-out stages stay parallel
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # superseded localCheckpoint blocks are only dropped after a
        # driver GC notices the RDD is unreachable — with a large,
        # mostly-empty heap that can take many minutes; force it
        .config("spark.cleaner.periodicGC.interval", "45s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        # ParallelGC + pre-touched fixed heap: G1's periodic uncommit +
        # re-fault of heap pages dominated wall time in this VM (90%+
        # kernel time, mostly-idle CPUs). A fixed pre-touched heap with
        # a throughput collector removed the stalls (3x on the crawl
        # bench). On a real cluster, apply the same to executors.
        #
        # -XX:-DontCompileHugeMethods (r6): whole-stage codegen of the
        # unrolled fixed-dim vector arithmetic (operators/similarity.py
        # _dot/_sub_l2 — ~450 scalar ops inside one join-consume
        # method) exceeds HotSpot's 8000-bytecode JIT cutoff, leaving
        # the hottest generated method running in the BYTECODE
        # INTERPRETER: measured 42 s vs 1.8 s for the identical
        # 5M-row dot-product stage with the flag flipped. Codegen'd
        # SQL is exactly the "huge generated method" case the default
        # cutoff was not designed for; apply to executors too on a
        # real cluster.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:+UseParallelGC -XX:+AlwaysPreTouch -XX:-DontCompileHugeMethods -Xms"
                + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"),
            ),
        )
        .config("spark.ui.enabled", "false")
        # shuffle + spill through the VM's virtio disk throttles every
        # wave identically at any core count; tmpfs restores the NVMe-
        # class local I/O a real executor would have
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # WindowExec's "no partition defined" warning is an accident
    # detector; the engine's only unpartitioned windows are the
    # DELIBERATE small-batch paths (plans/rank.py: below 100k rows one
    # task beats the 3-job distributed recipe). Silence that one
    # logger — every at-scale window in the engine is partitioned.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # log4j internals moved — cosmetic only
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
