"""Regression guard for the wave width restore (r5 session 7).

The fetched-event frame's rows are tiny before the spans attach, so
AQE coalesces a 100k-row wave to 1-4 partitions and the crawl's
dominant map work (spans join, link-extract regex, canonicalize,
validate) inherits that width — a silent 3x wall regression that no
correctness test can catch (outputs are identical either way). This
test pins the mechanism: during a fetch-sim crawl big enough to pass
the rows//1000 gate, the engine must issue a numeric repartition
wider than one before the per-wave checkpoint.
"""


def test_wave_width_restore_invoked(spark, monkeypatch):
    import bench
    # Spark 4 routes instances through the classic subclass — patch
    # the class whose method actually binds
    from pyspark.sql.classic.dataframe import DataFrame

    widths = []
    orig = DataFrame.repartition

    def spy(self, *args, **kwargs):
        if args and isinstance(args[0], int):
            widths.append(args[0])
        return orig(self, *args, **kwargs)

    monkeypatch.setattr(DataFrame, "repartition", spy)
    r = bench.crawl_bench(spark, 10_000)
    assert r["events"] == 10_000
    # the ~8k-link wave after the seed wave must have been width-
    # restored past a single partition (gate: min(cores, rows//1000))
    assert any(w > 1 for w in widths), (
        "wave width restore disappeared — the extract phase will "
        f"silently serialize (numeric repartitions seen: {widths})"
    )
