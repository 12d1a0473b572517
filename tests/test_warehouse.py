"""Warehouse maintenance physical contracts (backfill/restatement)."""


def test_dynamic_overwrite_leaves_untouched_partitions_alone(spark, tmp_path):
    """The backfill contract: partitionOverwriteMode=dynamic replaces
    ONLY the partitions present in the restatement frame — file
    listing and bytes of every other partition are untouched."""
    import glob
    import os

    df = spark.createDataFrame(
        [(m, v) for m in (1, 2, 3) for v in range(10)], "m int, v long"
    )
    path = str(tmp_path / "t")
    df.write.partitionBy("m").parquet(path)

    def files(m):
        return sorted(
            (f, os.path.getmtime(f), os.path.getsize(f))
            for f in glob.glob(f"{path}/m={m}/part-*")
        )

    before_m1, before_m2 = files(1), files(2)
    restated = spark.createDataFrame([(3, 99)], "m int, v long")
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("m")
        .parquet(path)
    )
    assert files(1) == before_m1 and files(2) == before_m2
    back = spark.read.parquet(path)
    assert back.filter("m = 3").count() == 1  # replaced
    assert back.filter("m = 1").count() == 10  # intact


def test_backfill_drops_emptied_restated_partition(spark, tmp_path):
    """backfill_partition_overwrite completes the restatement
    contract (ADVICE r4): a partition INSIDE the restated range whose
    recomputation yields zero rows is deleted; partitions outside the
    range — and non-empty restated ones — behave like plain dynamic
    overwrite."""
    import glob
    import os

    from dataframe_retail_e_inventarios_spark.operators.partitioning import (
        backfill_partition_overwrite,
    )

    df = spark.createDataFrame(
        [(m, v) for m in (1, 2, 3, 4) for v in range(5)], "m int, v long"
    )
    path = str(tmp_path / "t")
    df.write.partitionBy("m").parquet(path)

    def files(m):
        return sorted(
            (f, os.path.getmtime(f), os.path.getsize(f))
            for f in glob.glob(f"{path}/m={m}/part-*")
        )

    before_m1 = files(1)
    # restated range: m >= 3. m=3 restates to one row; m=4 empties.
    restated = spark.createDataFrame([(3, 99)], "m int, v long")
    backfill_partition_overwrite(restated, path, "m", lambda raw: int(raw) >= 3)

    assert files(1) == before_m1  # outside range: bytes untouched
    assert not os.path.exists(f"{path}/m=4")  # emptied: directory gone
    back = spark.read.parquet(path)
    assert back.filter("m = 4").count() == 0
    assert back.filter("m = 3").count() == 1
    assert back.filter("m <= 2").count() == 10


def test_time_decay_attribution_shares(spark):
    from collections import defaultdict

    from dataframe_retail_e_inventarios_spark.registry import queries
    from conftest import SF_SMOKE

    rows = queries()["time_decay_attribution"](spark, SF_SMOKE).collect()
    assert rows
    by_conv = defaultdict(list)
    for r in rows:
        assert 0 <= r.hours_before <= 24
        by_conv[r.conv_event_id].append(r)
    for conv, touches in by_conv.items():
        s = sum(t.decay_share for t in touches)
        assert abs(s - 1.0) < 1e-4, conv  # shares normalize per conversion
        if len(touches) == 1:
            assert touches[0].decay_share == 1.0
        # harmonic decay: strictly fewer hours-before never gets a
        # smaller share
        touches.sort(key=lambda t: t.hours_before)
        for a, b in zip(touches, touches[1:]):
            assert a.decay_share >= b.decay_share - 1e-9
