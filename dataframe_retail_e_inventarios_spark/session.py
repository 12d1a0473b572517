"""SparkSession builder tuned for this engine.

The driver supplies its own SparkSession to ``__spark_entry__``; this
builder is for tests and bench runs. Settings chosen for the 100 TB
posture scaled down to local mode:

- AQE on: runtime partition coalescing + skew-join splitting replace
  hand-tuned shuffle partition counts on a real cluster.
- Arrow on: every pandas-UDF boundary is Arrow-batched.
- shuffle partitions sized to the local core count (on a cluster this
  would be ~2-3x total executor cores; AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dataframe_retail_e_inventarios_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cpus)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source filter pushdown (sources/docgen.py) —
        # off by default in Spark 4.1, no effect on built-in sources.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # SPARK_GRAFT_SESSION_TZ lets the TZ-invariance sweep run the
        # whole registry under a hostile SESSION timezone (the driver
        # builds its own session, so UTC must be a default, not a
        # correctness requirement)
        .config(
            "spark.sql.session.timeZone",
            os.environ.get("SPARK_GRAFT_SESSION_TZ", "UTC"),
        )
        # ANSI mode: Spark 4's DEFAULT is true, and the driver's
        # vanilla session inherits it — so true is the default here
        # too (defaulting this knob to false once silently flipped
        # float*int coercion from double to float and moved ~150
        # embedding quantizations by one ulp-at-.5; see
        # operators/pca._quantized). SPARK_GRAFT_ANSI=false is the
        # HOSTILE sweep direction: the registry must also hash-green
        # under legacy NULL-on-error semantics (SELFCHECK_ansi.json).
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI", "true"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
