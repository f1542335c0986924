"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on,
Arrow on (the whole custom-code surface is Arrow pandas UDFs),
shuffle partitions sized to cores. On a 1000-executor cluster the same
builder is used with master/shuffle-partitions supplied by spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[N,maxFailures] → N; local[*] → cores
        inner = master.split("[")[-1].rstrip("]").split(",")[0]
        shuffle_partitions = cpus if inner == "*" or not inner.isdigit() else int(inner)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    _quiet_bounded_window_warning(spark)
    return spark


def _quiet_bounded_window_warning(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR: every unpartitioned window in
    this repo runs on a PROVABLY bounded frame (aggregated |buckets|-row
    facet pipelines, ≤beam×per_term suggester frames — each site carries a
    correctness comment, and tests/test_plan_quality.py guards the row-
    level paths), so the per-query "No Partition Defined" WARN is known
    noise that real plan regressions could hide behind. Spark 4 constant-
    folds a literal partition key away, so suppressing at the log4j2
    logger is the only clean silencer. Best-effort: log plumbing must
    never fail a session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
