"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings are what we would ship
on a 1000-executor cluster: AQE on (runtime coalesce + skew handling),
UTC session timezone (for oracle comparability), Arrow enabled for the
few pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "shifu_spark", shuffle_partitions: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster ``master`` comes from spark-submit; locally we run
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 32g: roomy for sf0.1 caches yet small enough that G1 full GCs
        # stay short — 48g heaps showed 5-15s stop-the-world stalls in
        # bench runs with heavy broadcast churn
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # shuffle/cache codec knob for scale A/Bs (guide §2.3): lz4 is
        # Spark's default; zstd trades CPU for shuffle bytes.  Kept
        # env-parameterised with the default UNCHANGED so the driver's
        # bench stays comparable; the sf1 A/B result lives in
        # OPTIMIZATION_r13.md / BENCH_sf1_scaleproof.json.
        .config("spark.io.compression.codec", os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"))
    )
    if not os.environ.get("SPARK_MASTER"):  # pragma: no branch - local default
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
