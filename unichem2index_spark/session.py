"""SparkSession factory with the settings this engine assumes.

Local-mode testing stand-in for a multi-executor cluster; every knob here is
also correct on a real cluster (AQE, Arrow, sane shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "unichem2index_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local[N] → match shuffle partitions to cores; on a real cluster this
    # would be ~2-3x total executor cores and AQE coalesces the rest.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing targets max(totalBytes/parallelism,
        # minPartitionSize). The 1m default floor folds KB-sized
        # shuffles into ONE partition — fatal for groupBy+applyInPandas
        # stages whose encoded rows are tiny but whose per-group Python
        # kernel cost is invisible to byte stats (the index-build merge
        # ran 992 groups in 1 task at sf0.1). 16k keeps such stages at
        # ~cores partitions while leaving large shuffles untouched
        # (their target is totalBytes/parallelism either way) — the
        # scale-adaptive fix; a fixed REPARTITION_BY_NUM pin on the
        # merge measured ~20% SLOWER at 8M docs on 4x2-core executors
        # by overriding AQE's byte-sized task count.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # The build persists the extracted corpus and the tokenized corpus
        # DISK_ONLY (see build.py / ingest.py); Spark does NOT compress RDD
        # persist blocks by default, so those are full-corpus uncompressed
        # writes to spark.local.dir. lz4 cuts that I/O ~3-5x for text —
        # disk bandwidth is the resource a single host CAN'T scale with
        # parallelism (a real cluster adds disks with executors).
        .config("spark.rdd.compress", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
