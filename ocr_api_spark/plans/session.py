"""SparkSession builder with the configs the pipeline assumes.

Scale posture (north_rule): AQE on (runtime coalescing + skew-join
splitting), Arrow batches sized for text payloads, shuffle partitions
matched to the core count at local scale (a cluster deploy overrides
via spark-submit --conf; nothing here hard-codes local mode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ocr_api_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # text/html payloads are KBs per row: 2k rows/batch keeps Arrow
        # buffers ~tens of MB without starving the Python workers
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd sink: measured equal wall time to snappy on the heavy-page
        # corpus but 1.54x smaller files (390 vs 599 MB for 300k pages) —
        # at 100 TB that is the dominant object-store I/O and downstream
        # scan saving, at no throughput cost
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
