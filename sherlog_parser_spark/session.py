"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (SURVEY.md §4.2) and safe on
local[N]: AQE on (runtime coalescing + skew-join splitting), Arrow
enabled for the pandas-UDF path, sensible shuffle parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sherlog-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        if master.startswith("local[") and master != "local[*]":
            try:
                cores = int(master[len("local["):-1])
            except ValueError:
                pass
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
    )
    # Sandbox-only local-FS fast path: without libhadoop, Hadoop forks a
    # `chmod` per mkdir/create (~2.5ms each, serialized), which dominates
    # partitioned fan-out writes.  BareLocalFileSystem no-ops permission
    # calls.  Real clusters (HDFS/S3/Iceberg) never hit this path.
    barefs_jar = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "java", "sherlog-barefs.jar")
    if os.path.exists(barefs_jar):
        b = (
            b.config("spark.jars", barefs_jar)
            .config("spark.driver.extraClassPath", barefs_jar)
            .config("spark.executor.extraClassPath", barefs_jar)
            .config("spark.hadoop.fs.file.impl", "sherlog.BareLocalFileSystem")
        )
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
