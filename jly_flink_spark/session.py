"""SparkSession factory.

The reference pins its JDBC session timezone to Asia/Shanghai
(reference: save-del-his-job/.../sink/AdbSink.java:63) so deleted-row
timestamps render as Shanghai wall-clock. For oracle comparison
against DuckDB (UTC-naive timestamps) we default the session TZ to
UTC and expose the Shanghai pin as an option for reference-parity
deployments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Reference-parity timezone (AdbSink.java:63: serverTimezone=Asia/Shanghai).
REFERENCE_TZ = "Asia/Shanghai"


def get_spark(
    app_name: str = "jly_flink_spark",
    *,
    tz: str = "UTC",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    On a real cluster the same configs apply; only ``master`` and the
    memory sizing change. AQE is on so skewed joins and small shuffle
    partitions are re-planned at runtime — this is the 100-TB path:
    static shuffle-partition counts never fit every stage.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
