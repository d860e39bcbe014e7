"""SparkSession factory — the engine's equivalent of the reference client/config
(reference: iceberg.go:23-48, config.go:1-189).

The reference's ``Config`` carries catalog URI, warehouse, S3 endpoint/creds,
target file size, and retry knobs. Here those map to Spark confs; execution
itself is delegated to Spark (local[N] in tests, a real cluster in prod).

Scale defaults are chosen for the 100 TB design goal:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing),
- adaptive shuffle partition sizing rather than a fixed huge number,
- Arrow-accelerated Python interop for the Pandas-UDF operators,
- 128 MB file-split target to match the reference's default data-file size
  (reference: table/insert.go:51).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024  # reference: table/insert.go:51
DEFAULT_MAX_RETRIES = 3  # reference: config.go:93
DEFAULT_RETRY_BACKOFF_MS = 100  # reference: config.go:94


@dataclass
class EngineConfig:
    """Engine configuration (reference: config.go:15-95).

    ``warehouse`` is the root under which filesystem-catalog tables live.
    S3 settings pass straight through to Hadoop S3A confs so the same code
    reads ``s3a://`` paths on a real cluster (reference: io/s3.go:34-96).
    """

    app_name: str = "go-iceberg-spark"
    master: str | None = None  # None -> from env/spark-submit
    warehouse: str | None = None
    shuffle_partitions: int | None = None
    target_file_size_bytes: int = DEFAULT_TARGET_FILE_SIZE
    max_retries: int = DEFAULT_MAX_RETRIES
    retry_backoff_ms: int = DEFAULT_RETRY_BACKOFF_MS
    s3_endpoint: str | None = None
    s3_access_key: str | None = None
    s3_secret_key: str | None = None
    s3_path_style: bool = False  # MinIO-style (reference: io/s3.go path-style)
    extra_confs: dict[str, str] = field(default_factory=dict)


def get_spark(config: EngineConfig | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession with scale-appropriate defaults."""
    cfg = config or EngineConfig()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = cfg.master or f"local[{cpus}]"
    shuffle = cfg.shuffle_partitions or int(cpus)

    b = (
        SparkSession.builder.appName(cfg.app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")  # reference: table/writer.go:110
        .config("spark.sql.files.maxPartitionBytes", str(cfg.target_file_size_bytes))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    # Only pin the master when not running under a real cluster manager.
    if "SPARK_MASTER" not in os.environ:
        b = b.master(master)
    if cfg.s3_endpoint:
        b = b.config("spark.hadoop.fs.s3a.endpoint", cfg.s3_endpoint)
    if cfg.s3_access_key:
        b = b.config("spark.hadoop.fs.s3a.access.key", cfg.s3_access_key)
    if cfg.s3_secret_key:
        b = b.config("spark.hadoop.fs.s3a.secret.key", cfg.s3_secret_key)
    if cfg.s3_path_style:
        b = b.config("spark.hadoop.fs.s3a.path.style.access", "true")
    for k, v in cfg.extra_confs.items():
        b = b.config(k, v)
    return b.getOrCreate()
