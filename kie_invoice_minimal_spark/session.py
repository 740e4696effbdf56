"""SparkSession factory with the engine's standard configuration.

Arrow execution is mandatory (every Python crossing is a pandas/Arrow UDF —
the north rule forbids per-row Python), AQE is on for runtime re-planning
(skew joins, coalescing the shrinking edge lists of the connected-components
loop), and shuffle partitions default to a local-mode-friendly count that
callers override for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kie-kg-engine",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes ``None`` with master supplied by spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow: the only JVM<->Python boundary we allow, batched.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting. The CC loop's edge
        # list shrinks geometrically; AQE right-sizes each round.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle partitions from COMPRESSED shuffle bytes,
        # so a compute-dense but byte-light stage (a candidate-pair table
        # is ~16 B/row however big the corpus is; the per-row work is a
        # 64-dim dot or a set intersection) coalesces to 1-4 partitions at
        # the default 1 MB floor and serializes the verify compute.  A
        # 256k floor keeps those stages parallel; stages with real volume
        # are governed by advisoryPartitionSizeInBytes as before (the
        # floor only ever binds when a stage's TOTAL bytes are tiny).
        # Interleaved A/Bs at sf0.1: the verify-heavy set
        # (dd_ngram_jaccard, dd_embedding_cosine, ss_topk_docs,
        # dd_contamination) sums 11.8 s at the 1MB default vs 7.2-8.3 s
        # at 256k (dd_ngram alone 3.2->1.1 s at 128k), while the
        # latency-bound graph family is flat at 256k but pays 8-13% at
        # 128k (many tiny sequential stages x more tasks) — 256k is the
        # measured optimum of that trade.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic session timezone so ts-derived values hash stably.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle spill dir: prefer tmpfs when available (models the per-executor
    # NVMe a real cluster node has; keeps single-box shuffle off the shared
    # slow disk).  Override with SPARK_LOCAL_DIRS.
    if os.environ.get("SPARK_LOCAL_DIRS") is None and os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
