"""SparkSession factory with scale-oriented defaults.

The reference parallelizes with one goroutine per indexer
(/root/reference/flowindexer/flowindexer.go:429-435, GOMAXPROCS at
main.go:19); here parallelism is Spark's job, but shuffle sizing and AQE
are configured explicitly per the north_rule ("partitioning / shuffle /
skew handled explicitly").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flow-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else ``local[*]``).
    - ``shuffle_partitions`` defaults to the core count so small jobs do not
      fan 200 tiny tasks; production jobs override to ~2-3x total cores.
    - AQE is on: runtime coalescing of shuffle partitions and skew-join
      splitting replace most manual tuning at cluster scale.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        inner = master.partition("[")[2].rstrip("]")
        shuffle_partitions = 32 if inner in ("", "*") else max(int(inner), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # collect_list/collect_set run as ObjectHashAggregate; the default
        # sort-based fallback threshold (128 distinct keys per task) turns
        # the postings build into a full sort — raise it so hash aggregation
        # survives high-cardinality entity keys (spills still protect memory).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", str(1 << 22))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet bloom filters on the posting key column: the analogue of
        # the reference's LevelDB bloom filter (store/leveldb.go:35).
        .config("spark.hadoop.parquet.bloom.filter.enabled#entity_key", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # S12 backend health check (reference Backend.Check,
    # /root/reference/backend/backend.go:15): fail fast at session build if
    # the Arrow stack / JVM the UDF stages need is missing, not task-time.
    from flow_indexer_spark.health import check, check_arrow_stack, check_java

    check_java()
    check_arrow_stack()
    spark = builder.getOrCreate()
    check(spark)
    return spark
