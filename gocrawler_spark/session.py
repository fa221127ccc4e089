"""SparkSession factory tuned for the crawl workload.

Local sandbox runs use ``local[N]``; on a real cluster the same settings
apply (minus master) via spark-submit. Knobs chosen for the frontier
workload:

* AQE on (runtime coalesce + skew-join splitting — the pages join is
  host-skewed by construction).
* Arrow on (every extractor is a pandas UDF / mapInPandas).
* shuffle partitions sized to cores locally; at cluster scale AQE
  coalesces, and frontier tables are bucketed on url_hash so the big
  MERGE/anti-join shuffles hash-partition evenly regardless of host skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app_name: str = "gocrawler-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        # runtime bloom pushdown helps the seen anti-join for free
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # shuffle spill to tmpfs when available: local-mode shuffles otherwise
    # serialize on /tmp disk IO and stop scaling past a few cores
    if os.path.isdir("/dev/shm") and os.environ.get("SPARK_GRAFT_SHM", "1") == "1":
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    # env-driven conf overrides (semicolon-separated k=v pairs): the
    # deployment knob for cluster-side values — e.g. event logging for
    # profiling, shuffle codec, adaptive sizes — without code edits.
    # Applied before extra_conf so explicit caller args still win.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for kv in filter(None, env_conf.split(";")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
