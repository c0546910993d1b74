"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os


def get_spark(app_name: str = "lucene_solr_spark", master: str | None = None,
              shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # JVM<->Python worker channel over unix domain sockets: loopback
        # TCP on this kernel stalls ~40ms/ACK per Arrow batch (Nagle +
        # delayed-ACK), which made every UDF stage latency-bound and
        # killed core scaling (measured 9x on a trivial pandas UDF job)
        .config("spark.python.unix.domain.socket.enabled", "true")
        # shuffle/spill through tmpfs when available: this box has 128G
        # RAM and a slow-syscall disk path (measured ~30% of build wall
        # in kernel time on /tmp); on a real cluster leave unset
        .config("spark.local.dir", os.environ.get(
            "SPARK_GRAFT_LOCAL_DIR",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        ))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
