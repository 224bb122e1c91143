"""SparkSession factory with scale-oriented defaults.

Local sandbox runs on local[N]; the same configs are what we'd submit to
a 1000-executor cluster (AQE, skew-join handling, Arrow batching).  The
table layer is parquet-path based (Iceberg jars are not available in
this sandbox); every physical path is centralized in
`index.builder.IndexPaths`, so swapping the storage layer to Iceberg
(`writeTo(...)` + `MERGE INTO`) touches one module.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(
    app_name: str = "search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 32)

    # Make this package importable in executor Python workers regardless of
    # the driver's cwd — the local-mode equivalent of spark-submit --py-files.
    root = _repo_root()
    pypath = os.environ.get("PYTHONPATH", "")
    if root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = root + (os.pathsep + pypath if pypath else "")

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches: html rows are ~5-10 KB, so 10k-row batches
        # hold 50-100 MB per worker — 32 workers thrash the LLC / memory
        # bus.  2k rows keeps each worker's working set ~cache-sized.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def configured_master() -> str | None:
    """A cluster master configured OUTSIDE spark-submit — the MASTER
    env var or a spark.master line in $SPARK_HOME/conf/
    spark-defaults.conf.  When one exists, the local fallback in
    submit_or_local must NOT override it: builder.master() takes
    precedence over the defaults file, so forcing local would silently
    pull a configured cluster job onto the driver box."""
    configured = os.environ.get("MASTER")
    home = os.environ.get("SPARK_HOME")
    if not configured and home:
        defaults = os.path.join(home, "conf", "spark-defaults.conf")
        try:
            with open(defaults) as f:
                for line in f:
                    parts = line.strip().split(None, 1)
                    if len(parts) == 2 and parts[0] == "spark.master":
                        configured = parts[1]
        except OSError:
            pass
    return configured or None


def submit_or_local(
    app_name: str,
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Session resolver for the scripts/submit_*.py cluster drivers.

    Under spark-submit the submitted conf (master, memory, --py-files)
    must win, so the builder adds nothing; launched as plain
    ``python scripts/submit_*.py`` there IS no submitted conf — the
    bare builder would silently start an untuned local JVM with the 1g
    default heap and 10k-row Arrow batches, which OOMs on any real
    corpus with a misleading Arrow/heap stack (measured: a 240k-page
    build that runs in 66 s on the tuned session).  spark-submit's
    PythonRunner always exports PYSPARK_GATEWAY_PORT to the driver
    process, so its absence identifies the plain-python case reliably.
    """
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        if not configured_master():
            master = f"local[{default_parallelism()}]"
            print(
                f"[session] not launched via spark-submit and no "
                f"configured master found; using tuned local session "
                f"master={master}",
                file=sys.stderr,
            )
    if master:
        return get_spark(app_name=app_name, master=master, extra_conf=extra_conf)
    b = SparkSession.builder.appName(app_name)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
