"""Per-stage shuffle/throughput metrics (north rule: "throughput
metrics logged per shuffle stage"; SURVEY §4.2.5).

The reference logs coarse wall times (pagerank.py:187-189, crawler.py:
561-573).  Here every index build can emit a metrics table with one row
per completed Spark stage — task counts, executor run time, input /
output / shuffle-read / shuffle-write bytes, plus the max-vs-median
task-time skew signal SURVEY §7 calls out for hot-term monitoring.

Implementation: the Spark status REST API (spark.ui must be enabled;
`local` and cluster mode serve the same endpoints).  A PySpark-side
SparkListener would need the py4j callback server — heavier and flakier
than polling the status store after the fact.  When the UI is disabled
the collector degrades to an empty frame (callers still get manifest
wall times).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STAGE_METRICS = StructType(
    [
        StructField("build_id", StringType(), False),
        StructField("stage_id", IntegerType(), False),
        StructField("attempt_id", IntegerType(), False),
        StructField("name", StringType(), True),
        StructField("status", StringType(), True),
        StructField("num_tasks", IntegerType(), True),
        StructField("executor_run_time_ms", LongType(), True),
        StructField("input_bytes", LongType(), True),
        StructField("output_bytes", LongType(), True),
        StructField("shuffle_read_bytes", LongType(), True),
        StructField("shuffle_write_bytes", LongType(), True),
        StructField("peak_memory_bytes", LongType(), True),
        StructField("task_time_median_ms", DoubleType(), True),
        StructField("task_time_max_ms", DoubleType(), True),
        StructField("skew_ratio", DoubleType(), True),  # max / median
    ]
)


def _get_json(url: str, timeout: float = 10.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode("utf-8"))


class StageMetricsCollector:
    """Snapshot-diff collector around a unit of work:

        coll = StageMetricsCollector(spark, build_id)
        coll.begin()
        ... run stages ...
        df = coll.collect()          # rows for stages completed since begin()
    """

    def __init__(self, spark: SparkSession, build_id: str = ""):
        self.spark = spark
        self.build_id = build_id
        self._base: Optional[str] = None
        self._seen: set[tuple[int, int]] = set()
        ui = spark.sparkContext.uiWebUrl
        if ui:
            app_id = spark.sparkContext.applicationId
            self._base = f"{ui}/api/v1/applications/{app_id}"

    def _stages(self) -> list[dict]:
        """Completed stages from the status REST API.  Failures RAISE:
        metrics collection is opt-in diagnostics, and a silently-empty
        baseline would make collect() misattribute every earlier stage
        in the session to this build (the builder's fail-loudly check
        guards only a missing UI, not a failed request)."""
        if not self._base:
            return []
        return _get_json(f"{self._base}/stages?status=complete")

    def begin(self) -> None:
        self._seen = {(s["stageId"], s["attemptId"]) for s in self._stages()}

    def _task_quantiles(self, stage_id: int, attempt: int):
        try:
            q = _get_json(
                f"{self._base}/stages/{stage_id}/{attempt}/taskSummary"
                "?quantiles=0.5,1.0"
            )
            rt = q.get("executorRunTime", [None, None])
            return float(rt[0]), float(rt[1])
        except Exception:
            return None, None

    def collect(self) -> DataFrame:
        rows = []
        for s in self._stages():
            key = (s["stageId"], s["attemptId"])
            if key in self._seen:
                continue
            # fold into the baseline so successive collect() snapshots
            # compose without double-reporting a stage
            self._seen.add(key)
            med, mx = self._task_quantiles(*key)
            skew = (mx / med) if (med and mx and med > 0) else None
            rows.append(
                (
                    self.build_id,
                    s["stageId"],
                    s["attemptId"],
                    (s.get("name") or "")[:200],
                    s.get("status"),
                    s.get("numCompleteTasks"),
                    s.get("executorRunTime"),
                    s.get("inputBytes"),
                    s.get("outputBytes"),
                    s.get("shuffleReadBytes"),
                    s.get("shuffleWriteBytes"),
                    s.get("peakExecutionMemory"),
                    med,
                    mx,
                    skew,
                )
            )
        return self.spark.createDataFrame(rows, schema=STAGE_METRICS)
