"""§4.3 — per-partition lineage + metrics rows (BASELINE.json north_rule).

`with_lineage` is a zero-copy pass-through: a mapInPandas stage that
counts rows/bytes per task partition and, when its partition is
exhausted, drops one JSON fragment into the run's lineage directory.
The data stream itself is untouched, so it composes under any operator.

Fragments are keyed by (stage, partition_id, task_attempt); a retried
task overwrites its own attempt file, and `read_lineage` keeps the last
attempt per partition — the same idempotency contract Iceberg commits
give real clusters.  In local mode the directory is the local FS; on a
cluster it would be shared storage (same code path).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame


def with_lineage(df: DataFrame, root: str, run_id: str, stage: str) -> DataFrame:
    out_dir = os.path.join(root, "_lineage", run_id, stage)
    os.makedirs(out_dir, exist_ok=True)
    schema = df.schema

    def _pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        rows = 0
        approx_bytes = 0
        for pdf in batches:
            rows += len(pdf)
            approx_bytes += int(pdf.memory_usage(deep=False).sum())
            yield pdf
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        attempt = ctx.attemptNumber() if ctx else 0
        frag = {
            "run_id": run_id,
            "stage": stage,
            "partition_id": pid,
            "input_rows": rows,
            "approx_bytes": approx_bytes,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 3),
            "attempt": attempt,
        }
        tmp = os.path.join(out_dir, f".p{pid:05d}-a{attempt}.tmp")
        with open(tmp, "w") as f:
            json.dump(frag, f)
        os.replace(tmp, os.path.join(out_dir, f"p{pid:05d}-a{attempt}.json"))

    return df.mapInPandas(_pass, schema=schema)


def read_lineage(spark, root: str, run_id: str | None = None):
    """Lineage fragments → DataFrame (one row per stage/partition, last
    attempt wins)."""
    base = os.path.join(root, "_lineage")
    frags: dict[tuple, dict] = {}
    runs = [run_id] if run_id else sorted(os.listdir(base))
    for r in runs:
        rdir = os.path.join(base, r)
        if not os.path.isdir(rdir):
            continue
        for stage in sorted(os.listdir(rdir)):
            sdir = os.path.join(rdir, stage)
            for fn in sorted(os.listdir(sdir)):
                if fn.endswith(".json"):
                    with open(os.path.join(sdir, fn)) as f:
                        d = json.load(f)
                    key = (d["run_id"], d["stage"], d["partition_id"])
                    if key not in frags or d["attempt"] >= frags[key]["attempt"]:
                        frags[key] = d
    rows = list(frags.values())
    schema = (
        "run_id string, stage string, partition_id int, input_rows long, "
        "approx_bytes long, wall_ms double, attempt int"
    )
    return spark.createDataFrame(rows, schema=schema) if rows else spark.createDataFrame([], schema)
