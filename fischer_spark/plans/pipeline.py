"""§3.1 — the end-to-end rollup pipeline with checkpoint/resume (O6).

Stage DAG (each stage reads ONLY its parents' stored snapshots, so a
resumed run never recomputes upstream work):

  pages → series → rollup_1m → rollup_1h → rollup_1d
                     └────────────┴→ zscore_intervals / seasonal_intervals
  series → chunks

Resume protocol: after each stage commits, (stage → snapshot_id) is
recorded in <root>/_runs/<run_id>.json via atomic temp+rename.  A rerun
with the same run_id skips every recorded stage; outputs are identical
because stage logic is deterministic and inputs are pinned by snapshot id
(tested in tests/test_pipeline.py with lineage-fragment proof of
non-recompute).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fischer_spark.operators.chunks import encode_chunks
from fischer_spark.operators.histogram import hist_merge
from fischer_spark.operators.detect import (
    anomaly_intervals,
    seasonal_score,
    zscore_window,
)
from fischer_spark.operators.rollup import (
    rollup_points,
    rollup_points_salted,
    rollup_states,
    rollup_states_calendar,
    with_derived_stats,
)
from fischer_spark.operators.series import (
    build_series,
    decode_series_keys,
    encode_series_keys,
)
from fischer_spark.plans.lineage import with_lineage
from fischer_spark.sources.storage import ParquetManifestStore, _atomic_write_json


class RollupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        store: ParquetManifestStore,
        run_id: str,
        salt_k: int | None = None,  # salt coarse hot groups only — see rollup_points_salted

        zscore_w: int = 24,
        tau: float = 3.0,
        impl: str = "decimal",  # rollup state impl; "fixed64" = long fast path
        encode_keys: bool = False,  # dictionary-encode series keys in the rollup hot path
        gapfill: str | None = None,  # "locf" | "linear": fill the 1m spine before rollup
        hist: bool = False,  # also materialize the percentile tier family (hist_1h/hist_1d)
        # binning params PER METRIC FAMILY — each family gets its own
        # (lo, hi, n_bins) because bin edges are family-shaped (bytes vs
        # rates); a bare tuple is accepted as the page_size-only legacy form
        hist_params: dict[str, tuple[float, float, int]] | tuple = None,  # type: ignore[assignment]
        # day-partition time-keyed tables on commit (Iceberg
        # days(bucket_ts) hidden-partitioning analogue). Opt-in: at
        # sandbox scale partitioned writes fan small files out per
        # (task, day); at cluster scale it is the right default for
        # tier tables read by time range (reads list only the window's
        # day directories). See sources/storage.py.
        partition_days: bool = False,
        # calendar retention tiers to materialize AFTER rollup_1d
        # (subset of {"1w","1mo","1y"}): 1w/1mo merge the 1d states,
        # 1y merges 1mo when present (months nest in years; ISO weeks
        # don't nest in months, so 1w always comes from 1d).  These
        # tables are tiny (≤ keys × months) and retained forever.
        calendar: tuple = (),
    ):
        from fischer_spark.deploy import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.store = store
        self.run_id = run_id
        self.salt_k = salt_k
        self.zscore_w = zscore_w
        self.tau = tau
        self.impl = impl
        self.encode_keys = encode_keys
        if gapfill not in (None, "locf", "linear"):
            raise ValueError(f"unknown gapfill method {gapfill!r}")
        self.gapfill = gapfill
        self.hist = hist
        if hist_params is None:
            hist_params = {"page_size": (0.0, float(1 << 20), 256)}
        elif isinstance(hist_params, tuple):
            hist_params = {"page_size": hist_params}
        self.hist_params = hist_params
        self.partition_days = partition_days
        bad = set(calendar) - {"1w", "1mo", "1y"}
        if bad:
            raise ValueError(f"unknown calendar tiers {sorted(bad)}; choose from 1w/1mo/1y")
        self.calendar = tuple(t for t in ("1w", "1mo", "1y") if t in calendar)
        self._runpath = os.path.join(store.root, "_runs", f"{run_id}.json")

    # -- run-manifest ------------------------------------------------------

    def _state(self) -> dict:
        if os.path.exists(self._runpath):
            with open(self._runpath) as f:
                return json.load(f)
        return {"stages": {}}

    def _record(self, stage: str, snapshot_id: str) -> None:
        st = self._state()
        st["stages"][stage] = snapshot_id
        _atomic_write_json(self._runpath, st)

    def completed(self) -> dict[str, str]:
        return dict(self._state()["stages"])

    # -- stages ------------------------------------------------------------

    def _run_stage(self, stage: str, table: str, build: "callable") -> str:
        done = self._state()["stages"]
        if stage in done:
            return done[stage]
        df = build()
        df = with_lineage(df, self.store.root, self.run_id, stage)
        day_col = (
            "bucket_ts"
            if self.partition_days
            and (table.startswith(("rollup_", "hist_")) or table.startswith("series"))
            # calendar tables hold ≤ keys × months rows — day directories
            # would be pure file-count overhead with zero pruning value
            and table not in ("rollup_1w", "rollup_1mo", "rollup_1y")
            else None
        )
        snap = self.store.append(table, df, day_col=day_col)
        self._record(stage, snap)
        return snap

    def run(self, pages: DataFrame, until: str | None = None) -> dict[str, str]:
        """Execute (or resume) the full DAG; `until` stops after a stage —
        the crash-injection hook for resume tests."""
        order = [
            "series",
            *(["key_dim"] if self.encode_keys else []),
            *(["series_filled"] if self.gapfill else []),
            "rollup_1m",
            "rollup_1h",
            "rollup_1d",
            *[f"rollup_{t}" for t in self.calendar],
            *(["hist_1h", "hist_1d"] if self.hist else []),
            "zscore_intervals",
            "seasonal_intervals",
            "chunks",
        ]
        builders = {
            "series": lambda: build_series(pages),
            # the dim is computed ONCE here (a distinct over the stored
            # series parquet — never over the un-materialized build) and
            # persisted; every later consumer (detectors, query_range)
            # reads it back instead of re-scanning the series table
            "key_dim": lambda: encode_series_keys(
                self.store.read("series", self.completed().get("series"))
            )[1],
            "series_filled": lambda: self._gapfilled_series(),
            "rollup_1m": lambda: (
                rollup_points_salted(self._series_points(), "1m", self.salt_k, self.impl)
                if self.salt_k
                else rollup_points(self._series_points(), "1m", self.impl)
            ),
            "rollup_1h": lambda: rollup_states(
                self.store.read("rollup_1m", self.completed().get("rollup_1m")), "1h"
            ),
            "rollup_1d": lambda: rollup_states(
                self.store.read("rollup_1h", self.completed().get("rollup_1h")), "1d"
            ),
            # percentile tier family over the page_size series (the
            # latency-shaped metric): hist_1h from raw points once, then
            # hist_1d by exact integer merge — same cascade discipline as
            # the rollup tiers
            # calendar tiers: exact state merge of the 1d table (1y from
            # 1mo when materialized — months nest in years)
            "rollup_1w": lambda: rollup_states_calendar(
                self.store.read("rollup_1d", self.completed().get("rollup_1d")), "1w"
            ),
            "rollup_1mo": lambda: rollup_states_calendar(
                self.store.read("rollup_1d", self.completed().get("rollup_1d")), "1mo"
            ),
            "rollup_1y": lambda: rollup_states_calendar(
                self.store.read("rollup_1mo", self.completed().get("rollup_1mo")), "1y"
            )
            if "1mo" in self.calendar
            else rollup_states_calendar(
                self.store.read("rollup_1d", self.completed().get("rollup_1d")), "1y"
            ),
            "hist_1h": lambda: self._hist_states("1h"),
            "hist_1d": lambda: hist_merge(
                self.store.read("hist_1h", self.completed().get("hist_1h")), "1d"
            ),
            "zscore_intervals": lambda: anomaly_intervals(
                zscore_window(self._hourly_means(), w=self.zscore_w, min_periods=8),
                tau=self.tau,
                tier="1h",
                detector="zscore",
            ),
            "seasonal_intervals": lambda: anomaly_intervals(
                seasonal_score(self._hourly_means()),
                tau=self.tau,
                tier="1h",
                detector="seasonal",
            ),
            "chunks": lambda: encode_chunks(
                self.store.read("series", self.completed().get("series")), "1d"
            ),
        }
        out: dict[str, str] = {}
        for stage in order:
            out[stage] = self._run_stage(stage, stage, builders[stage])
            if stage in ("hist_1h", "hist_1d"):
                # persist the binning params as table properties — the read
                # path (query_range_hist) and the late-data refresh MUST use
                # the exact build params or stored bin indices silently
                # reinterpret against different edges (ADVICE r2); per-family
                # map (r3) — each metric family has its own bin edges
                self.store.set_meta(
                    stage,
                    hist_params={m: list(p) for m, p in self.hist_params.items()},
                )
            if until == stage:
                break
        return out

    def _hist_states(self, tier: str) -> DataFrame:
        from fischer_spark.operators.histogram import hist_states_families

        pts = self._series_points()
        dim = (
            self.store.read("key_dim", self.completed().get("key_dim"))
            if "key_id" in pts.columns
            else None
        )
        return hist_states_families(pts, tier, self.hist_params, key_dim=dim)

    def _gapfilled_series(self) -> DataFrame:
        """North-star ordering: the 1m bucket spine is gap-filled
        (LOCF/linear) BEFORE rollup, so continuous aggregates and
        detectors see a dense series.  Leading/edge buckets the method
        cannot fill stay absent (dropped nulls), matching the gap-fill
        operator's documented edge semantics."""
        from fischer_spark.operators.gapfill import gapfill_linear, gapfill_locf

        fn = {"locf": gapfill_locf, "linear": gapfill_linear}[self.gapfill]
        filled = fn(self.store.read("series", self.completed().get("series")), "1m")
        return filled.filter(F.col("value_filled").isNotNull()).select(
            "domain",
            "metric",
            "tag",
            "bucket_ts",
            F.col("value_filled").alias("value"),
        )

    def _series_points(self) -> DataFrame:
        """The stored series (gap-filled stage when configured),
        key-encoded for the rollup hot path when configured (one long
        key instead of three strings through the full-volume shuffle;
        encoding is a stateless hash so this costs no shuffle — the dim
        used to decode on the read side is the persisted key_dim stage)."""
        table = "series_filled" if self.gapfill else "series"
        src = self.store.read(table, self.completed().get(table))
        if self.encode_keys:
            src, _ = encode_series_keys(src)
        return src

    def _hourly_means(self) -> DataFrame:
        states = self.store.read("rollup_1h", self.completed().get("rollup_1h"))
        if self.encode_keys:
            dim = self.store.read("key_dim", self.completed().get("key_dim"))
            states = decode_series_keys(states, dim)
        return with_derived_stats(states).select(
            "domain", "metric", "tag", "bucket_ts", F.col("mean").alias("value")
        )
