"""§3.2 — the fluent series API. Thin wrappers over DataFrames: the IR
*is* the Catalyst logical plan (no custom IR by design); nothing executes
until an action on `.df`.

    Series.from_pages(pages, families=("crawl_rate",))
          .gapfill("locf", tier="1h")
          .rollup("1h")
          .score("zscore", w=24, tau=3.0)
          .intervals(tau=3.0)
          .df.show()
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fischer_spark.operators.detect import (
    anomaly_intervals,
    seasonal_score,
    zscore_window,
)
from fischer_spark.operators.gapfill import gapfill_linear, gapfill_locf
from fischer_spark.operators.rollup import (
    rollup_points,
    rollup_points_salted,
    with_derived_stats,
)
from fischer_spark.operators.series import build_series


@dataclass
class Series:
    """A lazily-built series computation; `.df` exposes the plan."""

    df: DataFrame
    tier: str | None = None

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_pages(cls, pages: DataFrame, families: tuple[str, ...] = ("crawl_rate",)) -> "Series":
        return cls(build_series(pages, families))

    @classmethod
    def from_points(cls, points: DataFrame) -> "Series":
        return cls(points)

    # -- transforms ---------------------------------------------------------

    def gapfill(self, method: str = "locf", tier: str = "1h") -> "Series":
        fn = {"locf": gapfill_locf, "linear": gapfill_linear}[method]
        filled = fn(self.df, tier)
        out = filled.select(
            "domain",
            "metric",
            "tag",
            "bucket_ts",
            F.col("value_filled").alias("value"),
        )
        return Series(out, tier)

    def rollup(self, tier: str, salt_k: int | None = None) -> "Series":
        states = (
            rollup_points_salted(self.df, tier, salt_k)
            if salt_k
            else rollup_points(self.df, tier)
        )
        pts = with_derived_stats(states).select(
            "domain", "metric", "tag", "bucket_ts", F.col("mean").alias("value")
        )
        return Series(pts, tier)

    def score(self, detector: str = "zscore", w: int = 24, min_periods: int = 8, min_slot_n: int = 3, **_) -> "Series":
        if detector == "zscore":
            scored = zscore_window(self.df, w=w, min_periods=min_periods)
        elif detector == "seasonal":
            scored = seasonal_score(self.df, min_slot_n=min_slot_n)
        else:
            raise ValueError(f"unknown detector {detector!r}")
        s = Series(scored, self.tier)
        s._detector = detector  # type: ignore[attr-defined]
        return s

    def intervals(self, tau: float = 3.0) -> "Series":
        det = getattr(self, "_detector", "zscore")
        return Series(
            anomaly_intervals(self.df, tau=tau, tier=self.tier or "1h", detector=det),
            self.tier,
        )

    # -- introspection ------------------------------------------------------

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)
