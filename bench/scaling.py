#!/usr/bin/env python
"""§6 scaling-efficiency evidence: the same rollup job at two parallelism
levels (default local[4] vs local[16], an N→4N step), separate JVMs,
fresh processes — the sandbox stand-in for the north rule's N vs 4N
executors (no real cluster here; see BENCH/BASELINE.md for the design
math that carries this to 1000 executors).

Protocol:
  1. synth_series → parquet once (input prep, untimed);
  2. per parallelism level, `--repeat` fresh runs of
     read → salted tiered rollup (1m/1h/1d) → count actions  [timed]
     then detectors + intervals                               [timed];
     per-level wall = min over repeats (discards JIT/interference noise);
  3. efficiency = (pps_high / pps_low) / (high/low cores).

Prints one JSON line; also rewrites the measured block in
BENCH/BASELINE.md unless --no-update.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]

_RUN_SNIPPET = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from fischer_spark.session import get_spark
from fischer_spark.operators.rollup import tiered_rollups, with_derived_stats
from fischer_spark.operators.detect import zscore_window, seasonal_score, anomaly_intervals
from pyspark.sql import functions as F
c = {cpus}
# Bench conf notes: shuffle partitions at 4×cores for reduce-side slot
# utilization; AQE partition COALESCING off — its 64 MB advisory target
# is sized for cluster tasks and under-parallelizes a 300 MB local
# shuffle down to ~5 tasks (measured +26% wall at 16 cores).  Skew-join
# splitting and the rest of AQE stay on.
spark = get_spark(
    "scaling", master=f"local[{{c}}]", shuffle_partitions=64,
    extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}},
)
spark.range(10_000_000).agg(F.sum("id")).collect()  # JIT warm
pts = spark.read.parquet({src!r})
n = pts.count()
t0 = time.perf_counter()
# unsalted raw->1m: map-side partial aggregation already collapses hot
# (key, minute) groups; salting fine buckets would 5x the shuffled state
# rows (measured 68M vs 13M on this input).  Salting is for coarse
# hot-group aggs — see rollup_points_salted docstring.
tiers = tiered_rollups(pts, salt_k=None)
for df in tiers.values():
    df.persist()
tier_rows = {{t: df.count() for t, df in tiers.items()}}
t_roll = time.perf_counter() - t0
t0 = time.perf_counter()
hourly = with_derived_stats(tiers["1h"]).select(
    "domain", "metric", "tag", "bucket_ts", F.col("mean").alias("value"))
iv = anomaly_intervals(zscore_window(hourly, 24, 8), tau=3.0).count()
iv += anomaly_intervals(seasonal_score(hourly), tau=3.0).count()
t_det = time.perf_counter() - t0
print(json.dumps({{"n": n, "t_roll": t_roll, "t_det": t_det,
                   "tier_rows": tier_rows, "ivals": iv}}))
spark.stop()
"""


def _run(code: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def prepare_input(n_keys: int, points_per_key: int) -> str:
    src = os.path.join(tempfile.gettempdir(), f"scaling_series_{n_keys}x{points_per_key}.parquet")
    if os.path.exists(os.path.join(src, "_SUCCESS")):
        return src
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from fischer_spark.session import get_spark\n"
        "from fischer_spark.sources.series_gen import synth_series\n"
        'spark = get_spark("gen", master="local[32]")\n'
        f"synth_series(spark, n_keys={n_keys}, points_per_key={points_per_key})"
        f'.write.mode("overwrite").parquet({src!r})\n'
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    return src


def measure_interleaved(low: int, high: int, src: str, repeat: int) -> tuple[dict, dict]:
    """Alternate low/high runs (L H L H …) so intermittent host
    interference (observed: occasional 2-3× slowdown windows on this
    sandbox) hits both levels equally; keep the min per level."""
    best: dict[int, dict | None] = {low: None, high: None}
    for _ in range(repeat):
        for cpus in (low, high):
            r = _run(_RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, src=src))
            b = best[cpus]
            if b is None or r["t_roll"] + r["t_det"] < b["t_roll"] + b["t_det"]:
                best[cpus] = r
            time.sleep(4)  # let the JVM die fully before the next run
    for r in best.values():
        assert r is not None
        r["pps_rollup"] = round(r["n"] / r["t_roll"], 1)
        r["pps_total"] = round(r["n"] / (r["t_roll"] + r["t_det"]), 1)
    return best[low], best[high]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=2000)
    ap.add_argument("--points-per-key", type=int, default=10000)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-update", action="store_true")
    args = ap.parse_args()

    src = prepare_input(args.keys, args.points_per_key)
    r_low, r_high = measure_interleaved(args.low, args.high, src, args.repeat)
    factor = args.high / args.low
    eff = round((r_high["pps_rollup"] / r_low["pps_rollup"]) / factor, 3)
    eff_total = round((r_high["pps_total"] / r_low["pps_total"]) / factor, 3)
    result = {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "low_cores": args.low,
        "high_cores": args.high,
        "series_points": r_low["n"],
        "rolled_up_points_per_sec_low": r_low["pps_rollup"],
        "rolled_up_points_per_sec_high": r_high["pps_rollup"],
        "efficiency_rollup": eff,
        "efficiency_with_detect": eff_total,
        "low": r_low,
        "high": r_high,
    }
    print(json.dumps(result))

    if not args.no_update:
        md = REPO / "BENCH" / "BASELINE.md"
        md.parent.mkdir(exist_ok=True)
        block = (
            "<!-- AUTOGENERATED by bench/scaling.py -->\n"
            "## Measured scaling (latest run)\n\n"
            f"Input: {r_low['n']:,} series points ({args.keys} keys × {args.points_per_key}), "
            f"min of {args.repeat} fresh-JVM runs per level.\n\n"
            "| config | rollup wall (s) | detect wall (s) | rolled-up points/sec (rollup) |\n"
            "|---|---|---|---|\n"
            f"| local[{args.low}] | {r_low['t_roll']:.1f} | {r_low['t_det']:.1f} | {r_low['pps_rollup']:,.0f} |\n"
            f"| local[{args.high}] | {r_high['t_roll']:.1f} | {r_high['t_det']:.1f} | {r_high['pps_rollup']:,.0f} |\n\n"
            f"**Scaling efficiency ({args.low}→{args.high} cores, {factor:.0f}×): "
            f"rollup {eff:.3f}, rollup+detect {eff_total:.3f}** (target ≥ 0.8)\n"
        )
        marker = "<!-- AUTOGENERATED by bench/scaling.py -->"
        if md.exists():
            txt = md.read_text()
            txt = txt.split(marker)[0].rstrip() + "\n\n" + block
        else:
            txt = block
        md.write_text(txt)


if __name__ == "__main__":
    main()
