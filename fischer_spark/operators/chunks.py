"""O22/O23 — chunk encode/decode: series points ⇄ compressed chunk structs.

Physical layout reasoning (SURVEY.md §4.2): one chunk per
(series key, chunk window).  applyInPandas shuffles by the chunk key —
that is the ONLY shuffle; encoding itself is per-group numpy/Python,
embarrassingly parallel, no second pass.  stat_min/stat_max/stat_cnt are
zone-map stats: a reader filters chunks on them (and on t_start/t_end)
BEFORE paying the decode cost — poor-man's partition pruning over
compressed blobs.

Not SQL-expressible → no DuckDB oracle; correctness is pinned by the
bit-exact round-trip property tests (tests/test_codec.py) and the
decode(encode(x)) == x Spark test.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fischer_spark.codec.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from fischer_spark.functions.time import bucketize, is_ntz
from fischer_spark.schemas import CHUNK_SCHEMA, SERIES_POINT_SCHEMA

KEY_COLS = ["domain", "metric", "tag"]

TS_CODEC = "dod-v1"
VAL_CODEC = "gorilla-v1"


def encode_chunks(points: DataFrame, chunk_window: str = "1d") -> DataFrame:
    """Series points → one compressed chunk struct per (key, window)."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        ts = pdf["bucket_ts"].values.astype("datetime64[us]").astype(np.int64)
        vals = pdf["value"].to_numpy(dtype=np.float64)
        finite = vals[np.isfinite(vals)]
        return pd.DataFrame(
            {
                "domain": [pdf["domain"].iloc[0]],
                "metric": [pdf["metric"].iloc[0]],
                "tag": [pdf["tag"].iloc[0]],
                "t_start": [pdf["bucket_ts"].iloc[0]],
                "t_end": [pdf["bucket_ts"].iloc[-1]],
                "n": [len(pdf)],
                "ts_codec": [TS_CODEC],
                "val_codec": [VAL_CODEC],
                "ts_bytes": [encode_timestamps(ts)],
                "val_bytes": [encode_values(vals)],
                "stat_min": [float(finite.min()) if len(finite) else None],
                "stat_max": [float(finite.max()) if len(finite) else None],
                "stat_cnt": [len(pdf)],
            }
        )

    src = points.withColumn("_win", bucketize("bucket_ts", chunk_window, is_ntz(points, "bucket_ts")))
    return src.groupBy(*KEY_COLS, "_win").applyInPandas(_encode, schema=CHUNK_SCHEMA)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """Chunk structs → exploded series points (bit-exact inverse)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                ts = decode_timestamps(bytes(row.ts_bytes), n).astype(
                    "datetime64[us]"
                )
                vals = decode_values(bytes(row.val_bytes), n)
                outs.append(
                    pd.DataFrame(
                        {
                            "domain": row.domain,
                            "metric": row.metric,
                            "tag": row.tag,
                            "bucket_ts": ts,
                            "value": vals,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return chunks.mapInPandas(_decode, schema=SERIES_POINT_SCHEMA)


def prune_chunks(
    chunks: DataFrame,
    t_from=None,
    t_to=None,
    v_min: float | None = None,
    v_max: float | None = None,
) -> DataFrame:
    """Zone-map pruning: drop chunks that cannot contain matching points —
    evaluated on the tiny chunk-stat columns, never touching the blobs."""
    out = chunks
    if t_from is not None:
        out = out.filter(F.col("t_end") >= F.lit(t_from))
    if t_to is not None:
        out = out.filter(F.col("t_start") <= F.lit(t_to))
    if v_min is not None:
        out = out.filter(F.col("stat_max") >= F.lit(v_min))
    if v_max is not None:
        out = out.filter(F.col("stat_min") <= F.lit(v_max))
    return out
