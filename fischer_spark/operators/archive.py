"""O88 — archive tier: Gorilla/d-o-d compressed cold storage of rollup
TIER STATES, completing the retention ladder (SURVEY §2.4): raw points
already expire into compressed chunks (operators/chunks.py); without
this, tier rows past their horizon could only be deleted.  Archiving
keeps the full state algebra — cnt/sum/sq/min/max, NOT just the mean —
so archived ranges still re-aggregate exactly (query_range semantics
are preserved bit-for-bit across the hot/cold boundary).

Encoding per column kind (bit-exact round trip for all three):
- ``bucket_ts`` → dod-v1 (sorted int64 µs, same codec as raw chunks);
- long states → gorilla-v1 over the int64 BIT PATTERNS (``.view``, no
  numeric conversion — Gorilla XORs patterns, so any 64-bit payload is
  lossless; nearby counts/sums XOR to few significant bits and compress
  like values);
- decimal(p,s) states (the decimal impl's exact sums, up to 28 digits >
  int64) → the unscaled integer split into two int64 limbs
  (``u >> 64``, ``u & (2^64-1)``), each gorilla-coded; the codec string
  carries (p, s) so decode rebuilds the exact Decimal.

Physical layout mirrors chunks.py: one archive chunk per (series key,
chunk window); the groupBy is the ONLY shuffle, encoding is per-group
numpy, zone-map stats (t_start/t_end/stat_cnt) let readers prune before
decoding.  At 10^12-doc scale the 1m tier is the retention pressure
point (~1/60th of raw rows, forever); a 30d archive chunk holds ≤43 200
states per key and compresses the long states 5-15x.

Not SQL-expressible → rows-only; correctness is the archived-equals-
original bit-exact test plus query-parity across the boundary
(tests/test_archive.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fischer_spark.codec.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from fischer_spark.functions.time import bucketize, is_ntz

_MASK64 = (1 << 64) - 1


def _enc_i64(arr: np.ndarray) -> bytes:
    return encode_values(np.asarray(arr, dtype=np.int64).view(np.float64))


def _dec_i64(b: bytes, n: int) -> np.ndarray:
    return decode_values(b, n).view(np.int64)


def _key_cols(df: DataFrame) -> list[str]:
    return ["key_id"] if "key_id" in df.columns else ["domain", "metric", "tag"]


def _state_kinds(df: DataFrame) -> dict[str, str]:
    """Column → codec id for every non-key, non-bucket_ts, non-tier column.
    The codec string is self-describing so decode needs no side channel."""
    kinds: dict[str, str] = {}
    skip = set(_key_cols(df)) | {"bucket_ts", "tier"}
    for f in df.schema.fields:
        if f.name in skip:
            continue
        if isinstance(f.dataType, T.LongType):
            kinds[f.name] = "i64-gorilla-v1"
        elif isinstance(f.dataType, T.IntegerType):
            # hist tier `bin` column: widen to i64 on encode, narrow back
            # on decode (values are small bin indices — lossless)
            kinds[f.name] = "i32-gorilla-v1"
        elif isinstance(f.dataType, T.DoubleType):
            kinds[f.name] = "f64-gorilla-v1"
        elif isinstance(f.dataType, T.DecimalType):
            kinds[f.name] = (
                f"dec128-gorilla-v1:{f.dataType.precision},{f.dataType.scale}"
            )
        else:
            raise TypeError(
                f"archive: unsupported state column {f.name}: {f.dataType} "
                "(long/int/double/decimal only — tier state tables hold "
                "nothing else by construction)"
            )
    return kinds


def _archive_schema(key_id: bool) -> T.StructType:
    key_fields = (
        [T.StructField("key_id", T.LongType(), False)]
        if key_id
        else [
            T.StructField("domain", T.StringType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("tag", T.StringType(), True),
        ]
    )
    return T.StructType(
        key_fields
        + [
            T.StructField("tier", T.StringType(), False),
            T.StructField("t_start", T.TimestampType(), False),
            T.StructField("t_end", T.TimestampType(), False),
            T.StructField("n", T.IntegerType(), False),
            T.StructField("ts_bytes", T.BinaryType(), False),
            T.StructField(
                "state_bytes", T.MapType(T.StringType(), T.BinaryType()), False
            ),
            T.StructField(
                "state_codecs", T.MapType(T.StringType(), T.StringType()), False
            ),
            T.StructField("stat_cnt", T.LongType(), False),
        ]
    )


def _encode_series(col: pd.Series, codec: str) -> dict[str, bytes]:
    """One state column → its byte stream(s); decimals emit two limbs."""
    if codec in ("i64-gorilla-v1", "i32-gorilla-v1"):
        return {"": _enc_i64(col.to_numpy(dtype=np.int64))}
    if codec == "f64-gorilla-v1":
        return {"": encode_values(col.to_numpy(dtype=np.float64))}
    # dec128: exact unscaled ints → (hi, lo) int64 limbs
    scale = int(codec.rsplit(",", 1)[1])
    q = 10**scale
    us = [
        int((Decimal(str(v)) if not isinstance(v, Decimal) else v) * q)
        for v in col
    ]
    hi = np.array([u >> 64 for u in us], dtype=np.int64)
    # u & mask is in [0, 2^64): bias into int64 via uint64 view
    lo = np.array([u & _MASK64 for u in us], dtype=np.uint64).view(np.int64)
    return {".hi": _enc_i64(hi), ".lo": _enc_i64(lo)}


def _decode_series(
    blobs: dict[str, bytes], name: str, codec: str, n: int
):
    if codec == "i64-gorilla-v1":
        return _dec_i64(blobs[name], n)
    if codec == "i32-gorilla-v1":
        return _dec_i64(blobs[name], n).astype(np.int32)
    if codec == "f64-gorilla-v1":
        return decode_values(blobs[name], n)
    scale = int(codec.rsplit(",", 1)[1])
    q = Decimal(10) ** -scale
    hi = _dec_i64(blobs[name + ".hi"], n)
    lo = _dec_i64(blobs[name + ".lo"], n).view(np.uint64)
    return [
        (Decimal((int(h) << 64) + int(lo_)) * q).quantize(q)
        for h, lo_ in zip(hi.tolist(), lo.tolist())
    ]


def encode_state_chunks(states: DataFrame, chunk_window: str = "1mo") -> DataFrame:
    """Tier-state rows → one compressed archive chunk per (key, window).

    ``chunk_window`` accepts the bucketize tiers plus the calendar units
    (a month of 1m states is 43 200 rows — the sweet spot between blob
    size and prune granularity)."""
    keys = _key_cols(states)
    kinds = _state_kinds(states)
    schema = _archive_schema(key_id="key_id" in keys)

    # long-form tables (histograms) hold several rows per bucket — the
    # in-chunk order must still be total for a deterministic byte stream
    sort_cols = ["bucket_ts"] + (["bin"] if "bin" in kinds else [])
    cnt_col = "cnt" if "cnt" in kinds else ("bin_cnt" if "bin_cnt" in kinds else None)

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        ts = pdf["bucket_ts"].values.astype("datetime64[us]").astype(np.int64)
        blobs: dict[str, bytes] = {}
        for name, codec in kinds.items():
            for suffix, b in _encode_series(pdf[name], codec).items():
                blobs[name + suffix] = b
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update(
            {
                "tier": [pdf["tier"].iloc[0]],
                "t_start": [pdf["bucket_ts"].iloc[0]],
                "t_end": [pdf["bucket_ts"].iloc[-1]],
                "n": [len(pdf)],
                "ts_bytes": [encode_timestamps(ts)],
                "state_bytes": [blobs],
                "state_codecs": [dict(kinds)],
                "stat_cnt": [int(pdf[cnt_col].sum()) if cnt_col else len(pdf)],
            }
        )
        return pd.DataFrame(row)

    win = (
        F.date_trunc(
            {"1w": "week", "1mo": "month", "1y": "year"}[chunk_window],
            "bucket_ts",
        )
        if chunk_window in ("1w", "1mo", "1y")
        else bucketize("bucket_ts", chunk_window, is_ntz(states, "bucket_ts"))
    )
    return states.groupBy(*keys, win.alias("_win")).applyInPandas(
        _encode, schema=schema
    )


def decode_state_chunks(chunks: DataFrame, state_schema: T.StructType) -> DataFrame:
    """Archive chunks → tier-state rows, bit-exact inverse of
    ``encode_state_chunks``.  ``state_schema`` is the original tier
    table's schema (readers get it from the live tier or the store's
    table meta) — mapInPandas needs it declared up front."""
    keys = [
        f.name
        for f in state_schema.fields
        if f.name in ("key_id", "domain", "metric", "tag")
    ]
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                out = {k: getattr(row, k) for k in keys}
                out["tier"] = row.tier
                cols = {
                    "bucket_ts": decode_timestamps(
                        bytes(row.ts_bytes), n
                    ).astype("datetime64[us]")
                }
                blobs = {k: bytes(v) for k, v in row.state_bytes.items()}
                for name, codec in row.state_codecs.items():
                    cols[name] = _decode_series(blobs, name, codec, n)
                df = pd.DataFrame(cols)
                for k, v in out.items():
                    df[k] = v
                outs.append(df)
            if outs:
                yield pd.concat(outs, ignore_index=True)[
                    [f.name for f in state_schema.fields]
                ]

    return chunks.mapInPandas(_decode, schema=state_schema)


def archive_tier(
    store,
    tier: str,
    before: str,
    chunk_window: str = "1mo",
    table_prefix: str = "rollup",
) -> dict[str, str]:
    """Move ``{table_prefix}_{tier}`` rows with ``bucket_ts < before``
    into the compressed ``archive_{prefix suffix}`` table and shrink the
    live tier to the remaining horizon — the cold half of the retention
    ladder.  Returns the snapshot ids it committed.

    IDEMPOTENT AND CRASH-RECOVERABLE (ADVICE r3, medium): the move is
    two commits (archive write, then live shrink) and a failure between
    them leaves the cold rows both live and archived.  To make re-running
    with the same (or a later) ``before`` a repair path rather than a
    duplicator, the archive side is an overwrite-merge, not a blind
    append: existing archive chunks whose range overlaps the new cold
    rows are decoded, merged with the cold rows, deduped on
    (key, bucket_ts) with DETERMINISTIC precedence — on collision the
    live cold row wins over the decoded archive row, so a bucket
    refreshed by late data below a prior cutoff archives its REFRESHED
    state, never the stale archived one (ADVICE r4) — re-encoded, and
    committed via
    ``overwrite_range(t_end >= lo)``, which atomically replaces exactly
    the overlapping chunks.  Chunks strictly before the new cold range
    are never decoded or rewritten, so steady-state periodic archiving
    only touches the boundary window.  Reads between the two commits of
    a crashed run can still double-count the in-flight window; the
    invariant after any completed run is exact disjointness.

    ``table_prefix`` selects which tier family to archive: ``rollup``
    (fixed64/decimal state tables) or ``hist`` (long-form histogram
    (key, bucket_ts, bin, n) tables — all-long columns, same codec)."""
    live_table = f"{table_prefix}_{tier}"
    archive_table = (
        f"archive_{tier}" if table_prefix == "rollup" else f"archive_{table_prefix}_{tier}"
    )
    live = store.read(live_table)
    cold = live.filter(F.col("bucket_ts") < F.lit(before))
    hot = live.filter(F.col("bucket_ts") >= F.lit(before))
    snaps: dict[str, str] = {}
    lo_row = cold.agg(F.min("bucket_ts").alias("lo")).collect()[0]
    if lo_row["lo"] is None:
        # nothing below the cutoff — possibly a re-run after a completed
        # archive: no archive commit, live rewrite is a no-op shrink
        snaps[live_table] = store.overwrite_range(
            live_table, hot, "bucket_ts",
            "1900-01-01 00:00:00", "9999-01-01 00:00:00",
        )
        return snaps
    lo = lo_row["lo"].isoformat(sep=" ")
    to_encode = cold
    if store.current_snapshot(archive_table) is not None:
        chunks = store.read(archive_table)
        overlapping = chunks.filter(F.col("t_end") >= F.lit(lo))
        prev_rows = decode_state_chunks(overlapping, live.schema)
        keys = _key_cols(live) + ["tier", "bucket_ts"]
        if "bin" in live.columns:  # long-form hist: (key, bucket, bin) is the row id
            keys.append("bin")
        # Deterministic precedence on key collision (ADVICE r4, medium):
        # the LIVE cold row must beat the decoded archive row.  On a pure
        # crash re-run the two are bit-identical and either choice is
        # fine, but when late data was merged into a bucket BELOW a prior
        # archive cutoff (rollup_job's overwrite_range repair path), the
        # live tier holds the refreshed state and the archive holds the
        # stale one — dropDuplicates would keep an arbitrary winner.
        from pyspark.sql import Window as _W

        tagged = prev_rows.withColumn("_prio", F.lit(0)).unionByName(
            cold.withColumn("_prio", F.lit(1))
        )
        w = _W.partitionBy(*keys).orderBy(F.desc("_prio"))
        to_encode = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_prio", "_rn")
        )
    snaps[archive_table] = store.overwrite_range(
        archive_table,
        encode_state_chunks(to_encode, chunk_window),
        "t_end", lo, "9999-01-01 00:00:00",
    )
    snaps[live_table] = store.overwrite_range(
        live_table, hot, "bucket_ts",
        "1900-01-01 00:00:00", "9999-01-01 00:00:00",
    )
    return snaps


def read_tier_with_archive(
    store,
    tier: str,
    t_from: str | None = None,
    t_to: str | None = None,
    table_prefix: str = "rollup",
) -> DataFrame:
    """Tier-state rows across the hot/cold boundary: the live
    ``{table_prefix}_{tier}`` unioned with the zone-map-pruned decode of
    its archive table (chunks whose [t_start, t_end] misses the window
    are dropped on their tiny stat columns, never decoded).  Output is
    exactly the pre-archive tier table's shape, so every downstream
    consumer (query_range state re-agg, query_range_hist percentile
    walks, detectors, calendar merges) works unchanged on it."""
    archive_table = (
        f"archive_{tier}" if table_prefix == "rollup" else f"archive_{table_prefix}_{tier}"
    )
    # t_from/t_to reach the manifest read so day-partitioned commits
    # prune whole directories before the row filters below
    live = store.read(f"{table_prefix}_{tier}", t_from=t_from, t_to=t_to)
    out_live = live
    if t_from is not None:
        out_live = out_live.filter(F.col("bucket_ts") >= F.lit(t_from))
    if t_to is not None:
        out_live = out_live.filter(F.col("bucket_ts") < F.lit(t_to))
    if store.current_snapshot(archive_table) is None:
        return out_live
    chunks = store.read(archive_table)
    if t_from is not None:
        chunks = chunks.filter(F.col("t_end") >= F.lit(t_from))
    if t_to is not None:
        chunks = chunks.filter(F.col("t_start") < F.lit(t_to))
    pts = decode_state_chunks(chunks, live.schema)
    # chunk-grain prune can leave in-chunk rows outside the window
    if t_from is not None:
        pts = pts.filter(F.col("bucket_ts") >= F.lit(t_from))
    if t_to is not None:
        pts = pts.filter(F.col("bucket_ts") < F.lit(t_to))
    return out_live.unionByName(pts)
