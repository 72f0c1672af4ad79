"""Series algebra: PromQL-style binary operations between two series
sets with label matching (``a / on(labels) b`` — error ratios, relative
rates, deltas between deployments).

Semantics (public PromQL vector-matching model, one-to-one form):
samples pair when their match labels AND timestamp are equal; the
result carries the match labels only.  ``match="inner"`` drops
unmatched samples (PromQL default); ``match="left"`` keeps every
left sample and substitutes ``fill`` for the missing right value
(the ``or vector(c)`` idiom).

Deviation from PromQL, documented: division by zero yields NULL, not
±Inf/NaN — NULL is deterministic across engines (DuckDB/Spark agree)
and composes with the repo's NULL-on-undefined convention (robust
score, rate over zero elapsed).

Scale shape: ONE equi-join on (match labels, ts) — both sides shuffle
on the same key, no window, no Python.  Nullable labels (``tag`` is
NULL for most series) join through the repo's sentinel shadow-key
convention, never dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = ("add", "sub", "mul", "div")


def _op_expr(op: str, a: Column, b: Column) -> Column:
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    if op == "div":
        return F.when(b != 0, a / b)  # NULL on zero divisor (documented)
    raise ValueError(f"unknown series binop {op!r}; choose one of {_OPS}")


def series_binop(
    left: DataFrame,
    right: DataFrame,
    op: str = "div",
    on: tuple[str, ...] = ("domain", "tag"),
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    match: str = "inner",
    fill: float | None = None,
) -> DataFrame:
    """Pair ``left`` and ``right`` samples on (``on`` labels, ``ts_col``)
    and combine values with ``op``.  Returns (on..., ts_col, value).

    ``match="left"`` keeps unmatched left samples with ``fill`` standing
    in for the right value (``fill=None`` keeps them as NULL results).
    """
    if match not in ("inner", "left"):
        raise ValueError(f"unknown match mode {match!r}; 'inner' or 'left'")
    # sentinel shadow keys: NULL labels must pair, not vanish
    jk = [f"_jk{i}" for i in range(len(on) + 1)]

    def shadowed(df: DataFrame, val_alias: str) -> DataFrame:
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00")).alias(f"_jk{i}")
            for i, c in enumerate(on)
        ] + [
            F.coalesce(F.col(ts_col).cast("string"), F.lit("\x00")).alias(
                f"_jk{len(on)}"
            )
        ]
        return df.select(
            *on, F.col(ts_col), *cols, F.col(val_col).alias(val_alias)
        )

    l = shadowed(left, "_va")
    r = shadowed(right, "_vb").drop(*on, ts_col)
    how = "inner" if match == "inner" else "left"
    j = l.join(r, jk, how)
    vb = F.col("_vb")
    if match == "left" and fill is not None:
        vb = F.coalesce(vb, F.lit(float(fill)))
    return j.select(*on, ts_col, _op_expr(op, F.col("_va"), vb).alias("value"))


def series_binop_grouped(
    left: DataFrame,
    right: DataFrame,
    op: str = "div",
    on: tuple[str, ...] = ("domain",),
    carry: tuple[str, ...] = ("domain", "metric", "tag"),
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    strict: bool = True,
    group: str = "left",
) -> DataFrame:
    """PromQL MANY-TO-ONE vector matching (``a / on(labels) group_left b``):
    every left sample pairs with the single right sample sharing its
    ``on`` labels and timestamp — the ratio-to-group-aggregate shape
    (``rate / on(domain) group_left sum by (domain)(rate)`` = each
    series' share of its domain total).  The result carries the LEFT's
    full label set (``carry``), per group_left semantics.

    ``group="right"`` is the mirrored ONE-TO-MANY form
    (``a / on(labels) group_right b``): the LEFT side is the aggregate
    ("one" per match group, strictness enforced on it), every RIGHT
    sample pairs with it, and the result carries the RIGHT's label set
    (``carry`` then names right-side columns).  Operand order is NOT
    swapped — the op still computes left <op> right, exactly like
    PromQL, where group_left/group_right only choose which side may be
    many and whose labels survive.

    ``strict=True`` enforces PromQL's cardinality rule AT EXECUTION:
    duplicate right rows per (on, ts) raise (``raise_error`` over a
    count window on the right side — the "one" side is an aggregate,
    tiny relative to the left, so the window is cheap and there is no
    driver action).  The right side typically comes from
    ``query_range(..., by=on)`` — exact-state aggregation — making
    left/right bit-consistent.

    Scale shape: one window on the small side + ONE equi-join on
    (on labels, ts); NULL labels pair via the sentinel shadow keys;
    division by zero yields NULL (same documented deviation as
    series_binop)."""
    if group not in ("left", "right"):
        raise ValueError(f"unknown group side {group!r}; 'left' or 'right'")
    missing = set(on) - set(carry)
    if missing:
        raise ValueError(f"on labels {sorted(missing)} missing from carry")
    jk = [f"_jk{i}" for i in range(len(on) + 1)]

    def shadow_cols(df: DataFrame):
        return [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00")).alias(f"_jk{i}")
            for i, c in enumerate(on)
        ] + [
            F.coalesce(F.col(ts_col).cast("string"), F.lit("\x00")).alias(
                f"_jk{len(on)}"
            )
        ]

    many, one = (left, right) if group == "left" else (right, left)
    many_val, one_val = ("_va", "_vb") if group == "left" else ("_vb", "_va")
    m = many.select(*carry, F.col(ts_col), *shadow_cols(many),
                    F.col(val_col).alias(many_val))
    o = one.select(*shadow_cols(one), F.col(val_col).alias(one_val))
    if strict:
        from pyspark.sql import Window

        n = F.count(F.lit(1)).over(Window.partitionBy(*jk))
        o = o.withColumn(
            one_val,
            F.when(
                n > 1,
                F.raise_error(F.lit(
                    "series_binop_grouped: many samples share one (on, ts) "
                    f"key on the '{'right' if group == 'left' else 'left'}' "
                    f"side — group_{group} requires that side unique per "
                    "match group (aggregate it with by= first)"
                )).cast("double"),
            ).otherwise(F.col(one_val)),
        )
    j = m.join(o, jk, "inner")
    return j.select(
        *carry, ts_col, _op_expr(op, F.col("_va"), F.col("_vb")).alias("value")
    )


def series_offset(
    df: DataFrame, offset_s: int, ts_col: str = "bucket_ts"
) -> DataFrame:
    """O79 — PromQL ``offset``: re-stamp each sample ``offset_s`` seconds
    LATER so the past sample pairs with the present one under the binop
    equi-join (``x / (x offset 7d)`` = week-over-week ratio).

    Pure integer-µs arithmetic on the timestamp column (same fast path as
    bucketize — no calendar logic, no Python), type-preserving for NTZ.
    A calendar-aware shift ("same day last month") belongs to the
    calendar tiers (rollup_states_calendar), not here: PromQL offsets are
    fixed durations by definition."""
    from pyspark.sql.types import TimestampNTZType

    ntz = isinstance(df.schema[ts_col].dataType, TimestampNTZType)
    c = F.col(ts_col).cast("timestamp") if ntz else F.col(ts_col)
    shifted = F.timestamp_micros(F.unix_micros(c) + F.lit(int(offset_s) * 1_000_000))
    if ntz:
        shifted = shifted.cast("timestamp_ntz")
    return df.withColumn(ts_col, shifted)
