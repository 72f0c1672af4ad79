"""PromQL scalar vector functions: ``clamp`` family, ``sgn``,
``round(v, to_nearest)`` (O116).

Pure column expressions (whole-stage codegen, zero shuffles) mirroring
the public PromQL definitions (promql/functions.go):

- ``clamp(v, lo, hi)``  = max(lo, min(hi, v)); PromQL returns an empty
  result when lo > hi — callers validate, we raise.
- ``clamp_min`` / ``clamp_max`` — one-sided forms.
- ``sgn(v)`` — -1 / 0 / +1 as doubles (CASE, not engine ``signum``, so
  the oracle evaluates the identical expression tree).
- ``round_to(v, to_nearest)`` — Prometheus rounds via the INVERSE:
  ``floor(v * (1/to) + 0.5) / (1/to)``, ties away from zero upward.
  The inverse is computed once in Python so both engines see the same
  double literal and replay the same three float ops.

Hash-safety: with ``v`` from the exact-decimal mean convention, every
output is a deterministic function of bit-identical inputs through a
pinned op order — full-oracle eligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["clamp", "clamp_max", "clamp_min", "round_to", "sgn"]


def clamp(v: Column, lo: float, hi: float) -> Column:
    """PromQL ``clamp(v, lo, hi)``: greatest(lo, least(hi, v))."""
    if lo > hi:
        raise ValueError(f"clamp: lo {lo} > hi {hi} (PromQL drops all rows)")
    return F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), v))


def clamp_min(v: Column, lo: float) -> Column:
    """PromQL ``clamp_min(v, lo)``."""
    return F.greatest(F.lit(float(lo)), v)


def clamp_max(v: Column, hi: float) -> Column:
    """PromQL ``clamp_max(v, hi)``."""
    return F.least(F.lit(float(hi)), v)


def sgn(v: Column) -> Column:
    """PromQL ``sgn(v)``: -1.0 / 0.0 / +1.0."""
    return (
        F.when(v > 0, F.lit(1.0)).when(v < 0, F.lit(-1.0)).otherwise(F.lit(0.0))
    )


def round_to(v: Column, to_nearest: float = 1.0) -> Column:
    """PromQL ``round(v, to_nearest)``: nearest multiple of
    ``to_nearest``, ties rounding up — via the Prometheus inverse
    formulation ``floor(v*inv + 0.5) / inv``."""
    if to_nearest <= 0:
        raise ValueError(f"round: to_nearest must be positive, got {to_nearest}")
    inv = 1.0 / float(to_nearest)
    return F.floor(v * F.lit(inv) + F.lit(0.5)).cast("double") / F.lit(inv)
