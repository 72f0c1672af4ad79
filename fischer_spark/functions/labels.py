"""PromQL label manipulation: ``label_replace`` and ``label_join``.

Pure column expressions — no shuffle, no Python; both stay inside
whole-stage codegen like the URL/PII regex functions (functions/urls.py,
functions/pii.py).  Semantics follow the public PromQL spec:

- ``label_replace(v, dst, replacement, src, regex)``: if ``regex``
  matches the ENTIRE value of label ``src``, set ``dst`` to
  ``replacement`` with ``$1``-style capture references expanded;
  otherwise the sample is unchanged (``dst`` keeps its prior value, or
  stays absent/NULL if it had none).  The regex is fully anchored, like
  every ``=~`` selector in this engine (api.py ``_label_re_filter``):
  ``label_replace(..., "(p).*")`` must not match mid-string.
- ``label_join(v, dst, sep, *srcs)``: set ``dst`` to the values of the
  source labels joined by ``sep``.  Missing (NULL) source labels
  contribute nothing — ``concat_ws`` skips NULLs — which mirrors
  PromQL's empty-string-for-absent-label convention without
  materializing empty strings.

Scale: both are row-local projections; at 10^12 rows they fuse into
whatever scan/aggregation already runs — zero extra Exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_join", "label_replace"]


def label_replace(
    df: DataFrame,
    dst: str,
    replacement: str,
    src: str,
    regex: str,
) -> DataFrame:
    """PromQL ``label_replace``: conditionally derive ``dst`` from
    ``src`` via an anchored capture-group regex.  ``replacement`` uses
    ``$1`` references (PromQL and Spark share the syntax)."""
    pat = f"^(?:{regex})$"  # (?:) adds no capture group, keeps $1 stable
    prior = F.col(dst) if dst in df.columns else F.lit(None).cast("string")
    return df.withColumn(
        dst,
        F.when(
            F.col(src).rlike(pat),
            F.regexp_replace(F.col(src), pat, replacement),
        ).otherwise(prior),
    )


def label_join(
    df: DataFrame,
    dst: str,
    sep: str,
    *srcs: str,
) -> DataFrame:
    """PromQL ``label_join``: ``dst`` = source label values joined by
    ``sep`` (NULL sources skipped)."""
    return df.withColumn(dst, F.concat_ws(sep, *[F.col(s) for s in srcs]))
