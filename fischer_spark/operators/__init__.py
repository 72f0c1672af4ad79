from fischer_spark.operators.series import (
    build_series,
    decode_series_keys,
    encode_series_keys,
    verify_key_encoding,
)
from fischer_spark.operators.rollup import (
    refresh_cascade,
    refresh_tier,
    rollup_points,
    rollup_states,
    rollup_points_salted,
    with_derived_stats,
    tiered_rollups,
)
from fischer_spark.operators.dedup import (
    ann_topk_ivf,
    ann_topk_lsh,
    embedding_near_dup_pairs,
    minhash_candidates,
    minhash_signatures,
    simhash64,
    simhash_candidates,
)
from fischer_spark.operators.cluster import canonical_assignments, connected_components
from fischer_spark.operators.archive import (
    archive_tier,
    decode_state_chunks,
    encode_state_chunks,
    read_tier_with_archive,
)
from fischer_spark.operators.counters import counter_increase, counter_rate, gauge_delta
from fischer_spark.operators.downsample import lttb, lttb_downsample
from fischer_spark.operators.gapfill import bucket_spine, gapfill_locf, gapfill_linear
from fischer_spark.operators.histogram import (
    hist_merge,
    hist_quantile,
    hist_states,
)
from fischer_spark.operators.detect import (
    zscore_window,
    zscore_grouped_arrow,
    seasonal_profile,
    seasonal_score,
    seasonal_score_grouped_arrow,
    anomaly_intervals,
)

__all__ = [
    "build_series",
    "encode_series_keys",
    "decode_series_keys",
    "verify_key_encoding",
    "refresh_tier",
    "refresh_cascade",
    "rollup_points",
    "rollup_states",
    "rollup_points_salted",
    "with_derived_stats",
    "tiered_rollups",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "embedding_near_dup_pairs",
    "minhash_signatures",
    "minhash_candidates",
    "simhash64",
    "simhash_candidates",
    "canonical_assignments",
    "connected_components",
    "counter_increase",
    "counter_rate",
    "gauge_delta",
    "lttb",
    "lttb_downsample",
    "bucket_spine",
    "gapfill_locf",
    "gapfill_linear",
    "hist_states",
    "hist_merge",
    "hist_quantile",
    "zscore_window",
    "zscore_grouped_arrow",
    "seasonal_profile",
    "seasonal_score",
    "seasonal_score_grouped_arrow",
    "anomaly_intervals",
    "encode_state_chunks",
    "decode_state_chunks",
    "archive_tier",
    "read_tier_with_archive",
]
