from fischer_spark.streaming.rollup_stream import streaming_rollup_1m, streaming_zscore

__all__ = ["streaming_rollup_1m", "streaming_zscore"]
