from fischer_spark.codec.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

__all__ = [
    "encode_timestamps",
    "decode_timestamps",
    "encode_values",
    "decode_values",
]
