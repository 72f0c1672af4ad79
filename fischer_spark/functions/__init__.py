from fischer_spark.functions.text import extract_text, extract_text_bytes
from fischer_spark.functions.urls import with_url_parts

__all__ = ["extract_text", "extract_text_bytes", "with_url_parts"]
