"""fischer_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine with fischer-style anomaly scoring,
grafted onto Common-Crawl-style web-page data.

Capability contract: BASELINE.json (north_rule / north_star / input_hint).
The reference checkout at /root/reference was empty at survey time
(SURVEY.md §0), so parity surfaces are pinned by this repo's own frozen
golden fixtures (self-parity).

Architecture: DataFrame/SQL-first (Catalyst plans everything), vectorized
pandas/Arrow UDFs only where built-ins can't express the semantics
(HTML extraction, Gorilla chunk codec, grouped detector variants).
No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
