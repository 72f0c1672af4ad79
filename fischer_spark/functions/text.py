"""O7 — HTML → text extraction, byte-identical per url across runs.

FROZEN SPEC v1 (SURVEY.md §7 hard-part 2 — any change to these five steps
is a breaking change that must regenerate tests/fixtures/html/*.txt in the
same commit):

  1. decode bytes as UTF-8 with errors="replace" (U+FFFD for bad bytes)
  2. drop <script>...</script> and <style>...</style> blocks plus HTML
     comments <!-- ... --> (case-insensitive, dot-matches-newline)
  3. replace every remaining tag <...> with a single space
  4. unescape HTML entities (python html.unescape, html5 table)
  5. collapse every whitespace run (\\s+) to one ASCII space and strip

The Spark-side form is an Arrow-batched pandas UDF (BinaryType→StringType);
no per-row Python UDF (BASELINE.json input_hint). The pure-python form
`extract_text_bytes` is the single source of truth — the UDF and the test
fixtures both call it.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_str(raw: str) -> str:
    """Steps 2-5 of the frozen spec over an already-decoded string."""
    s = _SCRIPT_RE.sub(" ", raw)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_bytes(raw: bytes | None) -> str | None:
    """Full frozen spec: bytes in, extracted text out."""
    if raw is None:
        return None
    return extract_text_str(raw.decode("utf-8", errors="replace"))


@F.pandas_udf(T.StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def extract_text(html_col: Column | str) -> Column:
    """Column expression: extracted text per the frozen spec."""
    return _extract_text_udf(html_col)
