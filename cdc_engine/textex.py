"""F1: the extract_text invariant UDF (SURVEY.md §2.10).

BASELINE.json:15 binds the per-row invariant "byte-identical extracted text
per url": extract_text(html) == text for every live row. The html wrapper is
fixed (FIXTURES.md §1), so extraction is a deterministic function of the
html bytes. Implemented as a vectorized pandas UDF (Arrow batch transfer) —
per-row Python UDFs are banned by the spec.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"


def wrap_html(text: str) -> bytes:
    """Inverse of extract_text; used by the WAL generator."""
    return HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX


def _extract(b: bytes | None) -> str | None:
    if b is None:
        return None
    if b.startswith(HTML_PREFIX) and b.endswith(HTML_SUFFIX):
        b = b[len(HTML_PREFIX) : len(b) - len(HTML_SUFFIX)]
    return b.decode("utf-8", errors="replace")


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """html:binary -> extracted text, byte-identical to the stored column."""
    return html.map(_extract)


def text_invariant_violations(df):
    """Rows of ``df`` (needs html+text columns) violating the invariant.

    Pure-expression comparison after the vectorized extraction; empty
    result == invariant holds.
    """
    return df.where(
        F.col("html").isNotNull()
        & ~(extract_text(F.col("html")).eqNullSafe(F.col("text")))
    )
