"""Vectorized HTML -> text extraction (the byte-identical invariant).

This is the engine's `dx_groovy` slot — the reference's arbitrary per-record
UDF escape hatch (core/src/main/java/com/alibaba/datax/core/transport/
transformer/GroovyTransformer.java:25-88) — done the Arrow way: a pandas_udf
over the binary ``html`` column, batch-transferred, no per-row Python UDF calls
(BASELINE input_hint requires vectorized pandas/Arrow UDFs throughout).

The extraction is deterministic and encoding-pinned (UTF-8, mirrors the
reference pinning encodings centrally in ColumnCast,
common/src/main/java/com/alibaba/datax/common/element/ColumnCast.java:42-60):
    text = title + "\\n" + body with tags stripped, whitespace collapsed,
           no leading/trailing whitespace.
The same pandas implementation backs the replay oracle, and unit tests pin
exact expected strings so both can't drift together unnoticed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_TITLE_RE = r"<title[^>]*>(.*?)</title>"
_BODY_RE = r"<body[^>]*>(.*?)</body>"
_TAG_RE = r"<[^>]+>"
_WS_RE = r"\s+"


def extract_text_pd(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a pandas Series of html bytes (or None)."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else None)
    s = pd.Series(s, dtype="object")
    title = s.str.extract(_TITLE_RE, expand=False).fillna("")
    body = s.str.extract(_BODY_RE, expand=False).fillna("")
    body = (
        body.str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    title = (
        title.str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    out = (title + "\n" + body).str.strip()
    out[s.isna()] = None
    return out


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_pd(html)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Attach the extracted text column (Arrow-vectorized)."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
