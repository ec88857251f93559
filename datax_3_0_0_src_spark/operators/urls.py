"""URL canonicalization — the key-normalization step of a web-scale CDC/dedup
pipeline (the engine's LWW key is the url: two syntactic spellings of one page
must collapse to one key BEFORE hashing/bucketing, or the dedup silently
splits).

Pure JVM Column expressions (regexp_extract / split / array_sort — whole-stage
codegen, no UDF), applying a deterministic WHATWG-ish subset:

1. scheme and host lowercased;
2. default ports stripped (http:80, https:443), other ports kept;
3. fragment dropped (never sent to the server);
4. query parameters sorted lexicographically (param order is almost always
   insignificant; sorting makes the key canonical — the rare order-sensitive
   endpoint is the documented tradeoff every web crawler makes);
5. empty path becomes "/".

No percent-decoding is attempted: decoding changes semantics for reserved
characters and is NOT idempotent — canonicalization must be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME = r"^([^:/?#]+)://"
_HOSTPORT = r"^[^:/?#]+://([^/?#]*)"
_PATH = r"^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    hostport = F.regexp_extract(url, _HOSTPORT, 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(url, _PATH, 1)
    query = F.regexp_extract(url, _QUERY, 1)

    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_q))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)


def with_canonical_url(
    df: DataFrame, *, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))
