"""URL canonicalization + url-hash partitioning keys (web-corpus tier).

A Common-Crawl-scale pipeline partitions by url-hash and dedupes by
canonical URL (north-rule input shape: url-keyed Iceberg table of web
pages).  All expressions are JVM-side and regex-based — deliberately
NOT Spark's parse_url, so the DuckDB oracle evaluates the byte-same
semantics with the same patterns:

- scheme and host lowercase;
- default ports stripped (:80 for http, :443 for https);
- fragment dropped (never part of the resource identity);
- empty path normalized to '/';
- query parameters sorted bytewise (the common crawler normalization —
  a=1&b=2 and b=2&a=1 are the same fetch).

``with_url_hash_bucket`` derives the shuffle key the extraction
pipeline partitions on: md5 of the canonical url → bucket, plus the
registrable host for per-host skew accounting (hot hosts get salted —
plans/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# the '?' must occur BEFORE any '#': a '?' inside the fragment
# (SPA-style '#/route?tab=1') is fragment content, not a query
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return df.withColumn("canonical_url", canonical).withColumn("url_host", host)


def with_url_hash_bucket(
    df: DataFrame, n_buckets: int = 64, url_col: str = "canonical_url"
) -> DataFrame:
    """md5-prefix bucket of the canonical url — the partition key a
    10^12-row run shuffles on (md5 so the oracle reproduces it; a
    production run may swap xxhash64 behind the same column name)."""
    return df.withColumn(
        "url_bucket",
        (F.conv(F.substring(F.md5(F.col(url_col)), 1, 2), 16, 10).cast("bigint") % n_buckets),
    )
