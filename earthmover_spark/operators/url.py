"""URL curation primitives for web-scale corpora.

CommonCrawl-style pipelines filter and cap by URL before any text pass:
parse each document's URL, bucket by registered domain, drop blocklisted
hosts, cap documents per domain. All of it is regexp/string work that
must stay JVM-side — at 100 TB the URL column alone is billions of rows.

Scale shape: ``parse_urls`` is pure narrow codegen (regexp_extract over
the scan — no shuffle, no Python). ``filter_domains`` broadcasts the
list when it is a Python sequence (an in-filter compiled into the scan
predicate) or does a broadcast semi/anti join when it is a DataFrame.
Per-domain caps reuse ``cap_per_group`` (hash-ranked, one shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from earthmover_spark.util import EarthmoverSparkError

# scheme://host[:port]/path?query#fragment — permissive on purpose:
# crawl data is full of junk URLs and a parse miss must yield NULLs,
# not an error. Identical PCRE runs on the DuckDB oracle side.
_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*:\/\/(?:[^@\/?#]*@)?([^:\/?#]+)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*:\/\/[^\/?#]*(\/[^?#]*)"
_QUERY = r"\?([^#]*)"

#: second-level public suffixes where the registered domain needs THREE
#: labels (example.co.uk, not co.uk). A tiny built-in set covers the
#: overwhelming bulk of crawl traffic; callers with full PSL needs pass
#: their own table and join instead.
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.ar", "com.tr", "com.sg",
)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of ``host``: the last two labels,
    or three when the two-label tail is a known second-level public
    suffix. IP literals and single-label hosts pass through whole."""
    h = F.lower(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(is_ip | (n <= 2), h)
        .when(last2.isin(*_TWO_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def parse_urls(
    df: DataFrame, url_col: str = "url", prefix: str = "url_"
) -> DataFrame:
    """Split ``url_col`` into ``{prefix}scheme / host / domain / path /
    query`` columns (NULL where a component is absent or the URL does
    not parse). ``domain`` is the registered domain of ``host``.
    Narrow regexp codegen only — safe to run inline over any scan."""
    if url_col not in df.columns:
        raise EarthmoverSparkError(f"parse_urls: no column {url_col!r}")
    u = F.col(url_col).cast("string")
    nn = lambda c: F.when(c == "", None).otherwise(c)  # noqa: E731
    host = nn(F.regexp_extract(u, _HOST, 1))
    return (
        df.withColumn(prefix + "scheme", F.lower(nn(F.regexp_extract(u, _SCHEME, 1))))
        .withColumn(prefix + "host", F.lower(host))
        .withColumn(
            prefix + "domain",
            F.when(host.isNotNull(), registered_domain(host)),
        )
        .withColumn(prefix + "path", nn(F.regexp_extract(u, _PATH, 1)))
        .withColumn(prefix + "query", nn(F.regexp_extract(u, _QUERY, 1)))
    )


def filter_domains(
    df: DataFrame,
    domain_col: str,
    blocklist: Sequence[str] | DataFrame | None = None,
    allowlist: Sequence[str] | DataFrame | None = None,
    list_col: str = "domain",
) -> DataFrame:
    """Drop rows whose ``domain_col`` is on ``blocklist`` / keep only
    rows on ``allowlist`` (give exactly one). A Python sequence becomes
    an in-filter in the scan predicate; a DataFrame becomes a broadcast
    anti (block) or semi (allow) join on ``list_col`` — the corpus
    never shuffles either way. Matching is case-insensitive; NULL
    domains are always dropped (unparseable URL = not curatable)."""
    if (blocklist is None) == (allowlist is None):
        raise EarthmoverSparkError(
            "filter_domains: give exactly one of blocklist/allowlist"
        )
    col = F.lower(F.col(domain_col))
    out = df.filter(F.col(domain_col).isNotNull())
    lst, keep = (blocklist, False) if blocklist is not None else (allowlist, True)
    if isinstance(lst, DataFrame):
        side = lst.select(F.lower(F.col(list_col)).alias("__dom__")).distinct()
        how = "left_semi" if keep else "left_anti"
        return out.join(
            F.broadcast(side), col == F.col("__dom__"), how
        )
    vals = [str(v).lower() for v in lst]
    cond = col.isin(vals)
    return out.filter(cond if keep else ~cond)


__all__ = ["parse_urls", "filter_domains", "registered_domain"]
