"""Web-corpus URL operators: canonicalization, registrable-domain
extraction, per-domain statistics — the provenance side of a crawl
pipeline (URL-keyed dedup, domain caps, source diversity reports all
key on a CANONICAL url/domain, not the raw crawl string).

Everything is chained string/array expressions inside whole-stage
codegen (no UDF, no shuffle for the projections), and every regex uses
the portable subset (explicit classes, no lookaround, no backrefs) so
the DuckDB oracle replays each step verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# query parameters that never affect content identity — the standard
# tracking scrub set (analytics attribution tags)
TRACKING_PREFIXES = ("utm_", "gclid", "fbclid", "msclkid", "ref_")

# second-level labels that act as public suffixes in the simplified
# registrable-domain rule (full answers need the Public Suffix List;
# this two-tier heuristic covers the common ccTLD patterns and is
# exactly SQL-replayable — documented trade-off, not a stub)
SLD_SUFFIXES = ("co", "com", "org", "net", "gov", "ac", "edu")

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with userinfo@ and the scheme's default port
    stripped, leading 'www.' dropped."""
    hostport = F.lower(F.regexp_extract(
        url, _SCHEME_RE + r"(?:[^/?#@]*@)?([^/?#]*)", 2))
    scheme = url_scheme(url)
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    return F.regexp_replace(host, r"^www\.", "")


def url_path(url: Column) -> Column:
    p = F.regexp_extract(url, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking params dropped and the survivors
    sorted — parameter order never affects content identity."""
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
            lambda t: F.startswith(p, t)))
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercased scheme + host, default port and
    leading www. stripped, fragment dropped, tracking params scrubbed,
    remaining params sorted.  Two raw URLs that canonicalize equal are
    the same fetch target for dedup/cap purposes."""
    scheme = url_scheme(url)
    q = url_query_canonical(url)
    return F.concat(
        scheme, F.lit("://"), url_host(url), url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the simplified two-tier suffix rule: the last two
    labels, or the last three when the second-to-last label is a known
    public second-level (``co.uk``-style).  Hosts with fewer labels
    pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    take3 = (n >= 3) & sld.isin(*SLD_SUFFIXES)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return F.when(n <= 2, host).when(take3, last3).otherwise(last2)


def url_dedup_key(df: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, url, canon_url, domain): the canonical identity columns a
    crawl dedup/cap stage keys on.  Pure projection over the scan."""
    u = F.col(url_col)
    canon = canonicalize_url(u)
    return df.select(
        F.col(id_col), u.alias(url_col), canon.alias("canon_url"),
        registrable_domain(url_host(u)).alias("domain"))


def domain_stats(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-registrable-domain corpus stats: page count, distinct
    canonical URLs (url-level dup signal), dup_ratio.  One keyed
    aggregation; output is domain-cardinality-sized."""
    keyed = url_dedup_key(df, url_col, id_col)
    return (keyed.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.countDistinct("canon_url").alias("n_canon_urls"))
            .select("domain", "n_pages", "n_canon_urls",
                    F.round(F.lit(1.0) - F.col("n_canon_urls")
                            / F.col("n_pages"), 6).alias("dup_ratio")))
