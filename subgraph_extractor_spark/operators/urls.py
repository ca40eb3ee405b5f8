"""URL canonicalization + domain-level corpus operators.

Web-corpus curation needs URL identity before content identity: the
same page is crawled as ``HTTP://WWW.Site.com:80/a/?utm_source=feed``
and ``http://www.site.com/a`` and must dedup BEFORE any text hashing,
and per-domain document caps (the crawl-curation standard for keeping
one mega-site from dominating a corpus) need a stable registrable-
domain key, not a raw hostname.

Everything here is whole-stage-codegen column logic (regexp + array
ops; the only HOF is a short per-parameter filter) — no UDFs, no
shuffles beyond the terminal groupBy/window an operator's contract
needs, so every transform is a map-only pass at 100 TB.  All rules are
deterministic string algebra, independently re-implementable in any
SQL engine — the driver queries' DuckDB oracles replay them from
scratch, making the cross-engine check a real differential test of the
canonicalization grammar.

Canonicalization rules (the conservative, loss-free subset every major
crawler agrees on):
  * strip the fragment
  * lowercase scheme and host
  * drop default ports (``:80`` for http, ``:443`` for https)
  * empty path → ``/``; otherwise strip trailing slashes
  * drop tracking parameters (utm_*, gclid, fbclid, ref), sort the
    survivors byte-wise, drop an emptied query entirely

Registrable domain: eTLD+1 via a built-in subset of the public-suffix
list covering the common multi-label suffixes; unknown suffixes fall
back to the last two labels.  The full PSL is a data file in
production — the operator takes an optional override list so the
built-in subset is a default, not a limit.

Reference parity: none (no URL surface in the reference engine's 531
LoC); LLM-pipeline extension (SURVEY §2.12 family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAMS = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "gclid",
    "fbclid",
    "ref",
)

# common multi-label public suffixes (built-in subset; pass the full
# PSL via the ``multi_suffixes`` argument in production)
MULTI_LABEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "net.au",
    "co.jp",
    "co.kr",
    "co.in",
    "com.br",
    "com.mx",
    "github.io",
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column under the module's rules — pure
    codegen string/array algebra, NULL-safe (a NULL url canonicalizes
    to NULL)."""
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.split_part(p, F.lit("="), F.lit(1)).isin(
                *TRACKING_PARAMS
            ),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def url_host(url: Column) -> Column:
    """Lowercased host (port stripped unconditionally) of a URL column."""
    rest = F.regexp_replace(
        F.substring_index(url, "#", 1),
        r"^[A-Za-z][A-Za-z0-9+.\-]*://",
        "",
    )
    return F.lower(
        F.regexp_extract(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^([^:]*)", 1)
    )


def registrable_domain(
    host: Column, multi_suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES
) -> Column:
    """eTLD+1 of a host column: last THREE labels when the last two
    form a known multi-label public suffix, last two otherwise; hosts
    with fewer labels pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*multi_suffixes) & (n >= 3), last3)
        .otherwise(last2)
    )


def url_exact_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """One survivor per canonical URL — min-id, the module's standard
    deterministic survivor rule.  Output: (canonical_url, <id_col>)
    with the survivor's id.  One shuffle on the canonical key; the
    canonicalization itself is map-only codegen."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col))
    )


def domain_cap_sample(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    salt: str = "domcap",
) -> DataFrame:
    """At most ``cap`` rows per registrable domain, chosen in stable
    md5(salt||id) order — the crawl-curation per-domain cap as a
    deterministic pure function of the data (same reproducibility
    contract as every sampler in this repo).  One shuffle on the
    domain key; survivors keep their rows plus the ``_domain`` and
    ``_rk`` evidence columns."""
    if cap <= 0:
        raise ValueError(f"cap must be > 0, got {cap}")
    dom = registrable_domain(url_host(F.col(url_col)))
    w = Window.partitionBy("_domain").orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("_domain", dom)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
    )


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Docs per registrable domain — the corpus-balance profile that
    motivates :func:`domain_cap_sample`.  Output: (domain, n_docs),
    one shuffle."""
    dom = registrable_domain(url_host(F.col(url_col)))
    return (
        df.select(dom.alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def url_path(url: Column) -> Column:
    """Raw path of a URL column ('' -> '/'), query/fragment stripped —
    the robots matching subject (RFC 9309 matches the path-and-query;
    this module's simplified rule grammar is prefix-over-path, the
    overwhelmingly common robots.txt form)."""
    rest = F.regexp_replace(
        F.substring_index(url, "#", 1),
        r"^[A-Za-z][A-Za-z0-9+.\-]*://",
        "",
    )
    raw = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    return F.when(raw == "", F.lit("/")).otherwise(raw)


def robots_filter(
    df: DataFrame,
    url_col: str,
    id_col: str,
    rules: DataFrame,
    keep_unmatched_hosts: bool = True,
) -> DataFrame:
    """Crawl-policy filtering under RFC 9309 longest-match semantics —
    the politeness gate a crawl corpus must pass before anything else
    in the chain touches it.  ``rules`` is the parsed per-host policy
    table ``(host, rule_path, allow boolean)`` (one row per
    Allow/Disallow line; empty-Disallow "allow all" lines simply have
    no row).  For each URL:

    - applicable rules = the url's host's rules whose ``rule_path`` is
      a PREFIX of the url path;
    - the most specific (longest ``rule_path``) applicable rule wins;
      at equal length ``allow`` wins (RFC 9309 §2.2.2);
    - a LISTED host with no applicable rule → allowed unconditionally
      (RFC 9309: no matching group line means no restriction);
    - an UNLISTED host (no rules row at all — robots.txt never
      fetched/parsed) → governed by ``keep_unmatched_hosts``.

    ``id_col`` must be unique per row (the winner-selection window
    key).

    Plan shape: the rules table broadcasts (robots policies are KB-MB
    per crawl — dimension-sized by construction), applicability is a
    host equi-join + a prefix ``startswith`` filter, and the winner is
    one (length desc, allow desc) row_number window keyed by the URL's
    row — no shuffle of the corpus beyond the window's hash exchange.
    Output: the allowed subset of ``df``, original columns.
    """
    host = url_host(F.col(url_col))
    path = url_path(F.col(url_col))
    keyed = df.withColumn("_rb_host", host).withColumn("_rb_path", path)
    r = rules.select(
        F.col("host").alias("_rb_host"),
        F.col("rule_path").alias("_rb_rule"),
        F.col("allow").alias("_rb_allow"),
    )
    joined = keyed.join(F.broadcast(r), "_rb_host", "left").withColumn(
        "_rb_hit",
        F.col("_rb_rule").isNotNull()
        & F.col("_rb_path").startswith(F.col("_rb_rule")),
    )
    # winner-per-row window keyed by the row id (never the full row —
    # partitioning a window by wide text columns would shuffle the
    # whole payload as the key)
    w = Window.partitionBy(F.col(id_col)).orderBy(
        F.when(F.col("_rb_hit"), F.length("_rb_rule")).otherwise(-1).desc(),
        F.col("_rb_allow").desc_nulls_last(),
    )
    best = (
        joined.withColumn("_rb_rk", F.row_number().over(w))
        .filter(F.col("_rb_rk") == 1)
        .withColumn(
            "_rb_verdict",
            # host unlisted (left join found no rules row) -> the flag;
            # host listed but no rule prefix-matches -> allowed
            # unconditionally (RFC 9309); otherwise the winning rule.
            F.when(F.col("_rb_rule").isNull(), F.lit(keep_unmatched_hosts))
            .when(~F.col("_rb_hit"), F.lit(True))
            .otherwise(F.col("_rb_allow")),
        )
        .filter(F.col("_rb_verdict"))
    )
    return best.select(*df.columns)
