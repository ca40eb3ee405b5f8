"""HTML → main-text boilerplate extraction (map-only, deterministic).

The one crawl-corpus preprocessing step the pipeline surface lacked
(r9 verdict "what's missing" #3): raw crawled HTML must become clean
text BEFORE the quality gates (``text_analysis``), language ID,
dedup and sampling stages can see it.  This is the first stage of the
crawl-to-corpus chain — URL canonicalization (``operators/urls.py``),
sub-document passage dedup (``operators/passages.py``) and the Gopher
rules all assume its output.

Design: stdlib ``html.parser`` (no external dependencies — the
environment contract) driving two DETERMINISTIC rule families, in the
spirit of the boilerpipe/jusText line of work (Kohlschütter et al.,
WSDM 2010) but rule-only, so the output is a pure function of the
markup and can be differentially oracled:

1. **container rules** — content inside ``<script> <style> <noscript>
   <template> <head> <svg> <iframe>`` is never text; content inside the
   semantic boilerplate containers ``<nav> <header> <footer> <aside>
   <form>`` is dropped wholesale (nesting-depth tracked, so a ``<div>``
   inside a ``<nav>`` stays dropped);
2. **link-density rule** — a text block whose anchor-text fraction
   exceeds ``max_link_density`` (default 0.5) is navigation-shaped
   boilerplate ("Related / More / Next" link farms) and is dropped even
   outside the semantic containers.

A *block* is the text accumulated between block-level tag boundaries
(``p div article section main li h1-h6 td th blockquote pre body``);
surviving blocks join with a single space and whitespace runs collapse
to one space via the repo-wide ASCII class ``[\\t\\n\\f\\r ]`` (the
tokenizer-contract class — same on the DuckDB side, so extraction
output feeds straight into the oracled token/gram operators).

Scale shape: one Arrow-batched kernel, map-only, no shuffle — the
100 TB cost model is one pass over the raw crawl partition-parallel.
Parsing is stateful per document but documents are independent rows;
a malformed document degrades to best-effort text, never a task
failure (``html.parser`` is non-raising by design).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_SKIP_TAGS = frozenset(
    ["script", "style", "noscript", "template", "head", "svg", "iframe"]
)
_BOILER_TAGS = frozenset(["nav", "header", "footer", "aside", "form"])
_BLOCK_TAGS = frozenset(
    ["p", "div", "article", "section", "main", "li", "td", "th",
     "blockquote", "pre", "body", "h1", "h2", "h3", "h4", "h5", "h6",
     "ul", "ol", "table", "tr"]
)
# void elements never push close-state (the parser may see them
# unclosed; treating them as containers would poison depth counters)
_VOID_TAGS = frozenset(
    ["br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)

_WS = re.compile(r"[\t\n\f\r ]+")


class _MainTextParser(HTMLParser):
    """Accumulates (text, link_chars) per block; see module docstring
    for the rule families.  Depth counters (not booleans) make nested
    and unclosed boilerplate containers behave: entering ``<nav>``
    twice requires two closes to resume collecting, and a stray
    ``</nav>`` with no open nav is ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._boiler = 0
        self._link = 0
        self._buf = StringIO()
        self._link_chars = 0
        self._blocks: list[tuple[str, int]] = []

    def _flush(self) -> None:
        text = self._buf.getvalue()
        if text.strip():
            self._blocks.append((text, self._link_chars))
        self._buf = StringIO()
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            # a line/rule break is whitespace between words, never glue
            if tag in ("br", "hr") and not (self._skip or self._boiler):
                self._buf.write(" ")
            return
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BOILER_TAGS:
            self._flush()
            self._boiler += 1
        elif tag == "a":
            self._link += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BOILER_TAGS:
            self._flush()
            self._boiler = max(0, self._boiler - 1)
        elif tag == "a":
            self._link = max(0, self._link - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip or self._boiler:
            return
        self._buf.write(data)
        if self._link:
            self._link_chars += len(data)

    def blocks(self) -> list[tuple[str, int]]:
        self._flush()
        return self._blocks


def extract_main_text_str(
    html: str | None, max_link_density: float = 0.5
) -> str:
    """Pure-Python extraction of one document (the kernel body, exposed
    for tests and for driver-side config tooling): parse, apply the
    container + link-density rules, join surviving blocks, collapse
    ASCII whitespace runs.  NULL/unparseable input degrades to ''."""
    if not html:
        return ""
    p = _MainTextParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is documented non-raising on malformed input;
        # this is belt-and-braces for pathological recursion cases
        return ""
    kept = []
    for text, link_chars in p.blocks():
        n = len(text)
        if n == 0:
            continue
        if link_chars / n > max_link_density:
            continue
        kept.append(text)
    return _WS.sub(" ", " ".join(kept)).strip(" ")


def extract_main_text(
    df: DataFrame,
    html_col: str,
    out_col: str = "main_text",
    max_link_density: float = 0.5,
) -> DataFrame:
    """Map-only main-content extraction of an HTML column (see module
    docstring): ``df`` plus ``out_col`` holding the extracted text.
    One Arrow-batched kernel pass, no shuffle."""
    mld = max_link_density

    @pandas_udf(StringType())
    def ext(htmls: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_main_text_str(h, mld) for h in htmls], dtype=object
        )

    return df.withColumn(out_col, ext(F.col(html_col)))


class _LinkParser(HTMLParser):
    """Collects (position, href) for every ``<a href=...>`` in document
    order — including links inside boilerplate containers (a crawl
    frontier wants nav/footer outlinks too; filter AFTER extraction
    with ``urls.py``'s canonicalization/domain policies).  Entity
    references inside attribute values arrive already decoded."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for name, val in attrs:
                if name == "href" and val is not None:
                    self.hrefs.append(val)
                    break


class _AnchorParser(HTMLParser):
    """Collects (href, anchor_text) pairs in document order — the
    inlink ranking signal (anchor text describes the TARGET, the
    classic web-IR field).  One open anchor at a time: a nested
    ``<a>`` implicitly closes the current one (browser behavior);
    anchors without href are skipped; text inside script/style never
    counts (CDATA handling is the stdlib parser's)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: StringIO = StringIO()

    def _close(self) -> None:
        if self._href is not None:
            self.pairs.append((self._href, self._buf.getvalue()))
        self._href = None
        self._buf = StringIO()

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._close()  # nested <a> implicitly closes the open one
            for name, val in attrs:
                if name == "href" and val is not None:
                    self._href = val
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.write(data)


def extract_anchor_texts_str(html: str | None) -> list[tuple[str, str]]:
    """Pure-Python (href, anchor_text) extraction of one document —
    anchor text whitespace-collapsed under the repo-wide ASCII class.
    NULL/unparseable input degrades to []."""
    if not html or not isinstance(html, str):
        return []
    p = _AnchorParser()
    try:
        p.feed(html)
        p.close()
        p._close()  # unclosed trailing anchor still counts
    except Exception:
        return []
    return [
        (href, _WS.sub(" ", text).strip(" ")) for href, text in p.pairs
    ]


def extract_anchor_texts(
    df: DataFrame, html_col: str, out_col: str = "anchors"
) -> DataFrame:
    """Map-only anchor-text extraction: ``df`` plus ``out_col`` holding
    array<struct<href, anchor>> in document order.  Aggregate per href
    across the corpus (groupBy target + collect/string_agg) for the
    inlink anchor-text index — plain oracled DataFrame ops from there."""
    from pyspark.sql.types import StructField, StructType

    schema = ArrayType(
        StructType(
            [
                StructField("href", StringType()),
                StructField("anchor", StringType()),
            ]
        )
    )

    @pandas_udf(schema)
    def ext(htmls: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_anchor_texts_str(h) for h in htmls], dtype=object
        )

    return df.withColumn(out_col, ext(F.col(html_col)))


def extract_links_str(html: str | None) -> list[str]:
    """Pure-Python outlink extraction of one document (the kernel
    body): hrefs in document order, duplicates kept (frequency is a
    signal for the domain-cap policies downstream).  NULL/unparseable
    input degrades to []."""
    if not html or not isinstance(html, str):
        return []
    p = _LinkParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []
    return p.hrefs


def extract_links(
    df: DataFrame, html_col: str, out_col: str = "hrefs"
) -> DataFrame:
    """Map-only outlink extraction of an HTML column: ``df`` plus
    ``out_col`` holding array<string> hrefs in document order — the
    crawl-frontier/link-graph half of the HTML family (compose with
    ``operators/urls.py`` canonicalization and ``operators/graph.py``
    PageRank for the crawl-graph pipeline).  One Arrow-batched kernel,
    no shuffle."""

    @pandas_udf(ArrayType(StringType()))
    def ext(htmls: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links_str(h) for h in htmls], dtype=object
        )

    return df.withColumn(out_col, ext(F.col(html_col)))


def html_escape_expr(col: Column) -> Column:
    """Codegen HTML-escape of a text column (& first, then < >) — the
    synthesis half of the extraction fixture contract: escape followed
    by the parser's entity decoding is the identity, so an oracle can
    state the expected extraction directly from the pre-escape text."""
    return F.replace(
        F.replace(
            F.replace(col, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
