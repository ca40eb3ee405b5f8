"""URL canonicalization + domain operators: grammar cases, survivor
rules, per-domain cap properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import urls as u


def _canon(spark, raw: str) -> str:
    return (
        spark.createDataFrame([(raw,)], ["u"])
        .select(u.canonicalize_url(F.col("u")).alias("c"))
        .first()["c"]
    )


def test_canonicalize_grammar_cases(spark):
    cases = {
        # case-folding + default port + tracking + param sort + fragment
        "HTTP://WWW.Site.com:80/a/?b=2&utm_source=x&a=1#frag":
            "http://www.site.com/a?a=1&b=2",
        # https default port; empty path becomes /
        "https://Host.IO:443?x=1": "https://host.io/?x=1",
        # non-default port survives; path case preserved
        "http://h.com:8080/Path/": "http://h.com:8080/Path",
        # emptied query dropped entirely
        "http://h.com/p?utm_campaign=c&fbclid=z": "http://h.com/p",
        # already canonical is a fixed point
        "http://h.com/p?a=1": "http://h.com/p?a=1",
        # multiple trailing slashes collapse; root path stays /
        "http://h.com///": "http://h.com/",
        # ref is tracking; param VALUES keep their case
        "https://h.com/A/B/?ref=r&Z=q": "https://h.com/A/B?Z=q",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw
    # NULL-safe
    row = (
        spark.createDataFrame([(None,)], "u string")
        .select(u.canonicalize_url(F.col("u")).alias("c"))
        .first()
    )
    assert row["c"] is None


def test_canonicalize_idempotent(spark):
    raws = [
        "HTTP://WWW.Site.com:80/a/?b=2&utm_source=x&a=1#frag",
        "https://Host.IO:443?x=1",
        "http://h.com:8080/Path/",
    ]
    df = spark.createDataFrame([(r,) for r in raws], ["u"])
    once = df.select(u.canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(u.canonicalize_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [
        r["c"] for r in twice.collect()
    ]


def test_registrable_domain(spark):
    cases = {
        "www.example.co.uk": "example.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "user.github.io": "user.github.io",
        "deep.user.github.io": "user.github.io",
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", u.registrable_domain(F.col("h")).alias("d")
        ).collect()
    }
    assert got == cases


def test_url_exact_dedup_min_id_survivor(spark):
    rows = [
        (1, "HTTP://Site.com:80/a?utm_source=x"),
        (2, "http://site.com/a"),          # same canonical as 1
        (3, "http://site.com/b"),
        (4, "http://site.com/a/"),          # same canonical again
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {
        r["canonical_url"]: r["id"]
        for r in u.url_exact_dedup(df, "url", "id").collect()
    }
    assert got == {"http://site.com/a": 1, "http://site.com/b": 3}


def test_domain_cap_sample_properties(spark):
    rows = [
        (i, f"http://{'big' if i < 20 else 'small'}.example.com/p{i}")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = u.domain_cap_sample(df, "url", "id", cap=5)
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r["_domain"], []).append(r["id"])
    # big.example.com and small.example.com share eTLD+1: ONE bucket,
    # capped once (the mega-site case the operator exists for)
    assert set(by_dom) == {"example.com"}
    assert len(by_dom["example.com"]) == 5
    # deterministic: same input -> same survivors
    again = {r["id"] for r in u.domain_cap_sample(df, "url", "id", cap=5).collect()}
    assert again == {i for ids in by_dom.values() for i in ids}
    with pytest.raises(ValueError):
        u.domain_cap_sample(df, "url", "id", 0)


def test_domain_cap_uses_registrable_domain_not_host(spark):
    # big.example.com and small.example.com are ONE registrable domain —
    # the cap must treat them as one bucket (the mega-site case)
    rows = [(i, f"http://sub{i % 3}.example.com/p{i}") for i in range(12)]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = u.domain_cap_sample(df, "url", "id", cap=4).collect()
    assert len(out) == 4
    assert {r["_domain"] for r in out} == {"example.com"}


def test_domain_stats(spark):
    rows = [
        (1, "http://a.co.uk/x"),
        (2, "http://www.a.co.uk/y"),
        (3, "https://b.com/z"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {
        r["domain"]: r["n_docs"]
        for r in u.domain_stats(df, "url").collect()
    }
    assert got == {"a.co.uk": 2, "b.com": 1}


def _robots_rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, rule_path string, allow boolean"
    )


def test_robots_filter_longest_match_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/p/1/x"),    # blocked by /p/1
            (2, "http://a.com/p/12/x"),   # /p/12 allow beats /p/1
            (3, "http://a.com/p/10/x"),   # PREFIX subtlety: /p/1 matches
            (4, "http://a.com/q"),        # no applicable rule -> allowed
            (5, "http://b.com/p/1/x"),    # unlisted host -> allowed
            (6, "http://c.com/any"),      # site-wide '/' disallow
            (7, "http://d.com/t"),        # equal-length tie -> allow wins
        ],
        ["doc_id", "url"],
    )
    rules = _robots_rules(
        spark,
        [
            ("a.com", "/p/1", False),
            ("a.com", "/p/12", True),
            ("c.com", "/", False),
            ("d.com", "/t", False),
            ("d.com", "/t", True),
        ],
    )
    kept = {
        r["doc_id"]
        for r in u.robots_filter(df, "url", "doc_id", rules).collect()
    }
    assert kept == {2, 4, 5, 7}
    # strict crawls drop UNLISTED hosts only (doc 5); a listed host
    # whose rules simply don't apply (doc 4: a.com/q) stays allowed —
    # RFC 9309: no matching group line means no restriction, so the
    # flag governs robots-never-fetched hosts, not rule misses
    strict = {
        r["doc_id"]
        for r in u.robots_filter(
            df, "url", "doc_id", rules, keep_unmatched_hosts=False
        ).collect()
    }
    assert strict == {2, 4, 7}
    # original columns (and only them) survive
    out = u.robots_filter(df, "url", "doc_id", rules)
    assert out.columns == ["doc_id", "url"]


def test_robots_filter_empty_rules_is_passthrough(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], ["doc_id", "url"])
    rules = _robots_rules(spark, [])
    assert u.robots_filter(df, "url", "doc_id", rules).count() == 1
