"""operators/html.py — HTML → main-text boilerplate extraction.

The fixture-scale extraction contract is full-value oracled by the
driver harness (text_html_extract derives its expected output from the
synthesis parameters); pytest covers the adversarial markup the
synthesized wrapper can't carry and the Spark-side kernel plumbing."""


from subgraph_extractor_spark.operators import html as H


def ex(s, **kw):
    return H.extract_main_text_str(s, **kw)


def test_container_rules():
    # script/style/head content is never text, even with fake tags
    assert ex('<script>var x = "<p>fake</p>";</script><p>real</p>') == "real"
    assert ex("<style>p:before{content:'<b>no</b>'}</style><p>yes</p>") == "yes"
    assert (
        ex("<head><title>t</title><meta charset='x'></head><body><p>b</p>")
        == "b"
    )
    # semantic boilerplate containers drop wholesale, nested included
    assert ex("<nav><div><p>deep nav junk</p></div></nav><p>keep</p>") == "keep"
    assert ex("<footer>c 2026 <div>inner</div></footer><p>k</p>") == "k"
    assert ex("<aside><p>ad</p></aside>main text") == "main text"
    assert ex("<form><input><label>Name</label></form><p>k</p>") == "k"


def test_nested_and_unclosed_boilerplate():
    # two nested navs need two closes; a stray close is ignored
    assert ex("<nav><nav>x</nav>still nav</nav>out") == "out"
    assert ex("</nav>not actually nav<p>k</p>") == "not actually nav k"
    # unclosed nav swallows the rest (depth never returns to 0) — the
    # conservative reading for truncated crawls
    assert ex("<p>top</p><nav>menu <p>rest") == "top"


def test_link_density_rule():
    # pure link farms drop even outside semantic containers
    assert (
        ex('<div><a href="/a">Related</a> <a href="/b">More</a></div>'
           "<p>content here</p>")
        == "content here"
    )
    # a block mostly prose with one link survives
    assert (
        ex('<p>long prose sentence with one <a href="/x">link</a> inside</p>')
        == "long prose sentence with one link inside"
    )
    # threshold is configurable
    assert ex('<p><a href="/x">half link</a> and t</p>',
              max_link_density=0.9) == "half link and t"
    assert ex('<p><a href="/x">half link</a> and t</p>',
              max_link_density=0.1) == ""


def test_entities_comments_case_and_malformed():
    assert ex("&lt;tag&gt; &amp;amp; A&#65;") == "<tag> &amp; AA"
    assert ex("<!-- <p>ghost</p> --><P>Upper</P>") == "Upper"
    assert ex("<div><p>un closed<div>next") == "un closed next"
    assert ex('<a href="x>y">link text</a> longer plain tail here') == (
        "link text longer plain tail here"
    )
    assert ex(None) == "" and ex("") == ""
    # void elements don't corrupt depth tracking
    assert ex("<p>a<br>b<hr>c</p>") == "a b c"


def test_link_extraction():
    # document order, duplicates kept, nav/footer links included (the
    # crawl frontier wants them; policy filtering is urls.py's job)
    assert H.extract_links_str(
        '<nav><a href="/">H</a> <a href="/a">A</a></nav>'
        '<p>x <a href="/sec/3">S</a></p><a>no href</a>'
        '<a href="/a">again</a>'
    ) == ["/", "/a", "/sec/3", "/a"]
    # entity-decoded attribute values; quoted '>' survives
    assert H.extract_links_str(
        '<a href="/q?a=1&amp;b=2">x</a><a href="x>y">z</a>'
    ) == ["/q?a=1&b=2", "x>y"]
    # links inside script strings are NOT links
    assert H.extract_links_str(
        "<script>var s = '<a href=\"/fake\">x</a>';</script>"
        '<a href="/real">r</a>'
    ) == ["/real"]
    assert H.extract_links_str(None) == []
    assert H.extract_links_str("") == []
    assert H.extract_links_str(123) == []


def test_whitespace_collapse_is_the_ascii_contract():
    # \t \n \f \r and space collapse; other controls are data
    assert ex("<p>a\t\n b\f\rc</p>") == "a b c"
    assert ex("<p> x \x0b y </p>") == "x \x0b y"


def test_escape_roundtrip_identity(spark):
    # escape -> parse is the identity the oracle contract rests on
    texts = [
        "plain", "a & b", "a < b > c", "&amp; already", "",
        "tags <p>inside</p> text", "mixed &lt; <b> & >",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    wrapped = df.select(
        "id",
        H.html_escape_expr(df.t).alias("_e"),
    ).selectExpr("id", "concat('<p>', _e, '</p>') AS _html")
    out = {
        r["id"]: r["main_text"]
        for r in H.extract_main_text(wrapped, "_html").collect()
    }
    import re

    for i, t in enumerate(texts):
        assert out[i] == re.sub(r"[\t\n\f\r ]+", " ", t).strip(" "), t


def test_spark_kernel_matches_python_reference(spark, sf_dir):
    from subgraph_extractor_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    wrapped = docs.selectExpr(
        "doc_id",
        "concat('<nav><a href=x>Home</a></nav><p>', "
        "replace(replace(replace(coalesce(text, ''), '&', '&amp;'), "
        "'<', '&lt;'), '>', '&gt;'), '</p><footer>f</footer>') AS _html",
    )
    got = {
        r["doc_id"]: r["main_text"]
        for r in H.extract_main_text(wrapped, "_html").collect()
    }
    raw = {r["doc_id"]: r["_html"] for r in wrapped.collect()}
    for did, h in raw.items():
        assert got[did] == H.extract_main_text_str(h)


def test_validation_and_block_joining():
    # blocks join with a single space; inline tags don't split blocks
    assert ex("<p>one</p><p>two</p>") == "one two"
    assert ex("<p>in<b>li</b>ne</p>") == "inline"
    assert ex("<ul><li>a</li><li>b</li></ul>") == "a b"
    # non-string input degrades to '' (the documented crawl-pipeline
    # posture: a dirty row must never fail the batch)
    assert ex(123) == ""


def test_anchor_text_extraction():
    ea = H.extract_anchor_texts_str
    assert ea(
        '<nav><a href="/">Home</a> <a href="/a">Ab  out</a></nav>'
        '<p><a href="/x">see <b>also</b> 3</a></p><a>no href</a>'
        '<a href="/t">tail'
    ) == [("/", "Home"), ("/a", "Ab out"), ("/x", "see also 3"),
          ("/t", "tail")]
    # nested <a> implicitly closes the open one (browser behavior);
    # text after the inner close belongs to no anchor
    assert ea('<a href="/o">outer <a href="/i">inner</a> after</a>') == [
        ("/o", "outer"), ("/i", "inner"),
    ]
    assert ea(None) == [] and ea("") == [] and ea(123) == []
