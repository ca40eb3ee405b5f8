"""Whole-stage-codegen compile gate (r8 verdict task 2).

Spark's default ``spark.sql.codegen.fallback=true`` silently demotes a
plan to interpreted expression evaluation when janino refuses to
compile the generated class — exactly what happened to ``text_lang``
in r8 (a ~14k-line class, the round's only bench regression) with no
test anywhere whose job was to notice.  With ``fallback=false`` the
compile failure RAISES instead.  This module runs the expression-
heaviest ``queries()`` entries under that setting at sf0.001, so a
reintroduced expression-tree blowup is a red test, not a log line.

The full-coverage twin lives in scripts/check_correctness.py, whose
session also sets ``fallback=false`` — every one of the 209 declared
queries runs under the compile gate in each round's local sweep.
"""

import pytest

import __spark_entry__ as em

# the widest expression trees in the repo: marker-count language ID
# (the r8 failure), multi-feature quality scans, regex-heavy redaction
# and cleaning, the disjunctive OR-of-ANDs TPC-H shape, and the big
# scalar-function surfaces
HEAVY = [
    "text_lang",
    "text_quality",
    "quality_gopher_rules",
    "text_repetition",
    "text_pii_redact",
    "pipeline_clean_corpus",
    "tpch_q19_shape",
]


@pytest.mark.parametrize("name", HEAVY)
def test_whole_stage_codegen_compiles(spark, sf_dir, name):
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert em.queries()[name](spark, sf_dir).count() >= 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_predict_lang_matches_python_reference_on_edge_cases(spark):
    """The staged greatest/when argmax must preserve the legacy
    when-chain semantics exactly (the oracle SQL still replicates the
    old chain): NULL text falls through to the first language code,
    whitespace-only and marker-free text score 'und', ties break
    alphabetically, and marker counts are per-occurrence."""
    from subgraph_extractor_spark.operators import text_analysis as ta
    from pyspark.sql import functions as F

    def ref(text):
        if text is None:
            return "de"  # legacy all-NULL fall-through
        toks = text.strip().lower().split()
        scores = {
            lang: sum(toks.count(w) for w in ws)
            for lang, ws in ta.LANG_MARKERS.items()
        }
        best_lang, best = None, None
        for lang in sorted(scores):
            if best is None or scores[lang] > best:
                best_lang, best = lang, scores[lang]
        return "und" if best <= 0 else best_lang

    texts = [
        None,
        "",
        "   ",
        "the cat and the dog of a house",
        "el perro de la casa que los gatos",
        "the el",  # en/es tie -> en (alphabetical)
        "la la de de",  # es/fr share markers
        "THE   The\tthe\nof",  # case fold + mixed whitespace
        "xyzzy plugh",
        "der la the",  # three-way tie -> de
        "的 是 了 在 我 的",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["lang"]
        for r in df.select(
            "i", ta.predict_lang(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {i: ref(t) for i, t in enumerate(texts)}
