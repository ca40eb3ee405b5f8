"""Text analysis: token counts vs python reference, lang-id determinism,
fingerprints, winnowing."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import text_analysis as ta


def test_token_count_matches_python(spark):
    samples = [
        "", "  ", "one", "two words", "  padded   tokens  here ",
        "a\tb\nc", "the the the",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "text"])
    rows = df.select("i", ta.token_count(F.col("text")).alias("n")).collect()
    for r in rows:
        expected = len(samples[r["i"]].split())
        assert r["n"] == expected, f"{samples[r['i']]!r}"


def test_word_count_of_handles_runs(spark):
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "the theatre loathe"), (3, "The THE tHe")],
        ["i", "text"],
    )
    rows = {
        r["i"]: r["n"]
        for r in df.select(
            "i", ta.word_count_of(F.col("text"), "the").alias("n")
        ).collect()
    }
    assert rows == {1: 3, 2: 1, 3: 3}  # token-delimited, case-folded


def test_predict_lang_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "el perro de la casa que los gatos"),
            (3, "der hund und die katze das nicht"),
            (4, "xyzzy plugh"),
        ],
        ["i", "text"],
    )
    rows = {
        r["i"]: r["lang"]
        for r in df.select("i", ta.predict_lang(F.col("text")).alias("lang")).collect()
    }
    assert rows == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_features_deterministic(spark):
    df = spark.createDataFrame([(1, "Hello, world! the end.")], ["i", "text"])
    row = ta.quality_features(df, "text").first()
    text = "Hello, world! the end."
    assert row["n_chars_q"] == len(text)
    assert row["n_tokens"] == len(text.split())
    punct = sum(1 for c in text if c in ".,;:!?")
    assert abs(row["punct_ratio"] - punct / len(text)) < 1e-12
    no_ws = re.sub(r"\s+", "", text)
    assert abs(row["mean_token_len"] - len(no_ws) / len(text.split())) < 1e-12


def test_content_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")],
        ["i", "text"],
    )
    rows = {
        r["i"]: r["fp"]
        for r in df.select(
            "i", ta.content_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert rows[1] == rows[2] != rows[3]
    assert rows[2] == hashlib.sha256(b"hello world").hexdigest()


def test_winnowing_fingerprints(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra tail words appended here"), (3, "unrelated")],
        ["i", "text"],
    )
    rows = {
        r["i"]: set(r["fp"] or [])
        for r in df.select(
            "i", ta.winnowing_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    # shared prefix -> overlapping fingerprints; unrelated -> none shared
    assert rows[1] & rows[2]
    assert not (rows[1] & rows[3])


def test_repetition_features_python_reference(spark):
    from collections import Counter

    samples = [
        (0, "buy now buy now buy now buy now"),   # dominated by one bigram
        (1, "all distinct words appear here once"),  # no repetition
        (2, "a b c a b c a b c"),                  # repeated trigram cycle
        (3, "single"),                             # sub-bigram-length
        (4, ""),                                   # empty
    ]
    df = spark.createDataFrame(samples, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"])
        for r in ta.repetition_features(df, "text", "doc_id").collect()
    }

    def grams(toks, n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    for doc_id, text in samples:
        toks = text.lower().split()
        bi, tri = grams(toks, 2), grams(toks, 3)
        exp_top = max(Counter(bi).values()) / len(bi) if bi else 0.0
        exp_dup = (
            sum(c for c in Counter(tri).values() if c > 1) / len(tri)
            if tri else 0.0
        )
        assert got[doc_id] == pytest.approx((exp_top, exp_dup)), text


def test_winnowing_md5_mode_matches_oracle_sql_on_adversarial_text(spark):
    """The md5_64 winnowing kernel must equal the DuckDB window-min SQL
    formulation byte-for-byte on adversarial ASCII inputs — tabs and
    newlines at the edges, vertical tabs (NOT in the RE2 \\s class),
    repeated separators, sub-k docs, empty and space-only docs."""
    import random

    import duckdb
    import pandas as pd
    import __spark_entry__ as em

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "x", "Y9", "zz_1"]
    seps = [" ", "  ", "\t", "\n", " \t ", "\r\n"]
    docs = []
    for i in range(60):
        n = rng.randrange(0, 30)
        body = ""
        for j in range(n):
            body += rng.choice(words) + rng.choice(seps)
        lead = rng.choice(["", " ", "\t", "\n "])
        docs.append((i, lead + body))
    docs += [
        (100, ""),
        (101, "   "),
        (102, "\t\t"),
        (103, "a\x0bb c d e f g"),       # \x0b is NOT an RE2 \s char
        (104, "one two three four"),      # sub-k (k=5) -> no fingerprints
        (105, "one two three four five"),  # exactly k
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "doc_id",
            F.explode(
                ta.winnowing_fingerprints(F.col("text"), hash_name="md5_64")
            ).alias("fp"),
        )
        .toPandas()
    )
    got_set = {(int(r.doc_id), int(r.fp)) for r in got.itertuples()}

    con = duckdb.connect()
    con.register("documents", pdf)
    odf = con.execute(em.ORACLES["text_winnowing"]).df()
    want_set = {(int(r.doc_id), int(r.fp)) for r in odf.itertuples()}
    assert got_set == want_set and want_set


def test_token_df_scores_hand_corpus(spark):
    # corpus: "the" appears in 3 docs, "cat" in 2, "sat" in 1, "mat" in 1.
    # Repeats within a doc must not inflate DF (per-doc distinct).
    from subgraph_extractor_spark.operators import text_analysis as ta

    docs = [
        (1, "the cat sat"),
        (2, "the the cat"),   # 'the' twice in-doc -> still DF contribution 1
        (3, "THE mat"),       # case-folded
    ]
    out = {
        r["doc_id"]: r
        for r in ta.token_df_scores(
            spark.createDataFrame(docs, ["doc_id", "text"]), "text", "doc_id"
        ).collect()
    }
    # DFs: the=3, cat=2, sat=1, mat=1
    assert out[1]["n_unique_tokens"] == 3
    assert out[1]["avg_token_df"] == (3 + 2 + 1) / 3.0
    assert out[1]["min_token_df"] == 1
    assert out[2]["n_unique_tokens"] == 2          # {the, cat}
    assert out[2]["avg_token_df"] == (3 + 2) / 2.0
    assert out[2]["min_token_df"] == 2
    assert out[3]["avg_token_df"] == (3 + 1) / 2.0
    assert out[3]["min_token_df"] == 1


def test_token_df_scores_plan_shape(spark):
    # The DF-stats side must NOT be broadcast (vocabulary of a 100 TB
    # corpus is itself huge): both join sides hash-partition on the token.
    from subgraph_extractor_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3}") for i in range(100)],
        ["doc_id", "text"],
    )
    plan = (
        ta.token_df_scores(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan


def test_bpe_tokens_adversarial_cross_engine(spark):
    """The BPE-ish pretokenizer counts must agree between Spark (Java
    regex) and DuckDB (RE2) on the divergence classes: \\x0b (vertical
    tab — in Java's \\s, NOT in RE2's, hence the explicit whitespace
    class), unicode letters (outside [A-Za-z] in both), and mixed runs."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em

    texts = [
        "plain words 123 !!",
        "a\x0bb",                 # \x0b must count as an 'other' run
        "héllo wörld 42",         # é/ö are 'other' runs in both engines
        "...---...",
        "tabs\tand\nnewlines 7x7",
        "",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)

    # the PRODUCTION expressions (em.bpe_count_cols consumes
    # em.BPE_PATTERNS — the same strings the oracle SQL is built from),
    # applied to the in-memory adversarial table: an edit to the
    # patterns is automatically covered here
    cols = em.bpe_count_cols()
    names = [name for name, _ in cols]
    assert names == list(em.BPE_PATTERNS)
    got = {
        r["doc_id"]: tuple(r[name] for name in names)
        for r in sdf.select(
            "doc_id", *(col.alias(name) for name, col in cols)
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(em.ORACLES["text_bpe_tokens"]).fetchall()
    }
    assert got == want
    assert got[1] == (3, 2, 0, 1)  # 'a', 'b' words + one \x0b other-run


# ---------------------------------------------------------------- zlib
# compression-ratio quality signal


def test_compression_ratio_matches_python_replica(spark, sf_dir):
    import zlib

    from subgraph_extractor_spark.operators.text_analysis import (
        compression_ratio,
    )
    from subgraph_extractor_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").limit(100)
    got = {
        r["doc_id"]: r["cr"]
        for r in d.select(
            "doc_id", compression_ratio(F.col("text")).alias("cr")
        ).collect()
    }
    for r in d.select("doc_id", "text").collect():
        t = r["text"]
        if t is None or t == "":
            assert got[r["doc_id"]] is None
        else:
            b = t.encode("utf-8")
            assert got[r["doc_id"]] == len(zlib.compress(b, 6)) / len(b)


def test_compression_ratio_separates_repetition_from_noise(spark):
    import random

    rng = random.Random(7)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(4000))
    # varied prose (measured ratio ~0.53): random draws from a
    # moderate vocabulary — word structure compresses, content doesn't
    rng2 = random.Random(11)
    vocab = [
        "".join(rng2.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng2.randint(3, 9)))
        for _ in range(800)
    ]
    prose = " ".join(rng2.choice(vocab) for _ in range(600)) + "."
    rows = [
        (1, prose),                            # varied text (~0.53)
        (2, "buy now click here " * 200),      # boilerplate (~0.014)
        (3, noise),                            # random junk (~0.67)
        (4, ""),                               # empty
        (5, None),                             # null
    ]
    from subgraph_extractor_spark.operators.text_analysis import (
        compression_gate,
        compression_ratio,
    )

    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["cr"]
        for r in df.select(
            "id", compression_ratio(F.col("text")).alias("cr")
        ).collect()
    }
    assert got[2] < got[1] < got[3]      # boilerplate << prose << noise
    assert got[3] > 0.5                  # random text barely compresses
    assert got[2] < 0.05                 # repetition farm collapses
    assert got[4] is None and got[5] is None

    # default max_ratio=1.05 targets binary/already-compressed junk;
    # alphanumeric noise sits ~0.65, so tighten the knob to drop it
    kept = {
        r["id"]
        for r in compression_gate(df, "text", max_ratio=0.6).collect()
    }  # prose ~0.53 sits inside [0.25, 0.6]; noise ~0.67 is out
    assert 2 not in kept                 # boilerplate dropped
    assert 3 not in kept                 # noise dropped
    assert 4 not in kept and 5 not in kept
    assert 1 in kept


def test_gopher_quality_gate_rules(spark):
    """Each rule kills exactly its designed offender; healthy prose
    passes.  (Rule arithmetic is cross-engine-checked full-value by the
    quality_gopher_rules driver oracle; this pins gate semantics.)"""
    from subgraph_extractor_spark.operators import text_analysis as ta

    healthy = (
        "the cat sat near the fire and a dog slept while winds of "
        "autumn carried leaves to the river " * 3
    )
    rows = [
        (1, healthy),
        (2, "the of and to a"),                       # too few words
        (3, " ".join(["the a of and to"] * 8)
            + " " + " ".join(["xx"] * 20)),           # mean_word_len < 3
        (4, healthy + " " + " ".join(["####"] * 12)), # symbol_ratio > 0.1
        (5, " ".join(["the a of and to"] * 4)
            + " " + " ".join(["1234567"] * 25)),      # alpha ratio < 0.8
        (6, "\n".join(["- the bullet point of a list and to it"] * 30)),
        (7, "\n".join(["the sentence trails off and a to of..."] * 30)),
        (8, " ".join(["word salad without stops"] * 20)),  # no stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {
        r["doc_id"]
        for r in ta.gopher_quality_gate(df, "text", min_words=20).collect()
    }
    assert kept == {1}
    feats = {
        r["doc_id"]: r
        for r in ta.gopher_quality_features(df, "text").collect()
    }
    assert feats[6]["bullet_ratio"] == 1.0
    assert feats[7]["ellipsis_ratio"] == 1.0
    assert feats[8]["n_stop_distinct"] == 0
    assert feats[1]["n_stop_distinct"] == 5
