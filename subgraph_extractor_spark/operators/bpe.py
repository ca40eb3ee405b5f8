"""Distributed byte-pair-encoding (BPE) merge training and encoding.

Classic corpus-level BPE (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016): train on the
DISTINCT-WORD frequency table, not the raw corpus — the symbol state is
one row per unique word, so a terabyte corpus collapses to a
few-million-row table after the first aggregate and every merge round
touches only that table.

Spark-first shape:

  word_freqs     one groupBy over the exploded token stream — the only
                 corpus-sized shuffle in the whole trainer.
  train round    explode adjacent symbol pairs weighted by word
                 frequency (codegen HOF, no UDF) -> one aggregate ->
                 argmax with a deterministic tie-break
                 (count DESC, left ASC, right ASC) -> ONE collected row
                 (a driver artifact like KMeans centroids) -> apply the
                 merge to the symbol arrays with an Arrow-batched
                 pandas_udf (left-to-right non-overlapping replace,
                 exactly Sennrich's regex semantics).
  encode         the learned merge list is a broadcast-sized driver
                 artifact; encoding a corpus encodes DISTINCT words once
                 and joins the token arrays back onto the token stream.

Cost: 2 jobs per merge round over the word table; ``localCheckpoint``
per round keeps the plan flat.  100 TB notes: the word table is
shuffle-partitioned by word; rounds never touch the corpus again.  For
very large merge budgets batch the pair-count aggregate (top-k merges
whose supports don't interact) — the round structure here favors
auditability (each learned merge is the true argmax at its rank).

Reference parity: no tokenizer surface exists in the reference engine
(cli.py); this module is part of the LLM-pipeline extension surface
(SURVEY §2.12).  The regex "BPE-ish" token counter lives in
text_analysis; this is the real merge-learning path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from subgraph_extractor_spark.operators.dedup import tokens

END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the one
    corpus-sized aggregate; everything downstream runs on this table."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(word_col) -> "F.Column":
    """Character symbols plus the end-of-word marker — codegen HOF
    (substr over an index sequence), no UDF."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: word_col.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms_col_name: str = "syms"):
    """Struct array of every adjacent symbol pair (overlapping, like
    Sennrich's get_stats) — pure codegen.  Precondition: the array has
    >= 2 elements (sequence() descends for negative spans under ANSI
    indexing; callers filter size >= 2 first)."""
    return F.expr(
        f"transform(sequence(0, size({syms_col_name}) - 2), "
        f"i -> struct({syms_col_name}[i] AS a, {syms_col_name}[i+1] AS b))"
    )


def merge_word(syms: list, a: str, b: str) -> list:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (a, b) by the fused symbol — identical to Sennrich's
    ``re.sub(' '.join(pair), ''.join(pair), word)``."""
    out, i, n = [], 0, len(syms)
    fused = a + b
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(fused)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge_udf(a: str, b: str):
    @pandas_udf("array<string>")
    def apply(col: pd.Series) -> pd.Series:
        return col.map(lambda s: merge_word(list(s), a, b))

    return apply


def train_bpe(
    wf: DataFrame,
    num_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from a (word, freq) table.
    Returns [(left, right, pair_count), ...] in merge-rank order; stops
    early when the best remaining pair's count drops below
    ``min_count``.  Each round: one pair-count aggregate (codegen
    explode), one collected argmax row, one Arrow-batched merge
    application; symbol state is localCheckpoint-ed per round so the
    plan never deepens."""
    state = (
        wf.select("word", "freq", initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            # fully-merged words (one symbol) have no adjacent pairs;
            # dropping them also guards sequence()'s descending branch
            state.filter(F.size("syms") >= 2)
            .select("freq", F.explode(_adjacent_pairs()).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        # EAGER deliberately (r11 A/B): a lazy checkpoint (the merge
        # kernel riding the next round's collect as one job) measured
        # 9.09 -> 9.69 s bench-class at sf0.1 — the rounds are
        # compute-bound (pair explode + Arrow merge kernel), not
        # barrier-bound, so halving the job count bought nothing.
        state = state.withColumn(
            "syms", _apply_merge_udf(a, b)(F.col("syms"))
        ).localCheckpoint(eager=True)
    return merges


def encode_words(wf: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(word, tokens array) — apply the learned merges in rank order to
    each distinct word.  The merge list is a driver artifact captured in
    the UDF closure (broadcast-sized: a vocabulary, not data)."""
    ranked = [(a, b) for a, b, _ in merges]

    @pandas_udf("array<string>")
    def apply_all(col: pd.Series) -> pd.Series:
        def enc(word: str) -> list:
            syms = list(word) + [END_OF_WORD]
            for a, b in ranked:
                syms = merge_word(syms, a, b)
            return syms

        return col.map(enc)

    return wf.select("word", apply_all(F.col("word")).alias("tokens"))


def encode_corpus(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """(id, tokens) per document: encode DISTINCT words once, then join
    the per-word token arrays back onto the ordered token stream and
    re-assemble — the corpus is never run through Python; only the
    unique-word table is."""
    stream = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    vocab = encode_words(
        stream.select("word").distinct(), merges
    )
    encoded = (
        stream.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
    )
    # NULL / empty-text docs explode to zero rows — restore them with an
    # empty token array so the (id, tokens) per-document contract holds
    return docs.select(id_col).join(encoded, id_col, "left").select(
        id_col,
        F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
    )


def merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a DataFrame (rank, left, right, pair_count)
    — persist it next to the corpus so encoders don't retrain."""
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count bigint",
    )
