"""Tokenizer-training support (SURVEY.md §2.3 north star): the count step
of byte-pair-encoding training, expressed corpus-scale.

BPE training iterates: count adjacent symbol pairs over the corpus
(weighted by word frequency), merge the arg-max pair, repeat.  The
expensive, data-parallel part is the COUNT step; the merge loop itself is
vocabulary-sized driver work in every production trainer
(HuggingFace/SentencePiece do exactly this split).  This module implements
the count step as a Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wfreq) — the corpus collapsed to its vocabulary.  One shuffle
    keyed on the word; at 100 TB this is the step that reduces petabyte
    token streams to a vocabulary table (typically <10⁷ rows), after which
    every later tokenizer-training stage is vocabulary-sized."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text", top_n: int = 20) -> DataFrame:
    """First BPE merge iteration: adjacent character-pair counts weighted
    by word frequency; the arg-max row is the first merge rule.

    Output: ``(pair, pair_count)`` — the ``top_n`` most frequent pairs,
    ties broken by pair text so the cut is deterministic cross-engine.

    Scale shape: pair expansion runs on the VOCABULARY table produced by
    :func:`word_frequencies`, never on the corpus — each distinct word
    explodes into len-1 two-char substrings exactly once, weighted by its
    corpus frequency.  The final top-n is TakeOrderedAndProject
    (per-partition heaps), not a global sort.
    """
    words = word_frequencies(docs, text_col).filter(F.length("word") >= 2)
    pairs = words.select(
        "wfreq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wfreq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(top_n)
    )
