"""Corpus-quality operators for training-data pipelines (SURVEY.md §2.3):
Gopher-style repetition signals and source-mixture reporting.

These are the filters/reports an LLM data pipeline runs between ingest and
tokenization (Rae et al. 2021 "Scaling Language Models" §A1.1 published the
repetition heuristics; mixture weighting is the standard pre-sampling step).
Everything is explode/groupBy/window over built-in expressions — JVM-side,
shuffle-keyed on the document id, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.functions.text import ws_token_count, ws_tokens


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition statistics — the Gopher-rules repetition
    family: (id, n_words, n_distinct_words, top_word_n, top_bigram_n,
    dup_word_frac, top_word_frac, top_bigram_frac).

    Shape: posexplode whitespace tokens once; unigram counts are one
    groupBy(id, word) + one groupBy(id) roll-up, bigram counts reuse the
    same exploded rows via a per-id LEAD window (the window and both
    groupBys all shuffle on the id, so AQE coalesces them onto one
    exchange footprint).  Fractions are single IEEE divisions of exact
    counts — engine-reproducible bit-for-bit, no float accumulation.
    At 100 TB this is the cheapest repetition screen there is: cost is
    one token explode, and the groupBy keys (id, word) are unskewed by
    construction.
    """
    # ws_tokens is THE tokenization (phantom-''-token handling included);
    # the per-site re-inline of split+filter had to re-fix that bug per
    # copy (code-review r4, operators pass).  pos is dense over non-empty
    # tokens — only its ORDER feeds the bigram window, so this is
    # element-identical to the old post-filter form.
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "w"),
    )
    # materialized: the unigram groupBy and the bigram window consume toks
    # under different shuffle keys ((id,w) vs id), so without the
    # checkpoint the corpus is re-scanned and re-tokenized per branch —
    # the same multi-consumer fix ranking.term_index carries
    # (code-review r4).  Lifecycle: the blocks back the RETURNED frame, so
    # they cannot be freed here — they are reclaimed by the context
    # cleaner once the result is garbage-collected (a per-ingest-batch
    # caller holds at most one token-stream copy per live result, not an
    # unbounded accumulation; code-review r4, operators pass).
    toks = toks.localCheckpoint(eager=False)
    uni = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    uni_stats = uni.groupBy("id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("top_word_n"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = toks.withColumn("w2", F.lead("w").over(w)).filter(F.col("w2").isNotNull())
    bigram_stats = (
        bigrams.groupBy("id", "w", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    n_words = F.col("n_words")
    return (
        uni_stats.join(bigram_stats, "id", "left")
        .select(
            "id",
            "n_words",
            "n_distinct_words",
            "top_word_n",
            F.coalesce("top_bigram_n", F.lit(0)).cast("long").alias("top_bigram_n"),
            ((n_words - F.col("n_distinct_words")) / n_words).alias("dup_word_frac"),
            (F.col("top_word_n") / n_words).alias("top_word_frac"),
            F.when(
                n_words > 1, F.coalesce("top_bigram_n", F.lit(0)) / (n_words - 1)
            ).alias("top_bigram_frac"),
        )
    )


def token_rarity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token-rarity score: the mean corpus document frequency
    of a doc's tokens — (id, n_words, sum_df, avg_token_df).  Low scores
    mean rare/unseen vocabulary (specialist or noisy text), high scores
    mean the doc is built from corpus-common words; it is the integer-exact
    stand-in for a unigram-LM perplexity screen (true log-prob scoring is
    not engine-reproducible: libm log differs across engines bit-wise).

    The vocabulary table (token -> document frequency) joins back onto the
    exploded token stream SIZE-BASED, not hinted: at fixture/bench scale
    the planner broadcasts it (the corpus never shuffles on the token and
    the only exchange is the per-doc roll-up), but a 100 TB web corpus's
    distinct-token set (URLs, numbers, typos) runs to billions of rows —
    an explicit hint there hard-fails on the 8 GB broadcast ceiling, while
    the planner's fallback shuffle join on the token stays correct (the
    pre-aggregated vocab side carries no stopword hot keys; code-review
    r4, scale pass — the same policy q_unigram_logprob documents).
    Scores are exact-integer sums with one final IEEE division —
    bit-reproducible anywhere.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.col(text_col))).alias("w"),  # THE tokenization
    )
    # materialized: df_tab aggregates toks AND the scoring join probes it —
    # two corpus scans without the checkpoint (code-review r4).  Same
    # cleaner-reclaimed lifecycle note as repetition_signals' checkpoint.
    toks = toks.localCheckpoint(eager=False)
    df_tab = (
        toks.distinct().groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        toks.join(df_tab, "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "id",
            "n_words",
            "sum_df",
            (F.col("sum_df") / F.col("n_words")).alias("avg_token_df"),
        )
    )


def source_mixture(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Training-mixture report: per source, document and token totals plus
    each source's share of the corpus token budget — the numbers a sampling
    schedule (mixture weights, epoch counts) is derived from.

    Two aggregations: per-source totals (one shuffle on the group key),
    then the grand total (a single-row aggregate) broadcast back across the
    per-source rows.  Shares are one exact-BIGINT division each — no float
    accumulation, so the report is bit-reproducible on any engine and any
    partitioning.  The group-key cardinality is "number of sources"
    (thousands at web scale), so every stage after the first partial
    aggregation is negligible.
    """
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        # coalesced: a source whose texts are all NULL otherwise reports
        # NULL n_tokens (SUM skips nulls) instead of 0 (code-review r4,
        # operators pass)
        F.coalesce(F.sum(ws_token_count(F.col(text_col))), F.lit(0)).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("__total_tokens"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            # guarded: a zero-token corpus slice (empty/whitespace docs)
            # made this an ANSI DIVIDE_BY_ZERO job abort; an undefined
            # mixture share is NULL, not a crash (code-review r4,
            # operators pass — reproduced)
            F.when(
                F.col("__total_tokens") > 0,
                F.col("n_tokens") / F.col("__total_tokens"),
            ).alias("token_share"),
            (F.col("n_tokens") / F.col("n_docs")).alias("tokens_per_doc"),
        )
    )


def nb_quality_scores(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Naive-Bayes quality scoring — the CCNet/GPT-3 recipe: bootstrap a
    token-level classifier from cheap labels, score every document with it.
    ``label_col`` is a boolean column (the pseudo-label: a heuristic
    threshold, a curated-domain flag, a hand-labeled seed set).

    Output: (id, n_tokens, nb_logodds) where nb_logodds is the summed
    per-token log-odds ln((n_good+1)/(T_good+V)) − ln((n_bad+1)/(T_bad+V))
    plus the document-count class prior — positive leans good.  Exact
    integer counts feed libm ln (≤1 ulp cross-engine); the sum rounds to 4
    decimals like every log-score in this engine.

    Scale: one token-count shuffle builds the class-conditional vocabulary
    table; scoring joins the token stream to that table — broadcast here,
    a shuffle join at web-scale vocabularies (same contract as
    unigram_logprob) — and rolls up per document.  Training IS one
    aggregation; there is no iterative fit."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("good"),
        F.col(text_col).alias("t"),
    ).localCheckpoint(eager=True)  # labels feed vocab, priors, AND scoring
    toks = base.select(
        "id",
        "good",
        F.explode(ws_tokens(F.lower(F.col("t")))).alias("tok"),  # THE tokenization
    )
    vocab = toks.groupBy("tok").agg(
        F.sum("good").alias("n_good"),
        F.sum(1 - F.col("good")).alias("n_bad"),
    )
    scal = vocab.agg(
        F.sum("n_good").alias("t_good"),
        F.sum("n_bad").alias("t_bad"),
        F.count(F.lit(1)).alias("v"),
    )
    # single-class pseudo-labels make the prior 0/x or x/0 — an undefined
    # classifier, and under ANSI a mid-job DIVIDE_BY_ZERO.  A heuristic
    # label can easily be single-class on a corpus slice; fail with a
    # diagnosis instead (code-review r4).
    n_good = F.sum("good")
    n_bad = F.sum(1 - F.col("good"))
    prior = base.agg(
        F.when(
            (n_good > 0) & (n_bad > 0),
            F.log(n_good.cast("double") / n_bad),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("nb_quality_scores: pseudo-labels are single-class ("),
                    n_good.cast("string"),
                    F.lit(" good / "),
                    n_bad.cast("string"),
                    F.lit(" bad) — the NB prior is undefined; fix the labeling rule"),
                )
            ).cast("double")
        )
        .alias("prior")
    )
    logodds = F.log((F.col("n_good") + 1) / (F.col("t_good") + F.col("v"))) - F.log(
        (F.col("n_bad") + 1) / (F.col("t_bad") + F.col("v"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(scal))
        .crossJoin(F.broadcast(prior))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(logodds) + F.first("prior"), 4).alias("nb_logodds"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "nb_logodds")
        # no orderBy: a corpus-wide global sort bought nothing (the driver
        # compare and every consumer are order-insensitive) and cost a
        # full range-exchange of the output (code-review r4, operators
        # pass)
    )
