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

from european_emissions_data_warehouse_spark.functions.text import ws_tokens


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wfreq) — the corpus collapsed to its vocabulary.  One shuffle
    keyed on the word; at 100 TB this is the step that reduces petabyte
    token streams to a vocabulary table (typically <10⁷ rows), after which
    every later tokenizer-training stage is vocabulary-sized."""
    return (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))  # THE tokenization
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, pair_count) over a (word, wfreq) vocabulary frame — the pair
    derivation shared by bpe_pair_counts and bpe_apply_merge so the
    expansion/aggregation/tie-break can never drift between the learned
    rule and its reported effect (code-review r4)."""
    pairs = words.filter(F.length("word") >= 2).select(
        "wfreq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wfreq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
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
    return _pair_counts(word_frequencies(docs, text_col)).limit(top_n)


def bpe_apply_merge(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The other half of one BPE training iteration: APPLY the arg-max merge
    rule the count step just learned, and report its exact corpus-wide
    effect — one row ``(merge_pair, words_touched, merges_applied,
    symbols_before, symbols_after)``.

    Both halves run on the vocabulary table, never the corpus: the word
    frame is materialized once (vocabulary-sized — the localCheckpoint is a
    <10⁷-row frame even at 100 TB) and feeds BOTH the rule derivation and
    the rule application, so the petabyte token stream is scanned exactly
    once.  The merge rule travels as a broadcast 1-row frame — no
    driver-side collect.  Replacement counting is pure integer arithmetic
    ((len - len(replace(word, pair, ''))) / 2 — every non-overlapping
    left-to-right occurrence shortens the word by exactly 2), so the
    summary is bit-identical in any engine.
    """
    words = word_frequencies(docs, text_col).localCheckpoint(eager=True)
    rule = _pair_counts(words).limit(1).select("pair")
    applied = words.crossJoin(F.broadcast(rule)).select(
        F.col("pair"),
        "wfreq",
        F.length("word").alias("len_before"),
        F.length(F.replace(F.col("word"), F.col("pair"), F.lit(""))).alias("len_stripped"),
        F.col("word").contains(F.col("pair")).alias("touched"),
    )
    merges = (F.col("len_before") - F.col("len_stripped")) / 2
    # global agg, not groupBy(pair): a corpus with no length>=2 word has
    # no rule, the crossJoin is empty, and groupBy emitted ZERO rows where
    # the contract promises one summary row — callers doing
    # .first()['merges_applied'] crashed instead of seeing a zero-effect
    # summary (code-review r4).  With exactly one rule (every non-empty
    # corpus) the row is identical to the grouped form.
    return applied.agg(
        F.max("pair").alias("merge_pair"),
        # wfreq-weighted like every sibling measure in this row: the
        # unweighted form counted distinct VOCABULARY entries while
        # merges_applied/symbols_* count corpus occurrences, so
        # words_touched/total-corpus-words ratios were wrong whenever any
        # touched word repeats (code-review r4, operators pass)
        F.coalesce(
            F.sum(F.when(F.col("touched"), F.col("wfreq")).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("words_touched"),
        F.coalesce(F.sum(F.col("wfreq") * merges).cast("bigint"), F.lit(0))
        .cast("bigint")
        .alias("merges_applied"),
        F.coalesce(F.sum(F.col("wfreq") * F.col("len_before")), F.lit(0))
        .cast("bigint")
        .alias("symbols_before"),
        (
            F.coalesce(F.sum(F.col("wfreq") * F.col("len_before")), F.lit(0))
            - F.coalesce(F.sum(F.col("wfreq") * merges).cast("bigint"), F.lit(0))
        )
        .cast("bigint")
        .alias("symbols_after"),
    )


def _merge_fold(syms_col, left: str, right: str):
    """One BPE merge applied to a symbol-array Column: fold left-to-right,
    gluing every adjacent (left, right) occurrence into one symbol.

    The rule symbols are bound as ``F.lit`` DATA, never spliced into SQL
    text — corpus-derived symbols can contain quotes, backslashes, or
    anything else (an apostrophe is a common top merge in real text), and
    Python ``repr`` only coincidentally matches Spark's string-literal
    escaping (ADVICE r3: a single-quoted symbol came out double-quoted,
    which ANSI double-quoted-identifier mode parses as an identifier).
    Column binding has no escaping layer to get wrong, under any parser
    flags.

    aggregate() walks the array left-to-right, so overlapping runs merge
    greedily exactly like the reference BPE algorithm ("aaaa" under rule
    a+a -> [aa, aa]: a just-merged symbol can never match ``left`` again
    unless it literally equals it, which the recurrence handles
    naturally)."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids in the context's persistent-RDD registry (localCheckpoint blocks
    live there, invisible to DataFrame.unpersist)."""
    m = spark._jsc.sc().getPersistentRDDs()
    it, out = m.iterator(), set()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def _unpersist_rdds(spark, ids: set[int]) -> None:
    m = spark._jsc.sc().getPersistentRDDs()
    for rid in ids:
        if m.contains(rid):
            m.apply(rid).unpersist(False)


def _checkpoint_rdd_ids(df: DataFrame) -> set[int]:
    """The persisted RDD id(s) backing an eager localCheckpoint — read
    DIRECTLY off the checkpointed plan (a LogicalRDD), not by diffing the
    context-global persistent-RDD registry: the diff captured any RDD a
    CONCURRENT job persisted in the window and force-unpersisted it on the
    next iteration, truncated lineage and all (code-review r4, operators
    pass).  Falls back to empty (skip the sweep, lean on the context
    cleaner's GC) if the plan shape ever changes."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return {plan.rdd().id()}
    except Exception:
        pass
    return set()


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """The full BPE training loop: ``n_merges`` iterations of count →
    arg-max → merge, returning the ordered rule list
    ``[(left_sym, right_sym, pair_count), ...]`` — exactly what a
    tokenizer ships as merges.txt.

    Division of labor (the split every production trainer uses —
    HuggingFace/SentencePiece): the corpus-scale work is ONE pass that
    collapses the token stream to the weighted vocabulary; the merge loop
    then runs entirely on that vocabulary frame, re-counting pairs per
    iteration as tiny Spark jobs (vocab × word-length rows).  The driver
    holds only the k rules — never data.  Words are carried as symbol
    ARRAYS so merged symbols stay atomic (a naive string replace would let
    later merges match across the glued boundary).

    Determinism: ties break on (left, right) symbol order, so the rule
    list is reproducible in any engine — asserted by the hand-trained
    fixture test.

    Storage: each iteration pins ONE vocabulary-sized localCheckpoint; the
    superseded iteration's blocks are freed as soon as the new checkpoint
    materializes (they live in the persistent-RDD registry, invisible to
    DataFrame.unpersist), so executor storage is O(vocab), not
    O(n_merges x vocab) — at 10^4 merges over a 10^7-row vocabulary the
    unswept blocks exhausted MEMORY_AND_DISK (code-review r4)."""
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, text_col)
        .select(F.expr("split(word, '')").alias("syms"), "wfreq")
        .localCheckpoint(eager=True)
    )
    prev_ids = _checkpoint_rdd_ids(words)
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # size<2 words carry no pairs — and sequence(1, 0) DESCENDS in
        # Spark, so without the filter they explode out of bounds
        pairs = words.filter(F.size("syms") >= 2).select(
            "wfreq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] as l, syms[i] as r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("wfreq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        rules.append((left, right, int(cnt)))
        # apply the merge via the Column-bound fold (_merge_fold) — the
        # learned symbols travel as literals, never as SQL text
        words = words.select(
            _merge_fold(F.col("syms"), left, right).alias("syms"),
            "wfreq",
        ).localCheckpoint(eager=True)
        new_ids = _checkpoint_rdd_ids(words)
        # eager=True: the new blocks exist before the old ones are freed
        _unpersist_rdds(spark, prev_ids)
        prev_ids = new_ids
    _unpersist_rdds(spark, prev_ids)
    return rules


def bpe_encode(
    docs: DataFrame,
    rules: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a trained rule list (the output of :func:`bpe_train`):
    per document, the BPE token count and byte length after applying every
    merge in training order — the numbers a data pipeline actually needs
    (sequence budgeting, packing, cost estimates).

    Encoding composes the same greedy fold as training, once per rule, on
    the per-word symbol arrays; the fold chain is ONE generated JVM
    expression per word, and the only exchange is the per-doc rollup on
    doc_id (one corpus-sized shuffle of small count rows — the arrow twin
    avoids even that by aggregating inside each batch; the earlier
    'no shuffle at all' claim was wrong, code-review r4).  Plan depth
    grows with the rule count; for production vocabularies (10⁴⁺ merges)
    the same loop moves into the Arrow-batched UDF with the broadcast
    rule list — this expression form is the right tool for the rule
    counts a Spark-side analysis uses.

    Returns (doc_id, bpe_tokens, n_words).  Requires unique doc_id rows if
    compared against :func:`bpe_encode_arrow`, whose mapInPandas twin
    cannot aggregate across input rows sharing an id (code-review r4)."""
    syms = F.split(F.col("word"), "")
    for rule in rules:
        syms = _merge_fold(syms, rule[0], rule[1])
    words = docs.select(
        "doc_id",
        F.explode(ws_tokens(F.col(text_col))).alias("word"),  # THE tokenization
    )
    return (
        words.select("doc_id", F.size(syms).alias("n_toks"))
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").alias("bpe_tokens"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )


def bpe_encode_arrow(
    docs: DataFrame,
    rules: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Arrow-batched twin of :func:`bpe_encode` for PRODUCTION rule counts:
    the expression form composes one fold per rule into the plan, so at
    10⁴⁺ merges codegen size and analysis time blow up with the
    vocabulary; here the rule list ships once per executor inside the UDF
    closure (cloudpickle — the classic broadcast-small-side pattern) and
    each Arrow batch applies all merges in plain Python over the batch's
    words.  Same contract and bit-identical output as bpe_encode FOR
    UNIQUE doc_id rows (asserted by the parity test): (doc_id, bpe_tokens,
    n_words).  Inputs with duplicate doc_ids diverge — bpe_encode's
    groupBy folds them into one row while mapInPandas cannot aggregate
    across input rows, so this twin emits one row per input row
    (code-review r4).  Aggregates inside each batch, so no shuffle at
    all; scan-bound at any corpus size.

    Merges apply in training order with the same greedy left-to-right
    overlap semantics as _merge_fold; per word the merge loop touches
    only rules whose glued pair actually occurs (substring pre-check), so
    the common case is O(len(word) + rules-that-fire), not O(all rules).
    """
    import re

    import pandas as pd

    merge_list = [(left, right) for left, right, *_ in (tuple(r) for r in rules)]
    # Java-regex \s is ASCII-only ([ \t\n\x0B\f\r]) and Spark's trim strips
    # only 0x20 — Python's str.split()/strip() are Unicode-aware (U+00A0,
    # U+2009, U+0085 ... all split), which silently breaks parity on real
    # web text (code-review r4).  Reproduce the JVM tokenization exactly.
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def encode_word(word: str) -> int:
        syms = list(word)
        # "".join(syms) is invariantly == word (merges only concatenate
        # adjacent symbols), so the substring pre-check tests the original
        # word — the per-rule re-join made the loop O(rules x len) even
        # when zero rules fired (code-review r4)
        for left, right in merge_list:
            if left + right not in word:
                continue
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = out[-1] + s
                else:
                    out.append(s)
            syms = out
        return len(syms)

    def encode(batches):
        for pdf in batches:
            ids, n_toks, n_words = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in java_ws.split((text or "").strip(" ")) if w]
                if not words:
                    continue  # parity: the explode form emits no row either
                ids.append(doc_id)
                n_words.append(len(words))
                n_toks.append(sum(encode_word(w) for w in words))
            yield pd.DataFrame(
                {"doc_id": ids, "bpe_tokens": n_toks, "n_words": n_words}
            )

    return (
        docs.select("doc_id", F.col(text_col).alias("text"))
        .mapInPandas(encode, schema="doc_id long, bpe_tokens long, n_words long")
    )
