"""Lexical relevance ranking over a document corpus: TF-IDF and BM25.

The reference's analytical surface stops at SQL aggregates (its processed
data is "extracted from the database using SQL queries", reference
README.md:147); a training-data pipeline additionally needs keyword
relevance scoring — for corpus search, near-duplicate triage, and
quality-weighted retrieval mixes.  Both scorers here are pure DataFrame
compositions (tokenize → per-doc term counts → corpus statistics → score),
so Catalyst keeps the whole plan JVM-side.

Scale design (100 TB corpus):
- the (doc, term) count is ONE shuffle keyed on (doc_id, term) with map-side
  combine; term document-frequencies aggregate that result (second, far
  smaller shuffle keyed on term);
- corpus scalars (N, avg doc length) are 1-row aggregates broadcast via
  cross join — no driver round-trip, no collect;
- the term index is materialized once (lazy localCheckpoint) before the
  derived aggregates (df, dl, corpus stats) consume it — without this,
  column pruning makes each branch's exchange distinct and Spark re-scans
  and re-tokenizes the corpus once per branch (4 scans observed).  In a
  standing search system the index is a persisted table; the checkpoint is
  the one-shot-query equivalent;
- per-query scoring filters the term index to the query's terms BEFORE any
  join (predicate pushdown makes the scored relation ~|query| × docs-hit);
- top-k is `orderBy + limit` = TakeOrderedAndProject (per-partition heaps,
  driver merges k rows), never a global sort;
- scores are ROUND()ed before ranking so cross-engine float noise (libm
  `ln` differs by ≤1 ulp between runtimes) cannot reorder results:
  ordering is (rounded score DESC, id) — fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.functions.text import ws_tokens



def tokenize(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, term) rows: lowercase, whitespace-split, empties dropped.
    Mirrors the corpus convention used by the dedup family
    (DuckDB: ``string_split_regex(lower(trim(text)), '\\s+')``)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),  # THE tokenization
    )


def term_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document term frequencies: (doc_id, term, tf).  The single wide
    shuffle of the ranking family; everything downstream is derived."""
    return tokenize(docs, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df): number of documents containing each term.  `tf` is already
    distinct per (doc, term), so df is a plain count."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf, idf = ln(N/df).

    Columns: doc_id, term, tfidf (rounded 4), rank.  Rank ties break on term
    so output is total-ordered and cross-engine stable."""
    tf = term_index(docs).localCheckpoint(eager=False)
    df = doc_frequencies(tf)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag of query terms.

    idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Columns: doc_id, score (rounded 4), rank.  avgdl is computed as
    SUM(dl)/COUNT(*) explicitly (not AVG) so both engines perform the same
    IEEE division.

    N and avgdl's denominator are the COLLECTION size (docs.count), not
    the count of tokenizable docs — token-less documents have no dl row,
    and deriving N from dl deflated it versus the standard BM25 definition
    (and versus tfidf_top_terms' N; code-review r4).  A repeated query
    term contributes once per occurrence, as the bag-of-terms contract
    says: each distinct term's score is weighted by its query frequency.

    Query terms are lowercased to match tokenize()'s corpus convention —
    un-normalized they silently matched nothing ('Spark' returned an
    empty result over a corpus containing 'Spark'; code-review r4)."""
    from collections import Counter

    qtf = Counter(t.lower() for t in query_terms)
    qterms = list(qtf)
    tf = term_index(docs).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = doc_frequencies(tf)
    n_collection = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = dl.agg(F.sum("dl").alias("_sum_dl")).crossJoin(
        F.broadcast(n_collection)
    ).select("n_docs", (F.col("_sum_dl") / F.col("n_docs")).alias("avgdl"))
    qweight = F.create_map(
        *[x for t, c in qtf.items() for x in (F.lit(t), F.lit(float(c)))]
    )
    matched = tf.filter(F.col("term").isin(qterms))
    scored = (
        matched.join(F.broadcast(df.filter(F.col("term").isin(qterms))), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.element_at(qweight, F.col("term"))
            * F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"))
    )
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition heaps,
    # driver merge of k rows) — docs containing a query term can be a huge
    # hit-set for common terms, so no global window touches it.  The rank
    # window runs AFTER the limit, over exactly k rows.
    topk = scored.orderBy(F.desc("score"), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", F.col("rank").cast("long").alias("rank")
    )
