"""Fixed-size frequency sketches (SURVEY.md §2.3 north star — text
analysis at stream scale).

The count-min sketch (Cormode & Muthukrishnan 2005) answers "how often
does token X occur in a 100 TB stream?" with a table whose size is
``depth × width`` counters — independent of both the stream length and
the vocabulary size.  Guarantees: the estimate never undercounts, and
overcounts by at most ``e/width · N`` with probability ``1 − e^-depth``
(N = stream length).  Exact top-k (``token_topk``-style TakeOrdered over
a full groupBy) is the small-scale truth path; the sketch is what ships
when the vocabulary itself no longer fits an executor — trending-token
dashboards over streaming corpora, frequency features for quality
filters, join-key skew probes before launching a salted join.

All hashing is ``xxhash64`` with per-row seeds — deterministic,
JVM-side, identical on every executor; no Python in the stream path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(token: Column, row_j: int, width: int, seed: str) -> Column:
    """Row ``row_j``'s bucket for a token: xxhash64 of (salted seed, token),
    folded mod width.  pmod keeps the result non-negative."""
    return F.pmod(F.xxhash64(F.lit(f"{seed}:{row_j}"), token), F.lit(width)).cast("int")


def count_min_build(
    stream: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 4096,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch table ``(row_j, bucket, cnt)`` — at most
    ``depth × width`` rows out, regardless of input size.

    Scale shape: each stream element expands into ``depth`` (row, bucket)
    keys and immediately partial-aggregates — the map side collapses any
    partition to ≤ depth×width counter rows before the single exchange, so
    shuffle volume is bounded by cluster width, not data size.  This is the
    canonical "mergeable summary": per-partition sketches add cellwise,
    which is exactly what the partial/final HashAggregate pair computes.

    ``weight_col`` feeds pre-aggregated (token, count) frames: sketches are
    linear, so building from a weighted vocabulary yields bit-identical
    counters to consuming the raw stream.
    """
    tok = F.col(token_col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("bigint")
    keyed = stream.select(
        w.alias("__w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_j"),
                        _bucket(tok, j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    )
    return keyed.groupBy(
        F.col("rb.row_j").alias("row_j"), F.col("rb.bucket").alias("bucket")
    ).agg(F.sum("__w").alias("cnt"))


def count_min_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 4096,
    seed: str = "cms",
) -> DataFrame:
    """Point-estimate each candidate token's frequency from a built sketch:
    ``min`` over the token's ``depth`` counters.  The sketch broadcasts
    (≤ depth×width rows by construction), so estimating any number of
    candidates is a map-side join plus a token-grain aggregate."""
    tok = F.col(token_col)
    cand = candidates.select(
        tok,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_j"),
                        _bucket(tok, j, width, seed).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    )
    joined = cand.join(
        F.broadcast(sketch),
        (F.col("rb.row_j") == sketch.row_j) & (F.col("rb.bucket") == sketch.bucket),
        "left",
    )
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
