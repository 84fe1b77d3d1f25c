"""Skew-handling operators for hot keys at scale.

AQE's skew-join splitting (on by default in session.py) handles most skew in
sort-merge joins by subdividing oversized partitions at runtime.  These
operators cover the cases AQE does not:

- `salted_join` — explicit salting for shuffle joins where one side has a
  pathological hot key (a single key holding >1 executor-partition of rows).
  The skewed side gets a deterministic salt in [0, n); the other side is
  replicated n times (one copy per salt).  The join key becomes
  (key, salt), spreading each hot key over n tasks.  Replication cost is
  |other| × n — use for moderate `other` sizes; for tiny `other`, broadcast
  already solves skew outright.

- `salted_count_distinct` — exact COUNT(DISTINCT x) per group without a
  single hot reducer per group: stage 1 groups by (key, hash(x) % n) so each
  group's distinct-set is partitioned across n tasks (a value lands in
  exactly one salt bucket — per-bucket distinct counts are disjoint), stage 2
  sums the n partial counts.  Turns one giant shuffle group into n bounded
  ones; exact, unlike approx_count_distinct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated.

    Output equals ``skewed.join(other, key, how)`` exactly; only the
    physical key distribution changes.  The salt derives from the skewed
    row's own key hash plus a per-row component, so it needs no random state
    and stays deterministic within a run.

    ``how`` must preserve the OTHER side's row multiplicity under
    replication: inner/left/semi/anti qualify, but right/full outer would
    emit n_salts null-extended copies of every unmatched ``other`` row
    (code-review r4) — rejected with an error instead of returning wrong
    counts.  For a right/full outer, salt the other frame as the skewed
    side or fall back to AQE skew splitting."""
    if n_salts < 1:
        # validated like `how`: n_salts=-1 made the replicated side EMPTY
        # (explode of a zero-length array) and the join silently returned
        # nothing, violating the exact-equality contract; 0 died later as
        # an ANSI pmod-divide-by-zero (code-review r4)
        raise ValueError(f"salted_join: n_salts must be >= 1, got {n_salts}")
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of the "
            f"replicated side {n_salts}x; use inner/left/semi/anti, or salt "
            "the other frame as the skewed side"
        )
    key = list(key)
    # the helper column must not shadow caller data: withColumn would
    # silently REPLACE an existing __salt and the final drop would delete
    # it from the result, breaking the exact-equality contract
    # (code-review r4)
    for frame, side in ((skewed, "skewed"), (other, "other")):
        if "__salt" in frame.columns:
            raise ValueError(
                f"salted_join: the {side} frame already has a '__salt' "
                "column — rename it first (the helper column would "
                "silently destroy it)"
            )
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in key], F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).cast("int")
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, [*key, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_key: Sequence[str],
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-group distinct count via two-phase salted aggregation.

    Equivalent to ``df.groupBy(*group_key).agg(count_distinct(distinct_col))``
    but no single task ever holds a whole group's distinct set."""
    group_key = list(group_key)
    clash = {"__salt", "__partial"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_count_distinct: input already has {sorted(clash)} — "
            "rename first (helper columns would silently destroy them; "
            "code-review r4)"
        )
    bucketed = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    )
    partial = bucketed.groupBy(*group_key, "__salt").agg(
        F.count_distinct(distinct_col).alias("__partial")
    )
    return partial.groupBy(*group_key).agg(
        F.sum("__partial").alias(f"n_distinct_{distinct_col}")
    )
