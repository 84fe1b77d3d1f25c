"""Dataset sampling and splitting operators for training-data pipelines.

A corpus headed for model training needs (a) reproducible train/valid/test
splits that never move a document between splits as the corpus grows, and
(b) stratified downsampling to rebalance skewed strata (e.g. languages).
Neither exists in the reference (its one pipeline is pure ETL,
scripts/etl_process.py:81-93); both are north-star extensions in the spirit
of SURVEY.md §2.3.

Scale notes (100 TB):
- `split_by_hash` is a pure map-side expression — no shuffle, no state, no
  RNG. Membership depends only on the key, so adding documents never
  reassigns existing ones (critical to avoid train/test leakage across
  corpus versions), and any engine can recompute it (the DuckDB oracle runs
  the same arithmetic verbatim).
- `stratified_sample` is Spark's Bernoulli sampleBy: map-side, seeded,
  per-stratum fractions. No driver collect, no global pass.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multiplicative integer hash, Knuth's 2^32 golden-ratio constant. All
# arithmetic stays below 2^62 (ANSI mode would throw on 64-bit overflow):
# the key is folded into [0, 2^30) before the multiply — with an explicit
# pmod, since SQL % follows the dividend's sign and hash-derived keys are
# negative half the time (code-review r4: a bare % handed negative buckets
# to every key below -salt, silently inflating the first split).  The
# bucket uses the product's bits above the bottom 6 (the low bits of a
# multiplicative hash cycle badly for sequential keys): a [0, 2^26) range,
# so the % n_buckets bias is <= ~2^-16 — the previous div 65536 kept only
# 16 bits, a measurable 7:6 bucket skew at modulus 10000.
#
# The salt enters MULTIPLICATIVELY (an odd salt-derived multiplier), not
# just additively: the hash is affine in an additive salt, so two salts
# differ by a near-constant bucket offset and "independent" decisions stay
# lock-stepped (simulated: at fraction 0.001 every stratified-sample
# survivor was a 'train' split row despite distinct salts; code-review r4,
# second pass).  K + 2·salt stays odd, so the multiply remains a bijection
# mod 2^32, and the multiplicative relation between two salts' hashes
# varies per key — measured split of a 0.001 sample: 1590/193/192 vs the
# additive form's 2021/0/0.
_KNUTH = 2654435761
_FOLD = 1 << 30
_MOD32 = 1 << 32
# odd mixer folding the key's high 34 bits into the low 30: small enough
# that |hi|·_MIX + lo stays under 2^51 (ANSI-safe), odd so distinct hi
# values never alias at a stride (see hash_bucket docstring)
_MIX = 48271


def hash_bucket(key_col: str, n_buckets: int = 100, salt: int = 40503) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key — integer
    +,*,%,div only, so the exact expression is portable to any SQL engine
    (the oracles inline the same VALUES; the key is reduced mod 2^30
    BEFORE the salt is added — ``key + salt`` overflowed bigint for keys
    within salt of Long.MAX under ANSI; code-review r4).

    The high bits participate: the key's upper 34 bits are folded into the
    low 30 via an odd-multiplier mix (hi·48271 + lo, all bounded by 2^50,
    ANSI-safe) BEFORE the salt/multiply stages.  A plain ``key % 2^30``
    discarded them entirely, so keys congruent mod 2^30 — notably
    monotonically_increasing_id, whose partition id lives at bit 33 and
    vanishes mod 2^30 — collided deterministically for EVERY salt and
    modulus: row j of every partition drew the same split and the same
    sample keep/drop, a silent structural bias (code-review r4, third
    pass).  For keys below 2^30 (hi = 0) the mix is the identity, so
    existing small-key assignments are unchanged.

    NULL keys raise instead of hashing: a null made every downstream
    comparison NULL, silently routing the row to split_by_hash's LAST
    split (the holdout!) while stratified_sample_hash silently DROPPED it
    — two different silent policies for data with no stable identity."""
    mult = (_KNUTH + 2 * salt) % _MOD32
    lo = f"((({key_col}) % {_FOLD}) + {_FOLD}) % {_FOLD}"
    hi = f"((({key_col}) - ({lo})) div {_FOLD})"  # exact multiple: trunc == floor
    mixed = f"(((({hi}) * {_MIX} + ({lo})) % {_FOLD}) + {_FOLD}) % {_FOLD}"
    folded = f"(({mixed}) + {salt}) % {_FOLD}"
    h = f"(({folded}) * {mult}) % {_MOD32}"
    return F.expr(
        f"CASE WHEN ({key_col}) IS NULL THEN "
        f"CAST(raise_error('hash_bucket: null key in {key_col} — rows "
        f"without a stable identity cannot be deterministically bucketed; "
        f"filter or impute keys first (code-review r4)') AS BIGINT) "
        f"ELSE (({h}) div 64) % {n_buckets} END"
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("valid", 10), ("test", 10)),
    salt: int = 40503,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by hash-bucketing ``key_col``.

    ``splits`` are (name, percent) pairs summing to 100. A row's label is a
    pure function of its key: stable under corpus growth, re-partitioning,
    and engine choice.
    """
    pcts = [p for _, p in splits]
    if sum(pcts) != 100:
        raise ValueError(f"split percents must sum to 100, got {sum(pcts)}")
    bucket = hash_bucket(key_col, 100, salt)
    col = None
    cum = 0
    for name, pct in splits[:-1]:
        cum += pct
        col = F.when(bucket < cum, name) if col is None else col.when(bucket < cum, name)
    last = splits[-1][0]
    col = F.lit(last) if col is None else col.otherwise(last)
    return df.withColumn(out_col, col)


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    modulus: int = 10000,
    salt: int = 52711,
) -> DataFrame:
    """Deterministic stratified downsample: keep a row iff its key-hash
    bucket falls below the stratum's fraction — ``sampleBy`` semantics with
    no RNG.  Membership is a pure function of (key, stratum fraction):
    reproducible cross-engine (the DuckDB oracle runs the identical
    arithmetic), stable under corpus growth, and map-side only (no shuffle,
    no state — the same 100 TB story as ``split_by_hash``).  Strata absent
    from ``fractions`` are dropped (fraction 0).

    The default salt deliberately differs from ``split_by_hash``'s: with a
    SHARED salt and nested moduli (100 | 10000) the sample bucket mod 100
    EQUALS the split bucket, so every document kept at fraction <= 0.008
    was a 'train' row and valid/test samples came out empty (code-review
    r4).  Distinct salts alone were NOT enough — the hash was affine in an
    additive salt, leaving the two decisions offset by a near-constant —
    so ``hash_bucket`` also derives its multiplier from the salt (second
    code-review pass).  Pass distinct salts whenever two hash decisions
    must be independent."""
    frac: Column | None = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        frac = F.when(cond, F.lit(float(f))) if frac is None else frac.when(cond, F.lit(float(f)))
    frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
    return df.filter(hash_bucket(key_col, modulus, salt) < frac * modulus)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Seeded per-stratum Bernoulli sample (``DataFrame.sampleBy``).

    Strata absent from ``fractions`` are dropped (fraction 0) — rebalancing
    and filtering in one pass. Exact row counts are binomial, not exact
    quotas; for hard quotas compose with a per-stratum row_number cap.
    """
    return df.sampleBy(strata_col, dict(fractions), seed)
