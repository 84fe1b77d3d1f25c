"""Pandas UDAF definitions (custom aggregates over Arrow batches).

NOTE: intentionally NO ``from __future__ import annotations`` in this module
— ``pandas_udf`` infers the GROUPED_AGG eval type from the real
``(pd.Series, ...) -> scalar`` hints, and stringified hints break that
inference (the deprecated ``PandasUDFType.GROUPED_AGG`` constant was the old
workaround; it now emits a deprecation warning).
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted average price, matching the oracle's
    SUM(p*q)/SUM(q) null semantics: pandas ``.sum()`` skips NaN exactly
    like SQL SUM skips NULL, so one null price no longer poisons the whole
    group to NaN (the old per-element Python loop did — and walked every
    row of the group in the interpreter; code-review r4).  Cent-precision
    prices times integer quantities are exactly representable doubles and
    the group sums stay far below 2^53, so every partial sum is exact and
    the vectorized reduction is bit-identical to sequential accumulation.

    Degenerate groups follow SQL, not 0.0 (second code-review r4 pass):
    SUM over only-null products is NULL (``min_count=1`` — bare ``.sum()``
    returns 0.0 there), and NULL/x, x/NULL, and x/0 are all NULL, so a
    group with no weighable rows aggregates to NULL instead of a
    fabricated zero average."""
    s = (price * qty).sum(min_count=1)  # NaN when no non-null product
    w = qty.sum(min_count=1)
    if pd.isna(s) or pd.isna(w) or w == 0:
        return None
    return float(s / w)
