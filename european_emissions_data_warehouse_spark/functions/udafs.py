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
    """Quantity-weighted average price.  Sequential accumulation keeps the
    per-group result identical to the oracle's SUM(p*q)/SUM(q): cent-precision
    prices times integer quantities are exactly representable doubles, so each
    product is exact and the running sums are order-independent."""
    s = 0.0
    w = 0.0
    for p, q in zip(price, qty):
        s += p * q
        w += q
    return s / w if w else 0.0
