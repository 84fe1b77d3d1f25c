"""Vector column functions over `array<float>` embeddings.

All JVM-side higher-order functions (`zip_with` + `aggregate`) — no Python
UDFs in the hot path, so the expressions stay inside whole-stage codegen and
scale linearly with partition count.  Computation is promoted to double for
cross-engine numeric stability (DuckDB's list_cosine_similarity on a
FLOAT[] cast to DOUBLE[] matches bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array column (double), floored at 1e-150.

    Every consumer uses this as a DIVISOR (cosine's denominator and the 19
    hoisted ``dot/(_na*_nb)`` forms in operators/similarity.py); under the
    repo's ANSI-on session a zero-norm vector — a null-imputed embedding,
    a zero-padded tail, or the exactly-zero residual of a singleton IVF
    cluster — turned every similarity fan-out into a DIVIDE_BY_ZERO job
    abort (code-review r4, reproduced on 4.1.2).  The floor is far below
    any real norm (embeddings are O(1)), so all non-zero results are
    bit-identical, while a zero vector now scores sim = 0/(1e-150·n) = 0.0
    against everything — ranked last, never crashing.  1e-150, not
    smaller: two floored norms multiply in the hoisted dot/(na·nb) forms,
    and the product must stay a normal double (1e-300 > 0), not underflow
    back to the zero it guards against.

    NULL arrays propagate NULL — greatest() SKIPS nulls, so the bare floor
    turned norm(NULL) into 1e-150, a fabricated near-zero magnitude that
    contradicted embedding_stats_udf's NULL for the same vector
    (code-review r4)."""
    return F.when(
        a.isNotNull(),
        F.greatest(
            F.sqrt(
                F.aggregate(
                    a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
                )
            ),
            F.lit(1e-150),
        ),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double); 0.0 when either
    side is the zero vector (see :func:`norm`)."""
    return dot(a, b) / (norm(a) * norm(b))


def absmax(a: Column) -> Column:
    """Largest absolute component of an array column (double) — the
    per-vector scale basis for symmetric int8 quantization."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
    )


def int8_quant_max_err(a: Column, scale: Column) -> Column:
    """Max absolute reconstruction error of symmetric int8 quantization at
    ``scale`` (q_i = floor(x·scale + 0.5), dequant q_i/scale).  floor(+0.5)
    is explicit round-half-up — identical in every engine, unlike banker's
    rounding builtins.  Max is order-independent, so the fold is exact.

    scale = 0 (the absmax of a zero vector, or 127/absmax of one) returns
    NULL instead of aborting: under the repo's ANSI-on session the bare
    q/scale was a DIVIDE_BY_ZERO job abort — the exact failure class norm()
    is hardened against, reachable by any caller that doesn't pre-filter
    amax > 0 (code-review r4)."""
    def err(v):
        x = v.cast("double")
        q = F.floor(x * scale + F.lit(0.5))
        return F.abs(x - q / scale)

    return F.when(
        scale != 0,
        F.aggregate(a, F.lit(0.0), lambda acc, v: F.greatest(acc, err(v))),
    )


def embedding_stats_udf():
    """Arrow-batched pandas UDF: per-vector (norm, mean, absmax) as a struct.

    The engine's vectorized-Python template — the path for numerics the
    built-in HOFs can't express (learned quantizers, model scoring).  Sums
    accumulate sequentially in float64 so results match a C++ engine's
    left-to-right reduction bit-for-bit (numpy's pairwise summation would
    differ in the last ulp and break exact oracle comparison).
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # no type hints: Series -> DataFrame (struct output) is expressed via the
    # default SCALAR eval type, which the hint-inference path doesn't cover
    @pandas_udf("struct<l2_norm double, mean double, absmax double>")
    def stats(vecs):
        out = {"l2_norm": [], "mean": [], "absmax": []}
        for v in vecs:
            if v is None:
                # null embedding -> null stats, matching the HOF path
                # (norm(NULL) is NULL); iterating None aborted the whole
                # job on one null row (code-review r4)
                out["l2_norm"].append(None)
                out["mean"].append(None)
                out["absmax"].append(None)
                continue
            sq = 0.0
            s = 0.0
            m = 0.0
            for x in v:
                x = float(x)
                sq += x * x
                s += x
                if abs(x) > m:
                    m = abs(x)
            n = len(v)
            out["l2_norm"].append(sq ** 0.5)
            out["mean"].append(s / n if n else 0.0)
            out["absmax"].append(m)
        return pd.DataFrame(out)

    return stats
