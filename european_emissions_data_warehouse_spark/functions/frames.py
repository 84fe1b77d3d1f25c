"""Driver-side literal DataFrames/columns as cheap JVM plans.

Two construction costs killed the naive forms (measured r10, 64x16-double
codebook, this box):

- ``spark.createDataFrame(rows, schema)`` backs the frame with an RDD of
  PICKLED PYTHON ROWS split across defaultParallelism partitions: every
  action whose plan touches the "literal" launches one Python worker task
  per core (32 tasks x ~0.3 s of pure worker wait, ~0 executor CPU, PER
  CONSUMING JOB).
- ``F.array(*[F.struct(*[F.lit(x) ...]) ...])`` builds the value through
  one py4j round trip per scalar — 1.8 s of driver time per codebook —
  and leaves a multi-thousand-node Catalyst tree that every consuming
  query re-analyzes (~80 ms per optimize).

``literal_column`` instead ships ONE string through py4j and parses it on
the JVM: ``from_json(lit(json), dtype)`` — 5 ms to build, constant-folded
to a single Literal by the optimizer (verified: the optimized plan of a
consumer contains neither from_json nor named_struct), ~20 ms per
consuming optimize.  Values round-trip exactly: json.dumps emits Python's
shortest-round-trip repr and Jackson parses it to the nearest double =
the original; integers are parsed as longs (exact at any int64); float32
values widen/narrow exactly.  Non-finite floats are NOT JSON — they fail
loudly here rather than silently becoming NULL.

Intended for CODEBOOK-SIZED data only (centroids, shard offsets, stratum
ids — O(k) rows of scalars/short arrays); a large literal belongs in a
parquet side table, not a query plan.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    StringType,
    StructType,
)


def _jsonable(v, dtype: DataType):
    """``v`` as a JSON-dumpable value matching ``dtype`` (struct rows may
    be tuples/lists aligned with the schema, Row objects, or dicts)."""
    if v is None:
        return None
    if isinstance(dtype, ArrayType):
        return [_jsonable(x, dtype.elementType) for x in v]
    if isinstance(dtype, StructType):
        if isinstance(v, dict):
            get = v.get
        else:
            vals = list(v)
            get = {f.name: vals[i] for i, f in enumerate(dtype.fields)}.get
        return {f.name: _jsonable(get(f.name), f.dataType) for f in dtype.fields}
    if isinstance(dtype, (DoubleType, FloatType)):
        f = float(v)
        if not math.isfinite(f):
            raise ValueError(
                f"literal_column: non-finite value {f!r} is not JSON-"
                "representable — a NaN/Inf here means the upstream codebook "
                "is corrupt, failing loudly instead of silently NULLing it"
            )
        return f
    if isinstance(dtype, BooleanType):
        return bool(v)
    if isinstance(dtype, StringType):
        return str(v)
    return int(v)  # integral types


def literal_column(value, dtype: DataType) -> Column:
    """``value`` as a literal Column of ``dtype`` (array or struct root) —
    one py4j call, constant-folded JVM-side (see module docstring)."""
    return F.from_json(
        F.lit(json.dumps(_jsonable(value, dtype))), dtype
    )


def literal_frame(spark, data: list[tuple], schema: StructType) -> DataFrame:
    """A small DataFrame of driver-side rows as a pure JVM plan:
    range(1) -> explode(folded literal array of structs) -> project."""
    gen = spark.range(1).select(
        F.explode(literal_column(data, ArrayType(schema))).alias("_s")
    )
    return gen.select(*[F.col(f"_s.{f.name}").alias(f.name) for f in schema.fields])
