"""A Spark-4 Python DataSource: deterministic synthetic-corpus generation.

The reference ingests fixed CSV drops; a training-data engine also needs
the opposite — unbounded, reproducible test corpora generated *inside* the
cluster (load tests, shuffle-skew rehearsals, CI fixtures) without any
source files.  This connector shows the engine's extensibility surface:
the same `spark.read.format(...)` plumbing every file source uses, but
backed by Python code with

- **range partitioning**: `n_partitions` InputPartitions each own a
  contiguous doc_id range, so generation parallelizes across executors
  and scales to any corpus size with zero driver involvement;
- **filter pushdown** (`pushFilters`): doc_id range predicates and
  lang/source equality are applied inside the generator — a filtered scan
  generates only matching rows instead of generating everything and
  filtering after (the Python-source analogue of parquet row-group
  pruning).  Unsupported filters are handed back for Spark to re-apply,
  so pushdown is always a pure optimization, never a semantics change;
- **determinism**: every cell derives from md5(seed, doc_id) — the same
  (seed, n_docs) options yield bit-identical corpora on any cluster, any
  partition count, any filter.  No RNG state crosses partition borders.

Rows match the lake's `documents` schema (TESTDATA.md), so every corpus
operator (dedup, CMS, BPE, corpus_prep…) runs on generated data
unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

# canonical generation order of _gen_doc's tuple; readers re-project to the
# schema Spark actually binds (see _field_indexes)
_CANON_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")

_LANGS = ["en", "de", "fr", "es"]
_SOURCES = ["web", "wiki", "books"]
_VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
]


def _h(seed: str, doc_id: int, salt: str) -> int:
    """Deterministic 64-bit value for one cell — stateless, so any executor
    generates any doc identically."""
    digest = hashlib.md5(f"{seed}:{doc_id}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _gen_doc(seed: str, doc_id: int) -> tuple[int, str, str, str, int]:
    n_words = 5 + _h(seed, doc_id, "len") % 28
    words = [
        _VOCAB[_h(seed, doc_id, f"w{i}") % len(_VOCAB)] for i in range(n_words)
    ]
    text = " ".join(words)
    lang = _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)]
    source = _SOURCES[_h(seed, doc_id, "src") % len(_SOURCES)]
    return (doc_id, text, lang, source, len(text))


def _field_indexes(field_names) -> tuple[int, ...]:
    """Map the schema Spark binds (user ``.schema(...)`` included) onto the
    generator's canonical tuple order.  Spark binds reader output tuples to
    the *effective* schema POSITIONALLY, so a user schema that reorders
    columns (e.g. ``source`` before ``lang`` — both strings) silently
    swapped values under the old fixed-order emit; unknown columns now fail
    loudly instead of binding garbage (code-review r4)."""
    names = tuple(field_names)
    unknown = [n for n in names if n not in _CANON_FIELDS]
    if unknown:
        raise ValueError(
            f"synthetic_docs has no column(s) {unknown}; available: {list(_CANON_FIELDS)}"
        )
    return tuple(_CANON_FIELDS.index(n) for n in names)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options, field_names=_CANON_FIELDS):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        if self.n_partitions < 1:
            # validated at construction: a 0 reached partitions() as a
            # ZeroDivisionError inside an opaque Py4J plan-time traceback
            # (code-review r4)
            raise ValueError(f"n_partitions must be >= 1, got {self.n_partitions}")
        self.seed = options.get("seed", "synthetic")
        self.lo = 0
        self.hi = self.n_docs  # exclusive
        self.eq: dict[str, str] = {}
        self._idx = _field_indexes(field_names)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Tighten the generation range / add equality prunes; yield back
        whatever this source cannot evaluate."""
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if col == "doc_id" and isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                bound = f.value + 1 if isinstance(f, GreaterThan) else f.value
                self.lo = max(self.lo, int(bound))
            elif col == "doc_id" and isinstance(f, (LessThan, LessThanOrEqual)):
                bound = f.value if isinstance(f, LessThanOrEqual) else f.value - 1
                self.hi = min(self.hi, int(bound) + 1)
            elif (
                col in ("lang", "source")
                and isinstance(f, EqualTo)
                and col not in self.eq
            ):
                # consume only the FIRST equality per column; a second
                # (contradictory) one is handed back for Spark to apply —
                # silently keeping the last would return rows for an
                # impossible predicate
                self.eq[col] = f.value
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi, n = self.lo, max(self.lo, self.hi), self.n_partitions
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        return [
            _RangePartition(s, min(s + span, hi))
            for s in range(lo, hi, span)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        # membership, not truthiness: a consumed EqualTo('lang', '') is a
        # real predicate Spark will NOT re-apply — `.get(...)` being falsy
        # for '' silently returned every row (code-review r4)
        for doc_id in range(partition.start, partition.end):
            row = _gen_doc(self.seed, doc_id)
            if "lang" in self.eq and row[2] != self.eq["lang"]:
                continue
            if "source" in self.eq and row[3] != self.eq["source"]:
                continue
            yield tuple(row[i] for i in self._idx)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch form of the same generator: the offset is just the next
    doc_id, so every batch is a contiguous id range and
    ``readBetweenOffsets`` replays any batch bit-identically after a crash
    (determinism is what makes the source exactly-once end to end — the
    checkpointed offset fully determines the data).  Emits up to
    ``docs_per_batch`` docs per trigger until ``n_docs`` is exhausted,
    then idles (finite-stream drain tests rely on that)."""

    def __init__(self, options, field_names=_CANON_FIELDS):
        self.n_docs = int(options.get("n_docs", 1000))
        self.docs_per_batch = int(options.get("docs_per_batch", 100))
        self.seed = options.get("seed", "synthetic")
        self._idx = _field_indexes(field_names)

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.docs_per_batch, self.n_docs)
        end = {"next": hi}
        # a list-backed iterator: the prefetch wrapper calls next() on it
        # (so a bare list fails) but generators break the runner's pickling
        return (iter(self.readBetweenOffsets(start, end)), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            tuple(row[i] for i in self._idx)
            for doc_id in range(int(start["next"]), int(end["next"]))
            for row in (_gen_doc(self.seed, doc_id),)
        ]


class SyntheticDocsDataSource(DataSource):
    """Register with ``spark.dataSource.register(SyntheticDocsDataSource)``
    and read via ``spark.read.format("synthetic_docs")`` (batch) or
    ``spark.readStream.format("synthetic_docs")`` (micro-batch stream);
    options: n_docs, n_partitions, seed, docs_per_batch."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema) -> SyntheticDocsReader:
        # honor the EFFECTIVE schema (a user .schema(...) overrides ours):
        # Spark binds output tuples positionally, so the reader must emit in
        # the bound order, not the canonical one (code-review r4)
        return SyntheticDocsReader(self.options, [f.name for f in schema.fields])

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options, [f.name for f in schema.fields])
