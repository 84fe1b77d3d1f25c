"""Zero-copy Arrow batch operators (``mapInArrow``).

The Python-path hierarchy in this engine, fastest first:

1. JVM expressions (functions/text.py, vectors.py) — whole-stage codegen,
   no Python at all.  Always the default.
2. ``mapInArrow`` (this module) — RecordBatches flow Spark→Python→Spark
   with no pandas materialization; compute runs in pyarrow.compute's C++
   kernels.  The right lane when a pyarrow kernel exists but no Spark
   expression does, or when pandas' object-dtype conversion would dominate
   (long strings, large binary — exactly this engine's documents).
3. ``pandas_udf`` / ``applyInPandas`` (functions/udafs.py, multimodal.py)
   — per-batch pandas frames; pay the conversion when you need pandas/
   numpy semantics.
4. Row-at-a-time Python UDFs — never used in this repo.

The demonstration kernel here re-implements the corpus token count with
``pyarrow.compute.count_substring`` and is pinned equal to the JVM
expression in tests — the point is the plumbing (schema contract, batch
iteration, column pruning through mapInArrow), measured against the
ground truth the JVM path provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def arrow_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document (doc_id, ws_tokens, n_chars) via pyarrow C++ kernels —
    whitespace-token count computed as count(separator runs) + 1 on
    edge-stripped non-empty text, byte-identical to the JVM NON-EMPTY
    token count (functions/text.ws_token_count).  The quirks that must
    match exactly (code-review r4): Java ``\\s`` is the ASCII class
    [ \\t\\n\\x0B\\f\\r] (RE2's ``\\s`` excludes \\x0B, and neither side
    treats NBSP as whitespace), and since the JVM side filters '' tokens,
    leading/trailing Java-\\s runs contribute NOTHING — so the kernel
    strips the full Java-\\s class at both ends (not just 0x20) before
    counting runs.

    Batches stream through unchanged except for the computed columns: no
    pandas objects, no Python-level row loop; per-batch cost is a handful
    of vectorized kernel calls, so throughput tracks Arrow IPC bandwidth."""
    import pyarrow as pa

    def batches(it):
        import pyarrow.compute as pc

        def col(batch, name):
            # get_field_index returns -1 for a missing column and
            # RecordBatch.column(-1) silently selects the LAST column —
            # a wrong text_col argument computed stats over whatever
            # happened to sit there instead of erroring (code-review r4)
            i = batch.schema.get_field_index(name)
            if i < 0:
                raise KeyError(
                    f"arrow_token_stats: column {name!r} not in batch "
                    f"schema {batch.schema.names}"
                )
            return batch.column(i)

        for batch in it:
            t = col(batch, text_col)
            stripped = pc.replace_substring_regex(
                t,
                pattern="^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$",
                replacement="",
            )
            empty = pc.equal(stripped, pa.scalar(""))
            # collapse each interior Java-\s separator RUN to one space;
            # non-empty tokens = interior runs + 1
            one_space = pc.replace_substring_regex(
                stripped, pattern="[ \t\n\x0b\f\r]+", replacement=" "
            )
            seps = pc.count_substring(one_space, " ")
            tokens = pc.if_else(empty, pa.scalar(0), pc.add(seps, 1))
            yield pa.RecordBatch.from_arrays(
                [
                    col(batch, "doc_id"),
                    pc.cast(tokens, pa.int64()),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                ],
                names=["doc_id", "ws_tokens", "n_chars_text"],
            )

    return docs.mapInArrow(batches, "doc_id long, ws_tokens long, n_chars_text long")
