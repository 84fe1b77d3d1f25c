"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `lukas-judith/european-emissions-data-warehouse`.

The reference is an event-driven AWS ETL pipeline + Postgres warehouse for EEA
greenhouse-gas emission projections (see SURVEY.md).  This package re-expresses
the whole surface Spark-first:

- ``sources``    — explicit-schema readers for the lake (parquet/csv/json).
- ``operators``  — relational + warehouse operators (merge/upsert, surrogate
                   keys, dedup family, similarity search, multimodal plumbing).
- ``functions``  — scalar/vector/text column functions (pure built-ins where
                   possible; Arrow-batched pandas UDFs otherwise).
- ``plans``      — named query plans: the flagship emissions ETL, the parity
                   operator library, the delegated analytical query surface,
                   and the LLM-data-pipeline extensions.
- ``streaming``  — Structured Streaming ingest reproducing the reference's
                   S3-event -> Glue incremental semantics via availableNow.

Everything is DataFrame/Spark-SQL declarative so Catalyst/Tungsten pick the
physical strategy; no RDDs, no custom optimizer rules (SURVEY.md §4.2).
"""

__version__ = "0.1.0"

from european_emissions_data_warehouse_spark.session import get_session  # noqa: F401
