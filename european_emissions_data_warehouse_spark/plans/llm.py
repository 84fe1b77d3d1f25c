"""LLM-data-pipeline extensions (SURVEY.md §2.3) — filled in incrementally.

Dedup family, similarity search, text analysis, multimodal plumbing over the
`documents` / `embeddings` tables.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
