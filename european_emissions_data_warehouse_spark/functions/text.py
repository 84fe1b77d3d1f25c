"""Text-analysis column functions for training-data pipelines
(SURVEY.md §2.3): token counting, quality scoring, language ID,
shingling, fingerprinting.

Everything here is built-in `pyspark.sql.functions` expressions — JVM-side,
whole-stage-codegen, no Python in the row path.  These run at scan speed on
100 TB; the only shuffles belong to whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols —
# the classic GPT-2-style split approximated in one regex (identical RE2/Java
# semantics in Spark and DuckDB for this pattern).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# A tiny multilingual stopword inventory for n-gram-free heuristic language
# ID.  Word-boundary regexes keep it expressible in any engine.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|mit|von|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans|que|pas)\b",
    "es": r"\b(el|los|las|es|una|para|con|por|del|como)\b",
    "zh": r"[一-鿿]",
}


def ws_tokens(text: Column) -> Column:
    """Non-empty whitespace tokens (array<string>).  trim() strips only
    0x20, so a split over text with leading/trailing \\t or \\n keeps
    phantom '' entries — every token budget built on the raw size was
    systematically inflated on scraped/line-based text (ws_token_count of
    'a b\\n' was 3), while every explode-based path filtered '' and
    disagreed with the counter for the same document (code-review r4).
    THE tokenization for counts and shingles; mirrored in the oracles as
    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '').

    Implementation: ``array_remove(split(...), '')`` — a codegen array
    expression, not a lambda HOF (interpreted) and not an extra
    edge-strip regexp pass over the text (the when/otherwise around a
    stripped column evaluated the regex twice); bench-measured fastest of
    the element-identical forms."""
    return F.array_remove(F.split(F.trim(text), r"\s+"), "")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (long) — non-empty tokens only."""
    return F.size(ws_tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish regex token count (long) — a deterministic proxy for LLM
    token budgets.

    ``regexp_count``, not ``size(regexp_extract_all(...))``: both count the
    same non-overlapping matches (and agree on NULL -> NULL), but
    extract_all materialized a per-match string array per row just to take
    its size — pure allocation in the corpus-prep/text-stats hot path
    (optimization r9, guide §1.2 per-task work)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols (double); 0.0
    for empty text — under the repo's ANSI-on session the unguarded
    division turned ONE empty document into a DIVIDE_BY_ZERO job abort
    (code-review r4; guards mirrored in the DuckDB oracles).

    The class is Unicode (``[^\\s\\p{L}\\p{N}]``), not ASCII: the ASCII
    form counted every accented/CJK LETTER as punctuation, so
    quality_score systematically zeroed exactly the non-English documents
    the lang-id markers support (a Chinese doc scored punct_ratio ~1.0;
    code-review r4).  \\p{L}/\\p{N} have identical semantics in Java regex
    and DuckDB's RE2, so the oracles mirror it verbatim.

    Counted as the LENGTH after deleting the keep-class — one regexp pass
    producing one string, where regexp_extract_all allocated a per-match
    array per row in the corpus-prep hot path; single-char matches make
    the two counts identical by construction."""
    n_punct = F.length(F.regexp_replace(text, r"[\s\p{L}\p{N}]", ""))
    return (
        # NULL text propagates NULL — the old otherwise(0.0) routed the
        # null condition to the else branch and scored a null document as
        # perfectly clean, while sibling counters (ws_token_count,
        # quality_score) propagate NULL for the same input: one null
        # policy per module (code-review r4)
        F.when(text.isNull(), F.lit(None).cast("double"))
        .when(F.length(text) > 0, n_punct / F.length(text))
        .otherwise(F.lit(0.0))
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are common English stopwords,
    clamped to [0, 1]; 0.0 for token-less text (same ANSI guard as
    punct_ratio) and NULL for NULL text (same null policy).

    Clamped because the numerator counts \\b-bounded regex hits INSIDE
    tokens while the denominator counts whitespace tokens — 'the-and-of'
    is one token with three hits, and the raw quotient (3.0) escaped into
    text_stats' exported stop_ratio as an impossible probability
    (code-review r4).  quality_score's LEAST(1, ratio*4) is unaffected:
    any ratio >= 0.25 already saturated it."""
    # regexp_count == size(regexp_extract_all(...)) for every input (same
    # non-overlapping match walk, NULL -> NULL) without building the match
    # array (optimization r9)
    hits = F.regexp_count(F.lower(text), F.lit(LANG_MARKERS["en"]))
    ws = ws_token_count(text)
    return (
        F.when(text.isNull(), F.lit(None).cast("double"))
        .when(ws > 0, F.least(F.lit(1.0), hits / ws))
        .otherwise(F.lit(0.0))
    )


def quality_score(text: Column) -> Column:
    """Composite 0..1 quality heuristic: long enough, not punctuation soup,
    some stopword mass — the standard cheap pre-filter before expensive
    dedup/classification stages."""
    length_ok = F.when(F.length(text) >= 100, 1.0).otherwise(F.length(text) / 100.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_ratio(text) - 0.2) * 2)
    )
    stop_ok = F.least(F.lit(1.0), stopword_ratio(text) * 4)
    return (length_ok + punct_ok + stop_ok) / 3


# word -> language lookup derived from LANG_MARKERS (words are disjoint
# across languages); zh is a char class handled separately
_MARKER_WORDS: dict[str, str] = {
    w: lang
    for lang, pat in LANG_MARKERS.items()
    if lang != "zh"
    for w in pat[3:-3].split("|")
}
_COMBINED_MARKER_RE = (
    r"\b(" + "|".join(_MARKER_WORDS) + r")\b|" + LANG_MARKERS["zh"]
)


def marker_hits(text: Column) -> Column:
    """All language-marker hits in one combined regexp pass (array<string>).

    The per-language word inventories are disjoint and boundary-anchored, so
    the union regex finds exactly the same non-overlapping matches as five
    separate per-language passes.  IMPORTANT: materialize this as its own
    column (one projection) before feeding `lang_scores` — the per-language
    filters reference it several times, and interpreted HOF eval re-computes
    inlined children per reference."""
    return F.regexp_extract_all(F.lower(text), F.lit(_COMBINED_MARKER_RE), F.lit(0))


def lang_scores(hits: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (long columns) from a materialized
    `marker_hits` column: in-row set-membership filters over the small hit
    array — 5x less regex CPU than per-language passes, still narrow."""
    by_lang: dict[str, Column] = {}
    for lang in LANG_MARKERS:
        if lang == "zh":
            member = lambda t: t.rlike(LANG_MARKERS["zh"])  # noqa: E731
        else:
            words = [w for w, l in _MARKER_WORDS.items() if l == lang]

            # closure factory, NOT a default arg: a second parameter (even
            # defaulted) makes PySpark emit the (element, index) filter
            # variant.  array_contains over a literal array because
            # Column.isin can't take lambda variables.
            def member_for(ws):
                arr = F.array(*[F.lit(w) for w in ws])
                return lambda t: F.array_contains(arr, t)

            member = member_for(words)
        by_lang[lang] = F.size(F.filter(hits, member)).cast("long")
    return by_lang


def predict_lang(hits: Column) -> Column:
    """Argmax language by marker hits (from a materialized `marker_hits`
    column), 'en' winning ties, 'und' when no marker fires.  Deterministic
    tie-break order: en > de > fr > es > zh."""
    scores = lang_scores(hits)
    best = None
    best_score = None
    for lang in ["en", "de", "fr", "es", "zh"]:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct k-character shingles (array<string>) — the unit for n-gram
    Jaccard and MinHash.  Documents shorter than k yield a single shingle
    (the whole text)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    return F.when(
        # NULL propagates: greatest() SKIPS nulls, so NULL text fell
        # through to n=1 and produced [NULL] — rolling_fingerprint of
        # every null document became the constant [xxhash64(NULL)] and
        # all null-text rows matched each other as exact near-dups
        # (code-review r4)
        text.isNotNull(),
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(text, i, k))
        ),
    )


def word_shingles(text: Column, n: int = 5) -> Column:
    """Distinct n-token (word) shingles (array<string>).  More selective
    than character shingles on small-vocabulary corpora — the preferred
    unit for Jaccard/MinHash dedup of natural-language text.  Built from
    the NON-EMPTY token stream (ws_tokens): phantom ''-tokens from edge
    whitespace changed the shingle set, so two docs identical but for a
    trailing newline failed to match as duplicates (code-review r4)."""
    toks = ws_tokens(text)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.when(  # NULL propagates, same rationale as char_shingles
        text.isNotNull(),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    )


# Conservative PII patterns, identical RE2/Java semantics in Spark and DuckDB.
# PHONE: 7-16 digits joined by AT MOST ONE space/()/- between digits.  The
# old [0-9()\-\s]{7,} span was unbounded and crossed newlines/double
# separators, so unrelated numeric spans ('2020 123\n2021 456\n2022 789')
# merged into ONE <PHONE> and whole numeric tables vanished from the corpus
# before token counting (code-review r4).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9](?:[()\- ]?[0-9]){6,15}"


def clean_text(text: Column) -> Column:
    """Normalization pass for training-data prep: collapse whitespace runs,
    strip control characters, trim.  Pure JVM regexp — scan speed."""
    no_ctrl = F.regexp_replace(text, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", "")
    one_space = F.regexp_replace(no_ctrl, r"\s+", " ")
    return F.trim(one_space)


def mask_pii(text: Column) -> Column:
    """Replace emails/phone-number-shaped spans with typed placeholder
    tokens — the standard pre-training redaction pass."""
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


def rolling_fingerprint(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing-style document fingerprint: the w smallest xxhash64 values
    over the k-shingle set (array<long>, sorted).  Two documents sharing
    most content share most fingerprint entries."""
    hashes = F.transform(char_shingles(text, k), lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(hashes), 1, w)
