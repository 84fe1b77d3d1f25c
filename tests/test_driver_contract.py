"""Guards on the driver-contract shape itself: the grading window must
stay exactly 50 entries, lead the registration order, contain every query
that lacks a driver CORRECTNESS row from earlier rounds, and every
registered query must carry an oracle.  A silent dict-reordering or a
forgotten window insert would otherwise cost a round of grading."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry_mod

_REPO = os.path.dirname(os.path.abspath(entry_mod.__file__))


def _graded_names() -> set[str]:
    """Names holding a GREEN driver row (rows+schema+hash all matched).
    Red rows do NOT count as graded: a query that failed in round N and
    was then rotated out of the window would otherwise satisfy this guard
    forever without ever being re-verified — the r1 reds (json_extract,
    approx_distinct) only dropped off this set's debt once their r2 rows
    came back green (code-review r4, instruments pass)."""
    out: set[str] = set()
    for fn in sorted(os.listdir(_REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(_REPO, fn)) as f:
                rows = json.load(f)
            out |= {
                name
                for name, r in rows.items()
                if r.get("rows_match") and r.get("schema_match")
                # rows-only checks (no oracle) record hash_match: None —
                # the driver's weaker-but-passing verdict
                and r.get("hash_match") is not False
            }
    return out


def test_window_is_exactly_the_graded_prefix():
    names = list(entry_mod.queries())
    gf = entry_mod._GRADE_FIRST
    assert len(gf) == 50
    assert names[:50] == gf
    assert len(set(gf)) == 50, "duplicate names in the grading window"


def test_every_query_has_an_oracle():
    # one set equality, both directions labeled below — the old third
    # assertion (qs == osql | (qs - osql)) was a tautology that could only
    # fail in the case the next line already covered (code-review r4)
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert not set(osql) - set(qs), "oracle without a query"
    assert not set(qs) - set(osql), "query without an oracle"


def test_no_query_is_left_ungraded_outside_the_window():
    """Every ungraded query must be in the window — or in the explicit,
    documented _DEFER_NEXT_ROUND list (used only when ungraded queries
    outnumber the 50 slots).  Silent deferrals fail."""
    graded = _graded_names()
    names = list(entry_mod.queries())
    debt = [q for q in names if q not in graded and q not in names[:50]]
    deferred = sorted(entry_mod._DEFER_NEXT_ROUND)
    assert sorted(debt) == deferred, (
        f"ungraded queries outside the 50-entry window: {sorted(debt)} "
        f"!= documented deferrals: {deferred}"
    )
    ungraded_total = len([q for q in names if q not in graded])
    assert ungraded_total > 50 or not deferred, (
        "deferrals are only legitimate when ungraded queries exceed the window"
    )


def test_bench_headline_names_all_resolve():
    """bench.py skips unknown names silently (qs.get) — a renamed query
    would quietly vanish from BENCH_r{N}.  Every HEADLINE entry must be a
    registered query."""
    import bench

    qs = set(entry_mod.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench entries not in queries(): {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate bench entries"
