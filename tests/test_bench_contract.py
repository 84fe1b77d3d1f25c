"""bench.py output contract: the graded artifact must be truncation-proof.

The driver records bench stdout and may keep only a tail of it — round 5's
artifact lost the headline total that way (VERDICT r5 item #2).  bench.py
therefore prints the full JSON line followed by ONE compact summary line
restating the scalars.  This guard runs the real bench in a subprocess (a
tiny SPARK_GRAFT_ONLY subset at sf0.001 so it stays fast) and pins:

- stdout's non-log payload is exactly three JSON lines (full detail,
  per-query mins, compact scalars — the middle line is VERDICT r9 item
  #2: the driver's round-over-round per-query table was empty because
  per-query mins rode only the big line, outside the recorded ~2000-char
  tail);
- all parse; the per-query line and compact line agree with the big one;
- the LAST line (what any tail keeps) carries the total, the failure
  count, and the ann_fixed section — enough to grade the round from a
  truncated artifact alone — and the last TWO lines together stay under
  the ~2000-char tail so the per-query mins survive truncation too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_full_line_plus_truncation_proof_summary():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_ONLY="revenue_filter,topk_orders",
        SPARK_GRAFT_REPEATS="1",
    )
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(payload) == 3, out.stdout[-2000:]
    big, qmin, compact = (json.loads(ln) for ln in payload)

    # the big line keeps the full per-query detail
    assert set(big["queries"]) == {"revenue_filter", "topk_orders"}
    assert big["spread"].keys() == big["queries"].keys()

    # the per-query tail line restates every min exactly (VERDICT r9 #2)
    assert qmin["queries_min"] == big["queries"]
    assert qmin["ann_fixed_min"] == big["ann_fixed"]
    assert qmin["sf"] == big["sf"]
    # the two tail lines must fit the driver's ~2000-char recorded tail at
    # FULL-suite size: 58 queries x ~25 chars ~ 1500 + compact ~300 — the
    # subset run here is far smaller, but pin the formatting stays compact
    # (no spaces) so the full-suite estimate holds
    assert '": ' not in payload[1]

    # the compact tail restates the scalars exactly
    for key in ("metric", "value", "unit", "sf", "repeats"):
        assert compact[key] == big[key], key
    assert compact["n_queries"] == len(big["queries"])
    assert compact["n_failed"] == sum(
        1 for t in big["queries"].values() if t < 0
    ) == 0
    assert compact["ann_fixed"] == big["ann_fixed"]
    # regression-tracker contract: a subset run skips the fixed-size ANN
    # table (nothing to compare round-over-round on a partial run)
    assert compact["ann_fixed"] == {}


def test_ann_isolated_trackers_cover_the_bench_table():
    """tools/ann_isolated.py exists to make the fixed-size ANN tracker
    numbers attributable (VERDICT r7 item #2) — its TRACKERS list must
    stay in lockstep with the trackers bench.py actually times, or a
    tracker added to one protocol silently drops out of the other.  Both
    sides read bench.ANN_TRACKER_NAMES (code-review r8: the first version
    pinned a hardcoded copy here, which a bench-only addition would have
    satisfied while drifting); this asserts the aliasing holds AND that
    every name resolves to a plan in the isolated rig."""
    import importlib.util

    import bench

    spec = importlib.util.spec_from_file_location(
        "ann_isolated", "/root/repo/tools/ann_isolated.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.TRACKERS == bench.ANN_TRACKER_NAMES
    assert len(set(bench.ANN_TRACKER_NAMES)) == len(bench.ANN_TRACKER_NAMES)

    # every tracker must resolve in the isolated rig without a Spark
    # session (operator trackers -> bench builders; query trackers are
    # resolved lazily but their names must be registered queries)
    import __spark_entry__ as entry_mod

    qs = set(entry_mod.queries())
    for name in bench.ANN_TRACKER_NAMES:
        assert hasattr(bench, f"{name}_plan") or name in qs or name == (
            "ivfpq_search"
        ), f"tracker {name} resolves nowhere"

    # the builders the isolated rig imports by attribute name
    assert callable(bench.pq_encode_plan)
    assert callable(bench.ivfpq_build_plan)
    assert callable(bench.mutual_nn_ann_plan)
    assert callable(bench.persist_ivfpq_index)
    assert callable(bench.make_ivfpq_search_plan("/tmp/nonexistent"))


def test_ann_isolated_provenance_gate():
    """bench.py must not embed a stale ANN_ISOLATED.json as current
    (ADVICE r8): unstamped artifacts and unknown shas read as stale; a
    stamp is current only when no tracker-relevant code differs between
    it and the working tree."""
    import os
    import subprocess

    import bench

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    assert bench._ann_isolated_staleness(None) is not None
    assert bench._ann_isolated_staleness("0" * 40) is not None

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=repo, timeout=10,
    ).stdout.strip()
    tree_clean = subprocess.run(
        ["git", "diff", "--quiet", "HEAD", "--",
         "european_emissions_data_warehouse_spark", "bench.py",
         "tools/ann_isolated.py"],
        cwd=repo, capture_output=True, timeout=30,
    ).returncode == 0
    verdict = bench._ann_isolated_staleness(head)
    if tree_clean:
        assert verdict is None, verdict
    else:
        assert verdict is not None


def test_ann_isolated_merge_validation_fails_fast_before_the_sweep():
    """tools/ann_isolated.py must validate --merge-with BEFORE spending
    tens of minutes on isolated runs (code-review r9, second pass): a
    nonexistent path is a loud error (not a silently lower-repeat
    artifact), and a refused merge exits before any child process runs.
    Both invocations finish in seconds only if validation is pre-sweep —
    a single tracker child alone takes >30 s."""
    import os
    import subprocess
    import sys
    import tempfile

    import bench

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    tool = os.path.join(repo, "tools", "ann_isolated.py")

    r = subprocess.run(
        [sys.executable, tool, "--merge-with", "/nonexistent/artifact.json"],
        capture_output=True, text=True, timeout=25, cwd=repo,
    )
    assert r.returncode != 0
    assert "does not exist" in (r.stderr + r.stdout)

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        f.write('{"git_sha": null, "repeats": 3, "trackers": {}}')
        unstamped = f.name
    try:
        r = subprocess.run(
            [sys.executable, tool, "--merge-with", unstamped],
            capture_output=True, text=True, timeout=25, cwd=repo,
        )
        assert r.returncode != 0
        assert "refused" in (r.stderr + r.stdout)
    finally:
        os.unlink(unstamped)
