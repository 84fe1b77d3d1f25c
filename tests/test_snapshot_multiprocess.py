"""TRUE multi-process concurrent-writer race on the SnapshotTable CAS
(VERDICT r4 item #6): two OS processes, each with its own SparkSession/JVM,
race read-modify-write commits on one table.  The in-process tests
(test_snapshots.py) exercise the protocol's failure branches directly; this
one proves the rename-without-overwrite CAS actually serializes writers
that share nothing but the filesystem — exactly one winner per version,
losers see ConcurrentCommitError and retry from a fresh read, history stays
linear, and no increment is lost."""

from __future__ import annotations

import multiprocessing


def _read_state(t):
    base = t.latest_version()
    cur = t.read(base).collect()[0]["v"]
    return base, cur


def _cas_writer(path: str, rounds: int, barrier, q, tag: int) -> None:
    """Runs in a CHILD process: its own JVM, its own SparkSession."""
    import traceback

    try:
        from european_emissions_data_warehouse_spark.operators.snapshots import (
            ConcurrentCommitError,
            SnapshotTable,
        )
        from european_emissions_data_warehouse_spark.session import get_session

        spark = get_session(
            app_name=f"cas-writer-{tag}",
            master="local[2]",
            shuffle_partitions=2,
            extra_conf={
                "spark.ui.enabled": "false",
                "spark.ui.showConsoleProgress": "false",
                "spark.driver.memory": "2g",
            },
        )
        spark.sparkContext.setLogLevel("FATAL")
        t = SnapshotTable(spark, path)
        wins = retries = 0
        for _ in range(rounds):
            barrier.wait(timeout=600)  # round start: both writers alive
            base, cur = _read_state(t)
            # both writers have now read the SAME base — the coming commits
            # target the same version, so a CAS collision is guaranteed
            barrier.wait(timeout=600)
            while True:
                df = spark.createDataFrame([(cur + 1,)], "v bigint")
                try:
                    t.commit(df, meta={"writer": str(tag)}, expected_base=base)
                    wins += 1
                    break
                except ConcurrentCommitError:
                    retries += 1
                    base, cur = _read_state(t)
        spark.stop()
        q.put((tag, wins, retries, None))
    except Exception:  # noqa: BLE001 — surface the child's traceback in the parent
        q.put((tag, -1, -1, traceback.format_exc()))


def test_two_process_cas_race_loses_no_update(spark, tmp_path):
    from european_emissions_data_warehouse_spark.operators.snapshots import SnapshotTable

    path = str(tmp_path / "race_tbl")
    t = SnapshotTable(spark, path)
    t.commit(spark.createDataFrame([(0,)], "v bigint"))  # v0: counter=0

    rounds, writers = 3, 2
    ctx = multiprocessing.get_context("spawn")  # never fork a JVM-attached parent
    barrier = ctx.Barrier(writers)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_cas_writer, args=(path, rounds, barrier, q, i))
        for i in range(writers)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=600) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    total_retries = 0
    for tag, wins, retries, err in results:
        assert err is None, f"writer {tag} crashed:\n{err}"
        assert wins == rounds, f"writer {tag} completed {wins}/{rounds} commits"
        total_retries += retries

    n_commits = writers * rounds
    # exactly one winner per version: the history is the contiguous version
    # line (a double-publish of any version is impossible — one manifest
    # file per version — so linear history == one winner each)
    assert t.history() == list(range(n_commits + 1))
    # no lost update: every increment landed exactly once
    assert t.read().collect()[0]["v"] == n_commits
    # the race actually raced: both writers derived from the same base every
    # round (the second barrier sits after the read), so every round forced
    # at least one CAS loser
    assert total_retries >= rounds
    # every commit's writer stamp survived — versions 1..N partition cleanly
    # between the two writers
    stamps = [t.commit_meta(v).get("writer") for v in range(1, n_commits + 1)]
    assert all(s in {"0", "1"} for s in stamps)
