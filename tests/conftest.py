from __future__ import annotations

import os

import pytest

from european_emissions_data_warehouse_spark.session import (
    get_session,
    restore_scoped_confs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Live session stashed at fixture setup so the autouse restore below never
# needs request.getfixturevalue during teardown (deprecated in pytest 8.4+,
# and its blanket except would have silently disabled the restore on a
# future pytest upgrade — ADVICE r8).  None whenever no session is live.
_LIVE_SESSION = None


@pytest.fixture(scope="session")
def spark():
    global _LIVE_SESSION
    session = get_session(
        app_name="eedw-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
    )
    _LIVE_SESSION = session
    yield session
    _LIVE_SESSION = None
    session.stop()


@pytest.fixture(autouse=True)
def _restore_scoped_confs(request):
    """Any test that builds a query with a call-site conf override
    (recursive_ancestry's row-brake ceiling) must not leak it into later
    tests through the session-scoped spark fixture (ADVICE r7) — restore
    after every test, even a failing one.  Reads the module-level holder
    (set by the spark fixture) rather than getfixturevalue: no Spark start
    for pure-Python tests, no deprecated teardown fixture access, and a
    failed session setup simply leaves the holder None."""
    yield
    if _LIVE_SESSION is not None and "spark" in request.fixturenames:
        restore_scoped_confs(_LIVE_SESSION)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
