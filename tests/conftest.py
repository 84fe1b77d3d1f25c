from __future__ import annotations

import os

import pytest

from european_emissions_data_warehouse_spark.session import (
    get_session,
    restore_scoped_confs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_session(
        app_name="eedw-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
    )
    yield session
    session.stop()


@pytest.fixture(autouse=True)
def _restore_scoped_confs(request):
    """Any test that builds a query with a call-site conf override
    (recursive_ancestry's row-brake ceiling) must not leak it into later
    tests through the session-scoped spark fixture (ADVICE r7) — restore
    after every test, even a failing one.  Touches the session only when
    it already exists: requesting the fixture here would force a Spark
    start for pure-Python tests."""
    yield
    if "spark" in request.fixturenames:
        try:
            session = request.getfixturevalue("spark")
        except Exception:
            # the session fixture itself failed setup — re-raising its
            # cached error here would add a teardown ERROR to every
            # spark-requesting test (code-review r8); there is no session
            # to restore, so nothing to do
            return
        restore_scoped_confs(session)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
