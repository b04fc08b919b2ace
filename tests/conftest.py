"""Shared fixtures: local SparkSession + temp warehouse per test.

Mirrors the reference's temp-SQLite-per-test mixins
(``/root/reference/src/bio2bel/testing.py:31-176``) with a session-scoped
SparkSession (expensive to start) and a function-scoped temp warehouse dir
(cheap isolation).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
# literal-table oracles (e.g. compression_ratio's python-zlib VALUES table)
# must be generated from the SAME corpus the suite compares against
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", TESTDATA)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: scale-stress tests (run with SPARK_GRAFT_SLOW=1; skipped by default)",
    )


@pytest.fixture(scope="session")
def spark():
    from bio2bel_spark.session import get_spark

    spark = get_spark(
        app_name="bio2bel-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    yield spark
    spark.stop()


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    """The driver's TPC-H-ish parquet tables as a name->DataFrame dict."""
    from bio2bel_spark.tables import load_tables

    return load_tables(spark, sf_dir)
