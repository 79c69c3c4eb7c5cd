"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest

from caffeonspark_spark.engine import Config, get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(Config(master="local[8]", shuffle_partitions=8, app_name="cos-tests"))
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
