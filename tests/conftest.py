from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from labelspark_spark import get_spark_session

    # warehouse.dir is a static conf — must be set at session build time
    # (tests writing bucketed managed tables need a throwaway warehouse)
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark_session(
        app_name="labelspark-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
