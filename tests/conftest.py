import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphsense_datafeed_spark import registry
from graphsense_datafeed_spark.schemas import TABLES
from graphsense_datafeed_spark.session import build_session

# sf0.001 keeps the suite fast for iteration; set PARITY_SF_DIR to
# /root/testdata/sf0.01 to rehearse the exact driver t2 configuration.
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_session("gds-tests", master="local[8]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    registry.load_all_operators()
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
