from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fortisiem_clickhouse_monitor_spark.session import get_spark  # noqa: E402
from fortisiem_clickhouse_monitor_spark.testing import duck_connection  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fcm-tests")
    yield s


@pytest.fixture(scope="session")
def duck_small():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()
