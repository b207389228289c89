from __future__ import annotations

import pytest

from akvorado_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("akvorado_spark_tests", cpus=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
