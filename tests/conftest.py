import os
import shutil
import tempfile

import pytest

from clever_canal_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="ccs-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="ccs-lake-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
