import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from fetcho_spark.session import get_spark
    s = get_spark("fetcho-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_catalog(spark):
    from fetcho_spark.catalog import Catalog
    d = tempfile.mkdtemp(prefix="fscat-")
    yield Catalog(spark, d)
    shutil.rmtree(d, ignore_errors=True)
