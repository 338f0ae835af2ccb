import pytest

from dbpedia_spotlight_spark import get_spark
from dbpedia_spotlight_spark.model.fixtures import build_world


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world(spark):
    w = build_world(spark, n_docs=60)
    w.documents.cache().count()
    w.gold.cache().count()
    return w
