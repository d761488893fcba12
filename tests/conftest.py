import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-build lifecycle tests (~1 min each)")


@pytest.fixture(scope="session")
def spark():
    from searchengines_spark.session import get_spark

    s = get_spark("tests", cores=int(os.environ.get("TEST_CORES", "8")), shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_index(spark, tmp_path_factory):
    """Build a small deterministic index once per test session."""
    from searchengines_spark.corpus import generate_pages
    from searchengines_spark.index import build_index, IndexReader

    d = str(tmp_path_factory.mktemp("idx"))
    pages = generate_pages(spark, 300, seed=42, partitions=4)
    build_index(spark, pages, d, n_salts=4)
    return IndexReader(spark, d)
