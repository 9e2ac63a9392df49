from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from cassandra_ttl_remover_spark import get_spark

    s = get_spark("ctrs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events(spark):
    from cassandra_ttl_remover_spark import scan_table

    return scan_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="session")
def documents(spark):
    from cassandra_ttl_remover_spark import scan_table

    return scan_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    from cassandra_ttl_remover_spark import scan_table

    return scan_table(spark, SF_DIR, "embeddings").cache()
