from __future__ import annotations

import pytest

from dedupe_rust_spark.datagen import pages_dir_for
from dedupe_rust_spark.session import get_spark

TINY_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pages_dir() -> str:
    return pages_dir_for(TINY_SF)
