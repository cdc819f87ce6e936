from __future__ import annotations

import pytest

from keepright_spark.datagen import ensure_dataset
from keepright_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("keepright_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_dir():
    return ensure_dataset("t")


@pytest.fixture(scope="session")
def small_dir():
    return ensure_dataset("s")
