from __future__ import annotations

import pytest

from kgflow.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgflow-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
