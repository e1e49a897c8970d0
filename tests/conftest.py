from __future__ import annotations

import pytest

from publicationsretriever_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
