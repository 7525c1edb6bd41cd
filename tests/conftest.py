from __future__ import annotations

import pytest

from yadf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 12 cores = 24 runnable threads (JVM tasks + Python workers) on the
    # 32-vcpu sandbox — parallel enough to move the suite, with headroom
    # so host steal does not serialize saturated stages (see bench.py)
    s = get_spark(app_name="yadf-spark-tests", cores=12, driver_memory="8g")
    yield s
    s.stop()
