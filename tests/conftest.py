import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master=f"local[{os.environ.get('SPARK_TEST_CPUS', '4')}]",
        shuffle_partitions=8,
        # the stage-metrics collector (metrics.py) reads the status REST API
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    yield s
    s.stop()
