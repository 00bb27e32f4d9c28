from __future__ import annotations

import pytest

from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
