from __future__ import annotations

import numpy as np
import pytest

from eventanalysis_spark.datagen import generate_pages_batch
from eventanalysis_spark.session import get_spark

N_FIXTURE = 3000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g", "spark.sql.warehouse.dir": "/tmp/ea-test-wh"},
    )
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    """Pure-pandas ground truth (the oracle side)."""
    return generate_pages_batch(np.arange(N_FIXTURE))


@pytest.fixture(scope="session")
def pages_path(spark, pages_pdf, tmp_path_factory):
    """The same rows written as parquet once, read as the Spark input —
    identical bytes by the counter-mode RNG construction."""
    p = str(tmp_path_factory.mktemp("data") / "pages.parquet")
    spark.createDataFrame(pages_pdf).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="session")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path)
