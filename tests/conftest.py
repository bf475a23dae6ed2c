import pandas as pd
import pytest

from dataquality_spark import oracle, synth
from dataquality_spark.session import get_spark

N_ROWS = 1200
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dq-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pd() -> pd.DataFrame:
    return synth.gen_pages(N_ROWS, seed=SEED)


@pytest.fixture(scope="session")
def pages_input(pages_pd) -> pd.DataFrame:
    return pages_pd[["url", "warc_ts", "html", "text", "lang"]]


@pytest.fixture(scope="session")
def golden(pages_input) -> pd.DataFrame:
    return oracle.run_oracle(pages_input)


@pytest.fixture(scope="session")
def pages_sdf(spark, pages_input):
    return spark.createDataFrame(pages_input)
