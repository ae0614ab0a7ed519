from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def spark():
    from skewer_spark.session import get_spark

    s = get_spark(app_name="skewer-tests", master="local[4]", shuffle_partitions=8, silence_window_warn=True)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts_pdf(sf_dir):
    import pyarrow.parquet as pq

    from skewer_spark.datagen import ensure_transcripts

    return pq.read_table(ensure_transcripts(sf_dir)).to_pandas()


def parse_one(line: str, ingest_us: int = 1_700_000_000_000_000) -> dict:
    """Parse a single line via the batch parser; return a plain dict."""
    from skewer_spark.parsing.syslog import parse_batch

    res = parse_batch(pd.Series([line]), pd.Series([ingest_us]))
    return res.iloc[0].to_dict()
