from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tapes_spark.fixtures import write_transcripts  # noqa: E402
from tapes_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tapes-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("fixtures") / "transcripts.parquet")
    write_transcripts(path, n_convs=8, median_turns=12, seed=42)
    return path


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)
