"""Shared fixtures: one local SparkSession per test session.

Mirrors the reference's fixture discipline (one golden descriptor shared by
every test, /root/reference/dynamic-message/tests/dynamic_message_tests.rs:12-19):
one SparkSession, one broadcast model payload, reused everywhere.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
for p in (str(REPO), str(REPO / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("dqcs-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def bc_models(spark):
    from data_quality_check_spark.functions.udfs import broadcast_models

    return broadcast_models(spark)


@pytest.fixture(scope="session")
def models():
    from data_quality_check_spark.models import langid, ngram, quality

    return {"langid": langid.train(), "lm": ngram.train(),
            "quality": quality.train()}


@pytest.fixture(scope="session")
def transcripts_tiny(spark):
    from data_quality_check_spark.sources import transcripts

    return transcripts.load(spark, SF_TINY).cache()
