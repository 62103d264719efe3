import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FIXTURE_PAGES = 200
FIXTURE_SEED = 42


@pytest.fixture(scope="session")
def spark():
    from medical_vector_database_ocr_ner_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def pages_parquet():
    from medical_vector_database_ocr_ner_spark.sources.pages import pages_path

    return pages_path(N_FIXTURE_PAGES, FIXTURE_SEED)


@pytest.fixture(scope="session")
def pages_df(spark, pages_parquet):
    return spark.read.parquet(pages_parquet)


@pytest.fixture(scope="session")
def documents_df(spark, pages_df):
    from medical_vector_database_ocr_ner_spark.operators.extraction import (
        extract_documents,
    )

    df = extract_documents(pages_df).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"
