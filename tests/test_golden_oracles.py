"""Sanity guards for the committed golden oracle parquet
(tests/golden/oracle/*.parquet, produced by tools/make_goldens.py).

The real correctness check is the driver/local oracle gate hash-comparing
the live Spark output against these files; this test only guards the
files themselves against truncation or a missing scale slice, without
paying a Spark startup.
"""

import os

import duckdb
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "oracle")

CASES = {
    # name -> (expected rows per n_pages slice; None = just non-empty)
    "pages_extraction": {200: 200, 2000: 2000, 20000: 20000},
    "pdf_page_explode": {200: None, 2000: None, 20000: None},
    "semantic_search": {200: 10, 2000: 10, 20000: 10},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_has_all_scale_slices(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"missing golden {path}"
    counts = dict(
        duckdb.sql(
            f"SELECT n_pages, count(*) FROM read_parquet('{path}') GROUP BY 1"
        ).fetchall()
    )
    for n_pages, expected in CASES[name].items():
        got = counts.get(n_pages, 0)
        assert got > 0, f"{name}: empty slice n_pages={n_pages}"
        if expected is not None:
            assert got == expected, f"{name} n_pages={n_pages}: {got} != {expected}"


def test_golden_pages_extraction_no_null_hashes():
    path = os.path.join(GOLDEN_DIR, "pages_extraction.parquet")
    nulls = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}') "
        "WHERE content_hash IS NULL AND status = 'ok'"
    ).fetchone()[0]
    assert nulls == 0
