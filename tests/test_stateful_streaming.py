"""applyInPandasWithState rate limiter: cumulative state across
micro-batches + the 2h purge."""

import os
import shutil
from datetime import datetime, timedelta

import pytest


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "src": str(tmp_path / "src"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }
    os.makedirs(d["src"])
    yield d
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write(spark, src, rows, name):
    """File streams don't recurse into subdirs: write to a scratch dir and
    move the part files into the watched dir as flat files."""
    df = spark.createDataFrame(rows, "client_id string, ts timestamp, endpoint string")
    scratch = os.path.join(src, "..", f"_scratch_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    for i, f in enumerate(sorted(os.listdir(scratch))):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(scratch, f), os.path.join(src, f"{name}-{i}.parquet"))
    shutil.rmtree(scratch, ignore_errors=True)


def test_cumulative_state_and_purge(spark, dirs):
    from medical_vector_database_ocr_ner_spark.streaming.stateful import (
        current_counts, run_stateful_rate_limit,
    )

    base = datetime(2024, 1, 1, 12, 0, 0)
    # batch 1: 40 requests from 'hot' inside one minute
    _write(spark, dirs["src"],
           [("hot", base + timedelta(seconds=i % 50), "s") for i in range(40)],
           "b1")
    q = run_stateful_rate_limit(spark, dirs["src"], dirs["ckpt"], dirs["out"])
    q.awaitTermination(120)
    got1 = {(r["client_id"], str(r["minute"])): r
            for r in current_counts(spark, dirs["out"]).collect()}
    k = ("hot", "2024-01-01 12:00:00")
    assert got1[k]["n_requests"] == 40 and not got1[k]["over_limit"]

    # batch 2: 30 MORE requests in the SAME minute → cumulative 70 > 60
    _write(spark, dirs["src"],
           [("hot", base + timedelta(seconds=i % 50), "s") for i in range(30)],
           "b2")
    q2 = run_stateful_rate_limit(spark, dirs["src"], dirs["ckpt"], dirs["out"])
    q2.awaitTermination(120)
    got2 = {(r["client_id"], str(r["minute"])): r
            for r in current_counts(spark, dirs["out"]).collect()}
    assert got2[k]["n_requests"] == 70 and got2[k]["over_limit"]

    # batch 3: activity 3 hours later purges the 12:00 state entry (the
    # reference's 2h cleanup); a straggler event for the purged minute is
    # DISCARDED (late data beyond state retention — watermark semantics),
    # so the log's last word on 12:00 stays 70 and 15:00 starts at 1
    late = base + timedelta(hours=3)
    _write(spark, dirs["src"],
           [("hot", late, "s")] + [("hot", base + timedelta(seconds=1), "s")],
           "b3")
    q3 = run_stateful_rate_limit(spark, dirs["src"], dirs["ckpt"], dirs["out"])
    q3.awaitTermination(120)
    got3 = {(r["client_id"], str(r["minute"])): r
            for r in current_counts(spark, dirs["out"]).collect()}
    assert got3[k]["n_requests"] == 70  # late 12:00 event not counted
    assert got3[("hot", "2024-01-01 15:00:00")]["n_requests"] == 1


def test_independent_clients(spark, dirs):
    from medical_vector_database_ocr_ner_spark.streaming.stateful import (
        current_counts, run_stateful_rate_limit,
    )

    base = datetime(2024, 1, 1, 9, 0, 0)
    rows = [("a", base, "s")] * 65 + [("b", base, "s")] * 5
    _write(spark, dirs["src"], rows, "b1")
    q = run_stateful_rate_limit(spark, dirs["src"], dirs["ckpt"], dirs["out"])
    q.awaitTermination(120)
    got = {r["client_id"]: r for r in current_counts(spark, dirs["out"]).collect()}
    assert got["a"]["n_requests"] == 65 and got["a"]["over_limit"]
    assert got["b"]["n_requests"] == 5 and not got["b"]["over_limit"]
