"""Materialize golden oracle parquet for the three UDF-backed queries
(pages_extraction, pdf_page_explode, semantic_search — reference parity
surface: ocr_service/ner_service/vector_service pipeline, golden-tested
since r1; VERDICT r2 item 2 upgrades them from rows-only to hash-checked).

The extraction stand-ins are deterministic pure functions of the payload
bytes, so the Spark output at a given pages-table size n is a constant.
We run each query at every supported scale, tag rows with ``n_pages``,
and write ONE parquet per query under tests/golden/oracle/.  The DuckDB
oracle then selects the slice whose n matches the current sf, inferred
from the ``orders`` view's row count (the only pre-registered table whose
cardinality distinguishes all three sfs: 1500/15000/150000).

Usage: python tools/make_goldens.py
Rerun whenever the extraction/embedding stand-ins change behavior.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

GOLDEN_DIR = "tests/golden/oracle"
SFS = {"0.001": 200, "0.01": 2000, "0.1": 20000}
QUERY_NAMES = ["pages_extraction", "pdf_page_explode", "semantic_search"]

_SPARK_TO_PA = {
    "string": pa.string(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
}


def _pa_schema(sdf, extra: list[tuple[str, pa.DataType]]) -> pa.Schema:
    fields = []
    for f in sdf.schema.fields:
        s = f.dataType.simpleString()
        if s not in _SPARK_TO_PA:
            raise SystemExit(f"unmapped spark type {s} for column {f.name}")
        fields.append(pa.field(f.name, _SPARK_TO_PA[s]))
    return pa.schema(fields + [pa.field(n, t) for n, t in extra])


def main() -> None:
    from medical_vector_database_ocr_ner_spark.plans.queries import QUERIES
    from medical_vector_database_ocr_ner_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    for name in QUERY_NAMES:
        fn = QUERIES[name].fn
        batches: list[pa.Table] = []
        schema = None
        for sf, n_pages in SFS.items():
            sdf = fn(spark, f"/root/testdata/sf{sf}")
            if schema is None:
                schema = _pa_schema(sdf, [("n_pages", pa.int64())])
            rows = sdf.collect()
            cols = {
                f.name: [r[f.name] for r in rows] for f in sdf.schema.fields
            }
            cols["n_pages"] = [n_pages] * len(rows)
            batches.append(pa.table(cols, schema=schema))
            print(f"{name} sf{sf}: {len(rows)} rows")
        table = pa.concat_tables(batches)
        out = f"{GOLDEN_DIR}/{name}.parquet"
        pq.write_table(table, out, compression="zstd")
        print(f"wrote {out}: {table.num_rows} rows, "
              f"{os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
