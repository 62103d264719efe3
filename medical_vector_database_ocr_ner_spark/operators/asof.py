"""As-of (time-travel) join — a composition of built-in DataFrame ops.

Spark has no ASOF JOIN primitive; the naive encoding
(``a JOIN b ON key AND b.ts <= a.ts`` + max-per-group) is an inequality
join that degenerates to a per-key cross product — quadratic in events per
key, hopeless at 100 TB. This operator uses the **union-sentinel pattern**
instead: tag both sides, union them, and carry the most recent right-side
row forward with ``last(..., ignorenulls=True)`` over a
``(key, ts)``-ordered running window. Cost: ONE shuffle on the join key
(the window partition), linear work per row, no inequality join, and AQE
skew handling applies to the single exchange.

Semantics match DuckDB's ``ASOF LEFT JOIN ... ON l.key = r.key AND
r.ts <= l.ts`` (most recent right row at-or-before the left timestamp);
verified against that oracle in plans/queries_ext.py::q_asof_last_error.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql.window import Window

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def asof_join(
    left: "DataFrame",
    right: "DataFrame",
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> "DataFrame":
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same ``on`` key (NULLs when none).

    right_cols: right-side payload columns to carry (default: all except
    the key and timestamp). Output = all left columns + ``prefix``-named
    right payload columns.

    Ties: a right row at exactly ``left_ts`` IS visible (<= semantics);
    right rows sort before left probes at equal timestamps. Among right
    rows sharing the same (key, timestamp), the greatest payload tuple
    wins — deterministically, across runs and partitionings.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    # Wrap the right payload in one struct: non-null marks "this is a right
    # row", so last(ignorenulls) skips probes but never skips a right row
    # whose individual payload columns happen to be NULL.
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)

    # _payload as the final sort key is a deterministic tie-break among
    # right rows sharing (key, ts): the greatest payload tuple wins, every
    # run, on every partitioning. (_side still decides right-vs-probe at
    # equal ts first, so probes never sort before the rows they must see.)
    # Maps are not orderable in Spark — if any payload column contains a
    # map, drop the tie-break (ties then resolve arbitrarily for those
    # inputs) instead of failing the whole plan at analysis time.
    payload_orderable = not any(
        "map<" in right.schema[c].dataType.simpleString() for c in right_cols
    )
    order_keys = ["_ts", "_side"] + (["_payload"] if payload_orderable else [])
    w = (
        Window.partitionBy("_k")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)

    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.select(*out_cols)
