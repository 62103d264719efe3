"""Explicit salted join for pathologically skewed keys.

AQE's skew-join splitting handles moderate skew in sort-merge joins, but
it only splits partitions AFTER a full shuffle of the skewed side, and it
cannot help when one key holds a double-digit percentage of all rows (a
viral url's host, a null-ish default key): every row of that key still
lands in memory of the tasks that split it. Salting fixes the layout
before the shuffle:

- big side: add ``salt = pmod(xxhash64(<row-unique cols>), R)`` — the hot
  key's rows spread over R partitions;
- small side: replicate each row R times (``explode(sequence(0, R-1))``);
- equi-join on ``(key, salt)``.

Cost: the small side shuffles R× its size (it is small — that is the
point); the big side shuffles exactly once with no hot partition. Result
is row-identical to the plain join (asserted in
tests/test_operators_ext.py against a skew-free reference join).

This is the join-side sibling of the extraction DAG's salted
``repartition(pmod(xxhash64(url), P))`` (operators/extraction.py) —
same principle: randomize placement BEFORE bytes move.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def salted_join(
    big: "DataFrame",
    small: "DataFrame",
    on: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> "DataFrame":
    """Join a skew-keyed big side against a small side with R-way salting.

    salt_cols: big-side columns whose hash spreads the hot key (default:
    every big-side column — any row-distinguishing subset works; using
    only the join key would defeat the salt).

    how: 'inner' or 'left' only. Right/full joins are rejected: each
    unmatched small-side REPLICA would null-extend into its own output
    row (up to n_salts spurious rows per key), silently breaking the
    row-identity guarantee.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: "
            "replicated small-side rows break right/full semantics"
        )
    salt_src = [F.col(c) for c in (salt_cols or big.columns)]
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int")
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_replicated, [on, "_salt"], how)
    return out.drop("_salt")


def subtract_by_key(small: "DataFrame", big: "DataFrame", on: str) -> "DataFrame":
    """``small`` MINUS (keys present in ``big``) without shuffling the
    big side — the broadcast-anti direction Spark lacks.

    A plain ``small.join(big, on, "left_anti")`` typically shuffles BOTH
    sides on the key (Spark only builds the RIGHT side of a broadcast
    hash anti join, and the right side here is the corpus-sized one).
    Instead probe the big side map-side — ``big ⋉ broadcast(small)``
    yields the matched KEY SET (distinct, so at most |distinct small
    keys| rows even when ``big`` holds duplicate keys — the broadcast
    bound must not depend on the sink's uniqueness invariant) — then
    anti-join ``small`` against that broadcast set. Cost: two broadcasts
    of ≤|small| keys plus one scan of ``big``; only a win while the
    batch side fits the broadcast threshold, which is the intended
    regime. Used by the streaming frontier sink dedup and the
    content-hash embedding upsert, where each micro-batch is tiny and
    the sink is the corpus."""
    matched = (
        big.select(on)
        .join(F.broadcast(small.select(on)), on, "left_semi")
        .distinct()
    )
    return small.join(F.broadcast(matched), on, "left_anti")
