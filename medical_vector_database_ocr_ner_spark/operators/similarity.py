"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact dot-product top-k, entirely JVM-side
  (zip_with/aggregate → TakeOrderedAndProject). The correctness baseline.
- ``IvfIndex``: inverted-file ANN — deterministic centroids, one-shuffle
  partition assignment, searches probe only ``nprobe`` partitions. The
  100 TB path: the scan prunes to nprobe/n_centroids of the corpus.

Vectors are assumed unit-normalized (build_embeddings guarantees it), so
dot product == cosine similarity."""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


def dot_lit(vec_col, query_vec: list[float]) -> "Column":
    """JVM-side dot product against a literal vector (double precision)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    emb: "DataFrame", query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> "DataFrame":
    """Exact top-k: distributed TakeOrderedAndProject, no global sort."""
    return (
        emb.select(F.col(id_col), dot_lit(F.col(vec_col), query_vec).alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(k)
    )


def batch_topk(
    emb: "DataFrame", queries: "DataFrame", k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id", query_vec_col: str = "qvec",
) -> "DataFrame":
    """Top-k for a BATCH of query vectors (SURVEY §2.3 J5 batch variant):
    broadcast the (small) query set, score every embeddings partition
    JVM-side against all queries at once, then per-query window rank.

    One pass over the embeddings table regardless of query count — the
    shape that amortizes scan cost when serving many searches; the only
    shuffle is the rank's partitioning on query_id (tiny: n_queries × k
    candidates after per-partition pre-ranking would be the next step at
    10^12 rows; at current scale the window input is fine).

    Ranking uses the similarity rounded to 6 decimals with an id
    tie-break so results are deterministic and engine-portable."""
    from pyspark.sql.window import Window

    scored = emb.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), F.col(query_vec_col),
                    lambda a, b: a.cast("double") * b.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("similarity"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


class IvfIndex:
    """Inverted-file index: deterministic seed centroids (first n vectors
    by id), optionally refined by ``train_iters`` rounds of DataFrame
    Lloyd's k-means; every vector assigned to its best centroid once (one
    argmax column expression), stored partitioned by centroid. Queries
    score only nprobe centroid partitions.

    Training is fully distributed and deterministic: each round is one
    assignment pass (pure column expression — no Python) plus one
    per-(centroid, dimension) mean aggregation; only the k×dim centroid
    matrix ever reaches the driver.

    At 10^12 vectors: assignment is a map-side pass; the search reads
    nprobe/n_centroids of the data — partition pruning does the rest when
    the assignment table is written partitioned by ``centroid_id``."""

    def __init__(
        self, emb: "DataFrame", n_centroids: int = 16,
        vec_col: str = "embedding", id_col: str = "vec_id",
        train_iters: int = 0,
    ) -> None:
        self.vec_col, self.id_col = vec_col, id_col
        self.n_centroids = n_centroids
        self.centroids = [
            (int(i), [float(x) for x in v])
            for i, v in (
                emb.orderBy(id_col).limit(n_centroids)
                .select(id_col, vec_col).collect()
            )
        ]
        for _ in range(train_iters):
            self.centroids = self._lloyd_round(emb)
        self.assigned = self._assign(emb).cache()

    _MEAN_SCALE = 1_000_000  # quantization for order-independent means

    def _lloyd_round(self, emb: "DataFrame") -> list[tuple[int, list[float]]]:
        """One Lloyd's iteration: assign every vector to its best current
        centroid, then recompute each centroid as the per-dimension mean
        of its members (empty clusters keep their old centroid).

        The mean is computed over 1e-6-quantized values as an INTEGER sum:
        integer addition is associative/commutative, so the result is
        bit-identical regardless of partition count or shuffle-fetch order
        — a float avg() would drift in the last bits across runs and break
        the determinism this index guarantees. (Unit-norm components and
        long arithmetic keep the sum far from overflow below ~10^12 rows
        per cluster.)"""
        assigned = self._assign(emb)
        scale = float(self._MEAN_SCALE)
        means = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.col(self.vec_col)).alias("dim", "x"),
            )
            .groupBy("centroid_id", "dim")
            .agg(
                (
                    F.sum(
                        F.round(F.col("x").cast("double") * scale).cast("long")
                    )
                    / (F.count("*") * scale)
                ).alias("m")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(int(r["centroid_id"]), {})[int(r["dim"])] = float(r["m"])
        out = []
        for cid, old in self.centroids:
            dims = by_cid.get(cid)
            if dims:
                out.append((cid, [dims[i] for i in range(len(old))]))
            else:
                out.append((cid, old))
        return out

    def _best_centroid(self, vec_col) -> "Column":
        """argmax over centroid dots as a fold — pure column expression."""
        best = F.struct(F.lit(-1e18).alias("score"), F.lit(-1).alias("cid"))
        for cid, cvec in self.centroids:
            score = dot_lit(vec_col, cvec)
            best = F.when(
                score > best["score"],
                F.struct(score.alias("score"), F.lit(cid).alias("cid")),
            ).otherwise(best)
        return best["cid"]

    def _assign(self, emb: "DataFrame") -> "DataFrame":
        return emb.select(
            self.id_col, self.vec_col,
            self._best_centroid(F.col(self.vec_col)).alias("centroid_id"),
        )

    def search(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> "DataFrame":
        scored_centroids = sorted(
            self.centroids,
            key=lambda c: -sum(a * b for a, b in zip(c[1], query_vec)),
        )
        probe_ids = [cid for cid, _ in scored_centroids[:nprobe]]
        candidates = self.assigned.where(F.col("centroid_id").isin(probe_ids))
        return (
            candidates.select(
                self.id_col,
                dot_lit(F.col(self.vec_col), query_vec).alias("similarity"),
            )
            .orderBy(F.desc("similarity"), F.asc(self.id_col))
            .limit(k)
        )

    def recall_at_k(self, emb: "DataFrame", query_vec: list[float],
                    k: int = 10, nprobe: int = 4) -> float:
        exact = {r[self.id_col] for r in brute_force_topk(
            emb, query_vec, k, self.vec_col, self.id_col).collect()}
        approx = {r[self.id_col] for r in self.search(query_vec, k, nprobe).collect()}
        return len(exact & approx) / max(len(exact), 1)
