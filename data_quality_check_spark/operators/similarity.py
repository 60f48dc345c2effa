"""Similarity search over an embedding column (array<float>).

Two paths, per the scale plan:
  * brute_force_topk — exact: broadcast one side as a dense numpy matrix,
    stream the other side through mapInPandas, compute cosine via one BLAS
    matmul per Arrow batch. Correct baseline; O(N·M) — use when one side
    fits in executor memory (the usual "query set vs corpus" shape).
  * lsh_topk — approximate: random-hyperplane LSH buckets both sides, joins
    within buckets only (shuffle keyed on (table, bucket)); multi-probe via
    several independent hash tables. The 100 TB path: shuffle volume is
    O(N·tables), never O(N·M).
  * pairs_above — exact near-duplicate pairs by cosine ≥ threshold via the
    declarative zip_with/aggregate form (JVM-side, Catalyst-visible; used
    by the DuckDB-checked gate query).

All randomness is seeded; hyperplanes are broadcast numpy arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _cosine_col(a, b):
    """Declarative cosine similarity between two array<double> columns —
    sequential fold (same order DuckDB evaluates), so gate hashes match."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def pairs_above(emb: DataFrame, threshold: float = 0.95,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact (id_a, id_b) pairs with cosine ≥ threshold (id_a < id_b)."""
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def pairs_above_fast(emb: DataFrame, threshold: float = 0.95,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact near-duplicate pairs (cosine ≥ threshold, id_a < id_b) via one
    BLAS matmul per Arrow batch against the broadcast corpus matrix —
    the vectorized twin of pairs_above() (same decisions; ~10x faster).
    Use when one side fits in executor memory; at 100 TB scale the corpus
    side is the IVF/LSH-bucketed candidate set, not the full table."""
    spark = emb.sparkSession
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    bc = spark.sparkContext.broadcast((ids[order], (mat / norms)[order]))

    def run(batches):
        corpus_ids, corpus = bc.value
        for p in batches:
            q = np.asarray(p[vec_col].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ corpus.T
            qids = p[id_col].to_numpy()
            hit_q, hit_c = np.nonzero(
                (sims >= threshold) & (qids[:, None] < corpus_ids[None, :]))
            yield pd.DataFrame({
                "id_a": qids[hit_q],
                "id_b": corpus_ids[hit_c],
            })

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema="id_a long, id_b long")


def brute_force_topk(emb: DataFrame, k: int = 1, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for every vector, excluding self.

    The corpus matrix is collected once on the driver (float64, normalized),
    broadcast, and each Arrow batch of queries does ONE matmul against it.
    Ties break on smaller neighbor id (deterministic).
    """
    spark = emb.sparkSession
    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    bc = spark.sparkContext.broadcast((ids[order], mat[order]))

    def topk(batches):
        corpus_ids, corpus = bc.value
        for p in batches:
            q = np.asarray(p[vec_col].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ corpus.T  # [batch, corpus]
            qids = p[id_col].to_numpy()
            self_mask = qids[:, None] == corpus_ids[None, :]
            sims[self_mask] = -np.inf
            # deterministic: sort by (-sim, corpus_id)
            idx = np.lexsort((np.broadcast_to(corpus_ids, sims.shape),
                              -sims), axis=-1)[:, :k]
            rows = {
                id_col: np.repeat(qids, k),
                "neighbor_id": corpus_ids[idx].ravel(),
                "cos": np.take_along_axis(sims, idx, axis=1).ravel(),
                "rank": np.tile(np.arange(1, k + 1), len(qids)),
            }
            yield pd.DataFrame(rows)

    return emb.select(id_col, vec_col).mapInPandas(
        topk, schema=f"{id_col} long, neighbor_id long, cos double, rank int"
    )


def kmeans_np(mat: np.ndarray, k: int, iters: int = 10,
              seed: int = 11) -> np.ndarray:
    """Seeded mini k-means on normalized vectors (driver-side; the coarse
    quantizer for IVF). Deterministic; cosine == dot on normalized input."""
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(emb: DataFrame, k: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding", n_cells: int | None = None,
             nprobe: int = 4, sample: int = 100_000) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer (trained on a driver
    sample, broadcast), every vector posted to its own cell, every QUERY
    probed against its `nprobe` nearest cells, exact cosine re-rank inside.

    100 TB shape: the corpus never moves except keyed by cell id; work is
    quadratic only within (cell × probe) groups; centroids are a tiny
    broadcast. n_cells defaults to ~sqrt(N) (classic IVF sizing).
    """
    spark = emb.sparkSession
    n_total = emb.count()
    if n_cells is None:
        n_cells = max(4, int(np.sqrt(n_total)))
    nprobe = min(nprobe, n_cells)
    pdf = (emb.select(vec_col).limit(sample)).toPandas()
    mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = kmeans_np(mat, n_cells)
    bc = spark.sparkContext.broadcast(cent)

    def post(batches, probes: int):
        c = bc.value
        for p in batches:
            v = np.asarray(p[vec_col].tolist(), dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ c.T
            cells = np.argsort(-sims, axis=1, kind="stable")[:, :probes]
            frames = []
            for j in range(probes):
                frames.append(pd.DataFrame({
                    id_col: p[id_col].to_numpy(),
                    "cell": cells[:, j].astype(np.int64),
                    vec_col: p[vec_col],
                }))
            yield pd.concat(frames, ignore_index=True)

    schema = f"{id_col} long, cell long, probe int, {vec_col} array<float>"
    corpus = emb.select(id_col, vec_col).mapInPandas(
        lambda it: post(it, 1), schema=schema.replace(", probe int", "")) \
        .withColumn("probe", F.lit(0))
    queries = emb.select(id_col, vec_col).mapInPandas(
        lambda it: post(it, nprobe),
        schema=schema.replace(", probe int", "")) \
        .withColumn("probe", F.lit(1))
    posts = corpus.unionByName(queries)

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        """Probed queries × cell members via one matmul per cell."""
        members = pdf[pdf["probe"] == 0]
        probes = pdf[pdf["probe"] == 1]
        if not len(members) or not len(probes):
            return pd.DataFrame({id_col: [], "neighbor_id": [], "cos": []})
        mv = np.asarray(members[vec_col].tolist(), dtype=np.float64)
        qv = np.asarray(probes[vec_col].tolist(), dtype=np.float64)
        mv /= np.linalg.norm(mv, axis=1, keepdims=True)
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        sims = qv @ mv.T
        qids = probes[id_col].to_numpy()
        mids = members[id_col].to_numpy()
        iu, ju = np.nonzero(qids[:, None] != mids[None, :])
        return pd.DataFrame({
            id_col: qids[iu], "neighbor_id": mids[ju], "cos": sims[iu, ju],
        })

    cand = (
        posts.groupBy("cell")
        .applyInPandas(score_cell,
                       schema=f"{id_col} long, neighbor_id long, cos double")
        .groupBy(id_col, "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    from pyspark.sql import Window
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("cos").desc(), F.col("neighbor_id")))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


N_TABLES = 8
TARGET_BUCKET = 64  # expected vectors per bucket → planes = log2(n/target)


def _hyperplanes(dim: int, tables: int = N_TABLES,
                 planes: int = 10) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.standard_normal((tables, planes, dim))


def n_planes_for(n_vectors: int, target_bucket: int = TARGET_BUCKET) -> int:
    """Bucket-granularity schedule: keep expected occupancy ≈ target_bucket,
    so per-bucket work stays constant as the corpus grows (planes scales as
    log2 N — at 10^9 vectors this is 24 planes, still one int64 key)."""
    import math

    if n_vectors <= target_bucket:
        return 2
    return max(2, min(24, int(math.log2(n_vectors / target_bucket)) + 1))


def lsh_topk(emb: DataFrame, k: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding", tables: int = N_TABLES,
             planes: int | None = None) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets × `tables` hash tables;
    candidates = bucket collisions in any table; exact cosine re-rank.

    Scale shape: each row emits `tables` (bucket, id, vec) tuples; the join
    is bucket-equality, so shuffle is linear in N and work is quadratic only
    within buckets (≈ N²/2^planes per table)."""
    dim = len(emb.select(vec_col).head()[0])
    if planes is None:
        planes = n_planes_for(emb.count())
    hp = _hyperplanes(dim, tables, planes)
    bc = emb.sparkSession.sparkContext.broadcast(hp)

    def bucketize(batches):
        pl = bc.value
        for p in batches:
            v = np.asarray(p[vec_col].tolist(), dtype=np.float64)
            out = []
            for t in range(pl.shape[0]):
                bits = (v @ pl[t].T) > 0
                bucket = bits @ (1 << np.arange(pl.shape[1], dtype=np.int64))
                out.append(pd.DataFrame({
                    id_col: p[id_col].to_numpy(),
                    "table": np.int32(t),
                    "bucket": bucket,
                    vec_col: p[vec_col],
                }))
            yield pd.concat(out, ignore_index=True)

    bucketed = emb.select(id_col, vec_col).mapInPandas(
        bucketize,
        schema=f"{id_col} long, table int, bucket long, {vec_col} array<float>",
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        """All-pairs cosine inside one (table, bucket) group via a single
        matmul — vectorized replacement for per-pair expression folds; the
        group is small by construction (TARGET_BUCKET expected)."""
        ids = pdf[id_col].to_numpy()
        v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sims = v @ v.T
        iu, ju = np.nonzero(~np.eye(len(ids), dtype=bool))
        return pd.DataFrame({
            id_col: ids[iu],
            "neighbor_id": ids[ju],
            "cos": sims[iu, ju],
        })

    cand = (
        bucketed.groupBy("table", "bucket")
        .applyInPandas(score_bucket,
                       schema=f"{id_col} long, neighbor_id long, cos double")
        .groupBy(id_col, "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    from pyspark.sql import Window
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("cos").desc(), F.col("neighbor_id")))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
