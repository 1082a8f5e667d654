"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: dot product and norms via
``F.zip_with`` + ``F.aggregate`` (JVM-side, codegen'd — no Python).  The
scale path is random-hyperplane LSH: deterministic hyperplanes from a seed,
sign-bit bucket keys computed in one projection, candidates restricted to
the query's bucket (optionally multi-probe by Hamming-1 neighbors), then
exact cosine within candidates only.  At 10^12 rows the bucket join replaces
an O(n) scan per query with an O(n / 2^bits)-ish probe.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(vec_col, query: list[float]):
    """Cosine(vec, constant query) as a Column — pure built-ins."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qnorm = float(np.sqrt(np.dot(query, query))) or 1.0
    dot = _dot(vec_col, q)
    vnorm = F.sqrt(_dot(vec_col, vec_col))
    # zero-norm guard: an all-zero row vector gets similarity 0.0 instead of
    # an ANSI-mode DIVIDE_BY_ZERO that kills the whole query
    return F.coalesce(dot / F.nullif(vnorm * F.lit(qnorm), F.lit(0.0)), F.lit(0.0))


def cosine_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity (the baseline)."""
    return (
        df.select(F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([seed, dim, bits]))
    return rng.standard_normal((bits, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Sign-bit bucket key: bit b = 1 iff dot(vec, plane_b) > 0."""
    key = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        key = key + F.when(_dot(vec_col, p) > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return key


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 6,
    dim: int | None = None,
    seed: int = 42,
    bucket_cap: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join.

    Same-bucket vectors (sign-bit hyperplane key) are candidate pairs; exact
    cosine filters at ``threshold``.  Scale shape: the self-join is per
    bucket (≈ n/2^bits rows each), never all-pairs; buckets larger than
    ``bucket_cap`` emit a min-id star instead of all pairs (O(k) not O(k²) on
    embedding-identical clusters).  Recall note: split near-dups landing in
    different buckets are missed — raise recall by lowering ``bits`` or
    unioning a second seed's buckets."""
    from pyspark.sql.window import Window

    if dim is None:
        first = df.select(F.size(vec_col)).first()
        dim = int(first[0])
    planes = _hyperplanes(dim, bits, seed)
    wb = Window.partitionBy("_bucket")
    b = df.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("_bucket")
    ).withColumn("_rn", F.row_number().over(wb.orderBy(id_col))).withColumn(
        "_cnt", F.count(F.lit(1)).over(wb)
    )
    left, right = b.alias("a"), b.alias("b")
    emit = F.when(F.col("a._cnt") <= F.lit(bucket_cap), F.col("a._rn") < F.col("b._rn")).otherwise(
        (F.col("a._rn") == 1) & (F.col("b._rn") > 1)
    )
    pairs = left.join(right, (F.col("a._bucket") == F.col("b._bucket")) & emit)
    dot = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    na = F.sqrt(_dot(F.col(f"a.{vec_col}"), F.col(f"a.{vec_col}")))
    nb = F.sqrt(_dot(F.col(f"b.{vec_col}"), F.col(f"b.{vec_col}")))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            # zero-norm guard mirrors cosine_similarity (ANSI divide-by-zero)
            F.coalesce(dot / F.nullif(na * nb, F.lit(0.0)), F.lit(0.0)).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd, fixed iterations) on a sample
    — the IVF coarse quantizer.  Unit-normalized float64 centroids; runs
    once on the driver, so only the *assignment* kernel needs cross-process
    bit-stability (see ``ivf_assign_rows``)."""
    X = np.asarray(sample, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.maximum(norms, 1e-12)
    rng = np.random.default_rng(np.random.SeedSequence([seed, k, X.shape[1]]))
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        a = ivf_assign_rows(X, C)
        for j in range(len(C)):
            m = a == j
            if m.any():
                c = X[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C


def ivf_assign_rows(X: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid (cosine) assignment, one gemv per centroid.

    Per-centroid ``X @ c`` keeps each row's score a plain length-d dot whose
    float op order does not depend on the batch's row count — the executor
    kernel (arbitrary Arrow batch sizes) and the sequential oracle recompute
    must produce identical argmax ties."""
    X = np.asarray(X, dtype=np.float64)
    scores = np.empty((len(X), len(centroids)), dtype=np.float64)
    for j, c in enumerate(centroids):
        scores[:, j] = X @ c
    return np.argmax(scores, axis=1)


def _train_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_n: int, seed: int
) -> tuple[np.ndarray, list]:
    """Deterministic seeded distributed training sample: the ``sample_n``
    rows with the smallest ``xxhash64(seed, id)`` — an unbiased uniform draw
    over the whole table (unlike a sorted id prefix, which over-weights
    whatever the id encodes).  ``orderBy(...).limit(n)`` compiles to a
    distributed top-k (TakeOrderedAndProject): no full sort shuffle, and only
    ``sample_n`` rows ever reach the driver.  Returns (matrix, sampled ids);
    the ids persist beside the centroids so the draw is auditable."""
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col)), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    ids = [r[0] for r in rows]
    X = np.asarray([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    return X, ids


def ivf_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_clusters: int = 16, n_probe: int = 4,
    sample_n: int = 512, seed: int = 42,
) -> DataFrame:
    """IVF-flat approximate top-k: spherical-kmeans coarse quantizer →
    probe the ``n_probe`` centroids nearest the query → exact cosine within.

    Scale shape: the cluster id is computable at WRITE time (the same
    assignment kernel inside the encode job) and persisted/partitioned on,
    so the probe becomes a partition-pruned scan of n_probe/n_clusters of
    the data.  Here it is computed inline: one vectorized ``mapInArrow``
    pass (numpy gemv per centroid, no per-row Python), filter, exact cosine.
    Training uses the seeded distributed sample (``_train_sample``)."""
    import pyarrow as _pa

    X, _ids = _train_sample(df, id_col, vec_col, sample_n, seed)
    C = kmeans_centroids(X, n_clusters, seed=seed)
    qv = np.asarray(query, dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    probe = np.argsort(-(C @ qn), kind="stable")[:n_probe]
    probe_set = {int(x) for x in probe}
    id_type = dict(df.dtypes)[id_col]

    def assign(batches):
        for batch in batches:
            ids = batch.column(0)
            emb = batch.column(1)
            if isinstance(emb, _pa.ChunkedArray):
                emb = emb.combine_chunks()
            import pyarrow.compute as pc

            flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
            d = C.shape[1]
            X = flat.reshape(-1, d)
            a = ivf_assign_rows(X, C)
            keep = np.isin(a, list(probe_set))
            idx = _pa.array(np.flatnonzero(keep))
            yield _pa.RecordBatch.from_arrays(
                [pc.take(ids, idx), pc.take(emb, idx)],
                names=[id_col, vec_col],
            )

    cands = df.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col).mapInArrow(
        assign, f"{id_col} {id_type}, {vec_col} array<float>"
    )
    return (
        cands.select(F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def build_ivf_index(
    df: DataFrame, index_dir: str,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_clusters: int = 16, sample_n: int = 512, seed: int = 42,
    num_partitions: int | None = None,
    reuse_centroids: bool = True,
) -> dict:
    """Persist an IVF index THROUGH the engine: assign every vector to its
    nearest centroid, encode the assigned table with ``cluster`` as the sort
    key (so per-block min/max stats + blooms cover the cluster column), and
    store the centroids next to the manifest.  A probe then decodes with
    ``filters=[('cluster','=',c)]`` — block skipping turns the search into a
    partition-pruned scan, the write-time layout the inline ``ivf_topk``
    docstring promises.  Training uses the seeded distributed sample
    (``_train_sample``); the sampled ids persist in the index metadata.  A
    rebuild into an existing index dir reuses the stored centroids
    (``reuse_centroids``) so assignments stay stable across resumes."""
    import json
    import os

    import pyarrow as _pa

    meta_path = os.path.join(index_dir, "_ivf_centroids.json")
    prev = None
    if reuse_centroids and os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
    dim = int(df.select(F.size(vec_col)).first()[0])
    # reuse only when the FULL training recipe matches — same cluster count,
    # dimension, seed, and sample size.  A dim change would scramble
    # reshape(-1, C.shape[1]); a seed/sample change silently kept the old
    # centroids while the metadata claimed the new provenance.
    if (
        prev is not None
        and prev.get("n_clusters") == int(n_clusters)
        and prev.get("dim") == dim
        and prev.get("seed") == seed
        and prev.get("sample_n", len(prev.get("sample_ids", []))) == sample_n
    ):
        C = np.asarray(prev["centroids"], dtype=np.float64)
        sample_ids = prev.get("sample_ids", [])
    else:
        X, sample_ids = _train_sample(df, id_col, vec_col, sample_n, seed)
        C = kmeans_centroids(X, n_clusters, seed=seed)
    id_type = dict(df.dtypes)[id_col]

    def assign(batches):
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(0)
            emb = batch.column(1)
            if isinstance(emb, _pa.ChunkedArray):
                emb = emb.combine_chunks()
            flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
            X = flat.reshape(-1, C.shape[1])
            a = ivf_assign_rows(X, C).astype(np.int32)
            yield _pa.RecordBatch.from_arrays(
                [ids, _pa.array(a), emb], names=[id_col, "cluster", vec_col]
            )

    assigned = df.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col).mapInArrow(
        assign, f"{id_col} {id_type}, cluster int, {vec_col} array<float>"
    )
    from rugo_spark.engine import encode_table

    encode_table(assigned, index_dir, key_col="cluster", num_partitions=num_partitions)
    meta = {"n_clusters": int(n_clusters), "dim": int(C.shape[1]), "seed": seed,
            "sample_n": int(sample_n),
            "centroids": C.tolist(), "sample_ids": list(sample_ids)}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def ivf_search(
    spark, index_dir: str, query: list[float], k: int = 10,
    n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index: nearest ``n_probe`` centroids → pruned
    decodes (per-block min/max + bloom skip on the cluster column) → exact
    cosine top-k within the candidates."""
    import json
    import os
    from functools import reduce

    from rugo_spark.engine import decode_table

    with open(os.path.join(index_dir, "_ivf_centroids.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    probe = np.argsort(-(C @ qn), kind="stable")[:n_probe]
    parts = [
        decode_table(spark, index_dir, filters=[("cluster", "=", int(c))])
        for c in probe
    ]
    cands = reduce(lambda a, b: a.unionAll(b), parts)
    return (
        cands.select(F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def hybrid_ann_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_clusters: int = 32, n_probe: int = 2,
    bits: int = 8, n_tables: int = 4,
    sample_n: int = 512, seed: int = 42,
) -> DataFrame:
    """Hybrid ANN: union of IVF-probe and multi-table hyperplane-LSH
    candidates, exact cosine re-rank within.

    The two candidate generators miss DIFFERENT neighbours (IVF misses
    across cluster boundaries, LSH misses on sign-flip counts), so their
    union lifts recall far beyond either at the same scan budget — measured
    on the isotropic fixture (the worst case for both): recall@20 ≈ 0.8
    scanning ~19% of rows vs ~0.5 for 4-table LSH alone.  One vectorized
    ``mapInArrow`` pass computes both memberships; at scale BOTH keys are
    write-time computable (cluster id + bucket keys persisted/partitioned
    on), so the probe stays a union of pruned scans."""
    import pyarrow as _pa

    X, _ids = _train_sample(df, id_col, vec_col, sample_n, seed)
    C = kmeans_centroids(X, n_clusters, seed=seed)
    qv = np.asarray(query, dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    probe_clusters = np.argsort(-(C @ qn), kind="stable")[:n_probe]
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(len(query), bits, seed + 1000 * t)
        qkey = 0
        for b, plane in enumerate(planes):
            if float(plane @ qv) > 0:
                qkey |= 1 << b
        probe = {qkey} | {qkey ^ (1 << b) for b in range(bits)}
        tables.append((planes, np.asarray(sorted(probe), dtype=np.int64)))
    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        import pyarrow.compute as pc

        weights = 1 << np.arange(bits, dtype=np.int64)
        for batch in batches:
            ids = batch.column(0)
            emb = batch.column(1)
            if isinstance(emb, _pa.ChunkedArray):
                emb = emb.combine_chunks()
            flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
            Xb = flat.reshape(-1, C.shape[1])
            keep = np.isin(ivf_assign_rows(Xb, C), probe_clusters)
            for planes, probe in tables:
                keys = (Xb @ planes.T > 0) @ weights
                keep |= np.isin(keys, probe)
            idx = _pa.array(np.flatnonzero(keep))
            yield _pa.RecordBatch.from_arrays(
                [pc.take(ids, idx), pc.take(emb, idx)], names=[id_col, vec_col]
            )

    cands = df.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col).mapInArrow(
        kernel, f"{id_col} {id_type}, {vec_col} array<float>"
    )
    return (
        cands.select(F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def ann_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    bits: int = 8, seed: int = 42, multiprobe: bool = True,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket probe + exact cosine within.

    ``n_tables`` independent hash tables (per-table seeds) are probed and
    their candidate sets unioned — the standard LSH recall lever; with one
    table, sign-bit LSH misses neighbours that differ in ≥2 hyperplane signs.
    ``multiprobe`` additionally probes all Hamming-distance-1 buckets per
    table.  Measured on isotropic random vectors (LSH's worst case — real
    embedding corpora are clustered and do far better): bits=8, 4 tables →
    recall@20 ≈ 0.5 scanning ~15% of rows.  The bucket columns are
    computable at write time and persisted/partitioned on at scale, making
    the probe a partition-pruned scan.
    """
    qv = np.asarray(query, dtype=np.float64)
    cond = None
    bucketed = df
    for t in range(n_tables):
        planes = _hyperplanes(len(query), bits, seed + 1000 * t)
        qkey = 0
        for b, plane in enumerate(planes):
            if float(plane @ qv) > 0:
                qkey |= 1 << b
        probe = {qkey} | ({qkey ^ (1 << b) for b in range(bits)} if multiprobe else set())
        col = f"_bucket_{t}"
        bucketed = bucketed.withColumn(col, lsh_bucket(F.col(vec_col), planes))
        this = F.col(col).isin([int(x) for x in probe])
        cond = this if cond is None else (cond | this)
    cands = bucketed.filter(cond)
    return (
        cands.select(F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )
