"""Similarity search over embedding columns (SURVEY §2.2 B-XI L3/L6).

Three tiers, correct-first then scale:

- ``cosine_topk``: brute force for ONE query vector, pure column
  expressions (functions.vectors) + TakeOrderedAndProject. Baseline/oracle.
- ``cosine_topk_many``: brute force for a SET of query vectors. The query
  matrix broadcasts to every partition; each partition computes a local
  top-k per query with one numpy matmul (Arrow-batched mapInPandas), then a
  single small shuffle merges per-partition winners. Communication is
  O(partitions × queries × k), independent of corpus size — the shape that
  survives 100 TB.
- ``ivf_index`` / ``ivf_topk``: IVF coarse quantization — k-means
  centroids from a driver-side sample, broadcast; every vector is assigned
  to its nearest centroid (one pass); queries probe the ``nprobe`` nearest
  lists only, cutting scanned volume by ~nlist/nprobe.
- ``cosine_self_join``: near-dup pairs above a threshold via random
  hyperplane (SimHash-for-vectors) bucketing + in-bucket exact cosine.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from cdc_init_spark.functions.parallelism import widen, widen_by
from cdc_init_spark.functions.vectors import cosine_similarity


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query brute force: JVM-side dot/norm expressions, no Python.
    orderBy().limit(k) compiles to per-partition top-k + driver merge."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("score"),
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def cosine_topk_many(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Batched multi-query top-k. queries must be broadcast-sized
    (≤ ~1M × dim floats); the corpus side streams through numpy matmuls.

    Output: (query_id, vec_id, score) — k rows per query."""
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    qunit = qmat / qnorm[:, None]
    sc = df.sparkSession.sparkContext
    bq = sc.broadcast((qids, qunit))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qunit_ = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ qunit_.T  # (rows, queries)
            top = min(k, sims.shape[0])
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]  # (top, queries)
            res = []
            for qi in range(sims.shape[1]):
                rows = idx[:, qi]
                res.append(
                    pd.DataFrame(
                        {
                            "query_id": qids_[qi],
                            id_col: ids[rows],
                            "score": sims[rows, qi],
                        }
                    )
                )
            yield pd.concat(res, ignore_index=True)

    partial = widen(df.select(id_col, vec_col)).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# --- IVF (inverted-file) coarse quantization ------------------------------

def train_centroids(
    df: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    sample_size: int = 20000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side k-means on a bounded sample (Lloyd's, numpy). The
    sample is the only thing collected; nlist × dim floats broadcast back."""
    n = df.count()
    frac = min(1.0, sample_size / max(n, 1))
    sample = df.select(vec_col).sample(fraction=frac, seed=seed).collect()
    x = np.array([r[0] for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def assign_lists(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a `list_id` column: nearest centroid per vector (one numpy
    pass per Arrow batch; centroids ride the closure broadcast)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    schema = StructType(
        list(df.schema.fields) + [StructField("list_id", LongType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf.copy()
            pdf["list_id"] = d.argmin(axis=1).astype(np.int64)
            yield pdf

    return widen(df).mapInPandas(assign, schema)


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest inverted lists, brute-force within.
    The list_id filter prunes partitions/row-groups when `indexed` is
    written partitioned by list_id (the deployment layout)."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]
    return cosine_topk(
        indexed.filter(F.col("list_id").isin(probe)),
        query_vec,
        k,
        id_col,
        vec_col,
    )


# --- similarity self-join (near-dup pairs) --------------------------------

def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 16,
    n_tables: int = 4,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of n_planes dot products →
    bucket, repeated for n_tables independent tables. Collision prob for
    cosine θ is (1-θ/π)^n_planes per table.

    One Arrow batch → one numpy matmul against all tables' planes at once
    (expression-level dot products are interpreted per element — ~50×
    slower); output is the small (id, table, bucket) blocking relation."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    bc = df.sparkSession.sparkContext.broadcast(planes)
    powers = (2 ** np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("table_id", LongType()),
            StructField("bucket", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ pl.T) >= 0  # (rows, tables*planes)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * powers[None, None, :]).sum(axis=2)  # (rows, tables)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "table_id": np.tile(
                        np.arange(n_tables, dtype=np.int64), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return widen(df.select(id_col, vec_col)).mapInPandas(run, schema)


def cosine_self_join(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup vector pairs (a < b, cosine ≥ threshold): hyperplane-LSH
    blocking, then per-bucket exact verification — the blocked
    alternative to a quadratic cross join.

    Verification shape matters: attaching both vectors to every candidate
    pair and evaluating a per-pair cosine expression re-fetches each
    vector O(bucket_size) times and runs interpreted HOF folds in the hot
    path. Instead the vectors ride WITH the bucket rows (one equi join),
    and each (table, bucket) group computes its full pairwise cosine
    block as a single normalized matmul in Arrow/numpy — each vector
    shuffles exactly n_tables times, and per-bucket work is one BLAS
    call. Duplicate pairs across tables collapse in a final grouped max
    (scores are identical; max is just the deterministic pick)."""
    bk = hyperplane_buckets(df, n_planes, n_tables, None, vec_col, id_col)
    with_vec = bk.join(df.select(id_col, vec_col), id_col)

    out_schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                {"a": np.int64, "b": np.int64, "score": np.float64}
            )
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        ai, bi = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "a": np.minimum(ai, bi),
                "b": np.maximum(ai, bi),
                "score": sims[iu[keep], ju[keep]],
            }
        )

    pairs = widen_by(with_vec, "table_id", "bucket").groupBy("table_id", "bucket").applyInPandas(
        bucket_pairs, out_schema
    )
    return pairs.groupBy("a", "b").agg(F.max("score").alias("score"))


def quantized_cosine_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query brute-force top-k over int8-quantized codes — the
    reduced-precision scale path of ``cosine_topk``. Each vector is
    quantized symmetrically (functions.vectors.quantize_int8); the
    per-vector scale cancels in the cosine ratio, so scoring needs no
    dequantization, and the integer dot products make the score exactly
    reproducible across engines/partitionings (no float-sum order).

    At 100 TB the corpus is quantized ONCE at ingest (¼ the bytes of
    FLOAT to scan/cache/shuffle) and every query runs over the codes;
    here the quantize happens inline for self-containedness. Same
    physical shape as ``cosine_topk``: broadcast query codes, narrow
    scoring map, TakeOrderedAndProject."""
    from cdc_init_spark.functions.vectors import (
        cosine_similarity_int8,
        quantize_int8,
    )

    codes = df.select(
        F.col(id_col), quantize_int8(F.col(vec_col)).alias("_q")
    )
    qcodes = F.broadcast(
        codes.filter(F.col(id_col) == query_vec_id).select(
            F.col("_q").alias("_qq")
        )
    )
    return (
        codes.filter(F.col(id_col) != query_vec_id)
        .crossJoin(qcodes)
        .select(
            id_col,
            cosine_similarity_int8(F.col("_q"), F.col("_qq")).alias("score"),
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 20000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011):
    split the vector into ``m`` contiguous subspaces and run an
    independent k-means (``k_codes`` centroids) in each. Returns the
    codebook tensor of shape ``(m, k_codes, dim/m)``.

    Training collects only a BOUNDED deterministic sample — the
    ``sample_size`` vectors with the smallest xxhash64(id), a single
    TakeOrderedAndProject job (same discipline as ``train_centroids``
    but seedless/deterministic like ``kmeans_fit_distributed``'s init);
    the full corpus never visits the driver. Per-subspace Lloyd's runs
    in driver numpy over that sample — m codebooks of k·(dim/m) floats,
    kilobytes to broadcast."""
    sample = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    x = np.array([list(r[0]) for r in sample], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_codes, sub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]
        k = min(k_codes, len(xs))
        cent = xs[rng.choice(len(xs), size=k, replace=False)]
        for _ in range(iters):
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if k < k_codes:  # degenerate tiny input: pad with repeats
            cent = np.vstack([cent, np.repeat(cent[:1], k_codes - k, axis=0)])
        books[s] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Replace ``vec_col`` with ``codes`` — the per-subspace nearest
    codebook index, ``m`` small ints per vector. At dim=64 float32 →
    m=4 bytes this is a 64× scan/shuffle compression; at 100 TB the
    corpus is encoded ONCE at ingest and every ANN query runs over the
    codes. One numpy pass per Arrow batch; codebooks ride a broadcast."""
    bc = df.sparkSession.sparkContext.broadcast(codebooks)
    out_fields = [f for f in df.schema.fields if f.name != vec_col]
    schema = StructType(out_fields + [StructField("codes", ArrayType(LongType()))])
    names = [f.name for f in out_fields]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        m, _, sub = books.shape
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int64)
            for s in range(m):
                xs = mat[:, s * sub : (s + 1) * sub]
                d = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d.argmin(axis=1)
            out = pdf[names].copy()
            out["codes"] = list(codes)
            yield out

    return widen(df).mapInPandas(encode, schema)


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query builds an
    ``m × k_codes`` lookup table of exact sub-distances ONCE; each coded
    vector's approximate squared L2 distance is then ``m`` table lookups
    and a sum — no decode, no original vectors touched. Output:
    (id, adc_dist) ascending, ties broken by id.

    Physical shape: broadcast lookup table, one narrow Arrow scoring
    pass over the codes relation, TakeOrderedAndProject(k). Nothing
    proportional to corpus size crosses the network."""
    q = np.asarray(query_vec, dtype=np.float64)
    m, k_codes, sub = codebooks.shape
    table = np.empty((m, k_codes), dtype=np.float64)
    for s in range(m):
        table[s] = ((codebooks[s] - q[None, s * sub : (s + 1) * sub]) ** 2).sum(
            axis=1
        )
    bt = encoded.sparkSession.sparkContext.broadcast(table)

    schema = StructType(
        [StructField(id_col, LongType()), StructField("adc_dist", DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bt.value
        rows = np.arange(t.shape[0])
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            d = t[rows[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "adc_dist": d})

    return (
        widen(encoded.select(id_col, "codes"))
        .mapInPandas(score, schema)
        .orderBy(F.col("adc_dist").asc(), id_col)
        .limit(k)
    )


def pq_topk_rerank(
    encoded: DataFrame,
    vectors: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ pipeline: ADC shortlist (``pq_topk`` with
    ``shortlist`` ≫ k) then EXACT re-rank of just those candidates
    against the raw vectors. The full corpus is only ever touched
    through its m-byte codes; the float vectors are fetched for the
    shortlist alone via a broadcast semi-join (shortlist rows, not
    corpus rows, cross the network). Returns (id, l2_dist) ascending —
    exact distances, PQ only decided WHO got scored."""
    cand = pq_topk(encoded, codebooks, query_vec, k=shortlist, id_col=id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vectors.join(F.broadcast(cand.select(id_col)), id_col)
        .select(
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), q, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("l2_dist"),
        )
        .orderBy(F.col("l2_dist").asc(), id_col)
        .limit(k)
    )


def semdedup_keep(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    method: str = "expr",
    max_cluster: int | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): within each pre-computed cluster, drop every vector
    whose cosine similarity to a LOWER-id cluster member is ≥ threshold;
    the survivors are the min-id "leaders" — no kept pair within a cluster
    is above the threshold.

    The cluster assignment is an input column (in production the output of
    ``train_centroids``/``assign_lists`` k-means; the point of SemDeDup is
    exactly that clustering first makes the pairwise stage tractable).
    Pairwise work is bounded per cluster — but only if the clustering
    keeps cluster SIZE bounded as the corpus grows. The paper's answer
    is k ∝ n (fixed ~50k-vector clusters); a FIXED-k clustering input
    (like a label column) silently turns the per-cluster stage quadratic
    at scale (measured by the 10x scale step: a fixed 10-label input
    grew wall time ~77x at 10x vectors before this screen existed).

    ``max_cluster`` is the opt-in guard for exactly that input: any
    cluster larger than the threshold is split deterministically into
    ``ceil(size / max_cluster)`` sub-clusters by a portable 32-bit md5
    hash of the id (``conv(substring(md5(id), 1, 8), 16, 10) % n_sub``
    — the same engine-portable hash family as the MinHash/feature-hash
    operators) before the pairwise stage — a stand-in for the finer
    upstream k-means the paper prescribes, so within-cluster pairs stay
    ≤ O(size · max_cluster) instead of O(size²). Hashing, not raw
    ``id % n_sub``: strided or sharded id spaces (sampling output with
    ``id % k == 0``, snowflake ids with fixed low bits) share factors
    with small moduli, which would pile most rows into one sub-cluster
    and silently restore the quadratic; the md5 mix is uniform for any
    id distribution and an SQL oracle still replays it exactly. Recall
    trade, same class as the LSH heavy-bucket screens: a duplicate pair
    landing in different sub-clusters is missed — at production scale
    prefer re-clustering with a larger k. The DEFAULT is ``None`` (no
    screen): a legitimately-sized SemDeDup clustering (~50k-vector
    clusters per the paper) must not lose recall silently; callers with
    unbounded/fixed-k cluster inputs opt in (q126 and the 10x scale
    gate pass ``max_cluster=256`` explicitly).

    Scale shape (100 TB): one shuffle on ``cluster_col``; within-cluster
    pairs via self-join with the ``b > a`` triangle predicate; per-vector
    norms computed |rows| (not |pairs|) times before the join. Dominated
    ids come back as a broadcast-size anti-join relation when the
    duplicate rate is modest (AQE picks broadcast automatically); the
    JVM-expression dot/norm path (functions.vectors) keeps scores
    bit-reproducible across engines and partitionings. The sub-cluster
    counts are a cluster-count-sized aggregate broadcast back onto the
    rows (clusters are few by contract; the split column is then free
    arithmetic), and the refined (cluster, sub) key is the shuffle key
    of the pairwise stage in BOTH methods.

    ``method``: ``"expr"`` (default) scores pairs with the JVM
    left-fold expressions — exact, engine-portable, DuckDB-verifiable
    (q126). ``"matmul"`` runs one numpy Gram matrix per cluster inside
    ``applyInPandas`` — the 100 TB path (BLAS instead of ~|pairs|
    interpreted HOF folds; one shuffle on the cluster key, same as
    expr). BLAS reassociates float sums, so scores can differ from the
    fold by ~1 ulp; identical keep-sets unless a pair sits exactly on
    the threshold (tests pin equality on the fixtures)."""
    if method not in ("expr", "matmul"):
        raise ValueError(f"unknown method {method!r} (expr|matmul)")
    work, keys = df, [cluster_col]
    if max_cluster:
        nsub = (
            df.groupBy(cluster_col)
            .agg(F.count(F.lit(1)).alias("_cn"))
            .select(
                cluster_col,
                F.ceil(F.col("_cn") / F.lit(max_cluster)).cast("int").alias("_ns"),
            )
        )
        h32 = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        work = df.join(F.broadcast(nsub), on=cluster_col).withColumn(
            "_sub", F.pmod(h32, F.col("_ns")).cast("int")
        ).drop("_ns")
        keys = [cluster_col, "_sub"]
    if method == "matmul":
        out = _semdedup_keep_matmul(work, keys, id_col, vec_col, threshold)
        return out.drop("_sub") if max_cluster else out
    from cdc_init_spark.functions.vectors import dot, norm

    a = work.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(id_col).alias("_a"),
        F.col(vec_col).alias("_va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = work.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(id_col).alias("_b"),
        F.col(vec_col).alias("_vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    dominated = (
        a.join(b, on=[f"_k{i}" for i in range(len(keys))])
        .filter(F.col("_b") > F.col("_a"))
        .filter(
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
            >= F.lit(float(threshold))
        )
        .select(F.col("_b").alias(id_col))
        .distinct()
    )
    return df.join(dominated, on=id_col, how="left_anti")


def _semdedup_keep_matmul(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """SemDeDup scale path: one normalized Gram matrix per (sub-)cluster.

    Each cluster's vectors sort by id, L2-normalize, and multiply once
    (BLAS); a vector is dominated iff any STRICTLY-UPPER-triangle entry
    in its column is ≥ threshold. Memory per task is O(cluster²) floats
    — the SemDeDup contract is exactly that clusters are sized to make
    this tractable (the paper uses ~50k-vector clusters); the caller's
    ``max_cluster`` screen enforces it when the clustering input
    doesn't (``keys`` then carries the refined (cluster, sub) pair)."""
    import pandas as pd

    out_fields = [f for f in df.schema.fields if f.name != vec_col]
    keep_schema = StructType(out_fields)
    names = [f.name for f in out_fields]

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        g = (v / norms[:, None]) @ (v / norms[:, None]).T
        dominated = (np.triu(g, k=1) >= threshold).any(axis=0)
        return pdf.loc[~dominated, names]

    return widen_by(df, *keys).groupBy(*keys).applyInPandas(keep, keep_schema)


# --- fully distributed Lloyd's k-means ------------------------------------

def kmeans_fit_distributed(
    df: DataFrame,
    k: int = 10,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd's k-means where the DATA never visits the driver — only the
    k×dim centroid matrix does, once per iteration. Contrast with
    ``train_centroids`` (driver numpy on a bounded sample): this is the
    path when even a sample is too big or exact centroids are wanted.

    - Init: the k vectors with the smallest xxhash64(id) — deterministic,
      seedless, and a single TakeOrderedAndProject(k) job.
    - Assign: ``assign_lists`` (Arrow mapInPandas; centroids broadcast).
    - Update: posexplode each vector to (cluster, pos, val) and take
      avg per (cluster, pos) — a partial-aggregated shuffle whose output
      is exactly k·dim rows, independent of |df|. Empty clusters keep
      their previous centroid.

    Per-iteration cost at 100 TB: one scan + one k·dim-group shuffle;
    bounded driver traffic (k·dim doubles)."""
    init = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    cent = np.array([list(r[vec_col]) for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = assign_lists(df.select(vec_col), cent, vec_col)
        upd = (
            assigned.select(
                "list_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        nxt = cent.copy()
        for r in upd:
            nxt[r["list_id"], r["pos"]] = r["m"]
        cent = nxt
    return cent


def kmeans_inertia(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the nearest centroid — one scan, one
    scalar back (the Lloyd's convergence monitor)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(centroids)
    schema = StructType([StructField("d2", DoubleType())])

    def dist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({"d2": d.min(axis=1)})

    return widen(df.select(vec_col)).mapInPandas(dist, schema).agg(
        F.sum("d2")
    ).collect()[0][0]


def pca_fit(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA by the covariance method — the data never visits
    the driver, only sufficient statistics do: each Arrow partition
    emits its local Gram partial Xᵀ X (a d×d matrix — 4096 doubles at
    d=64), sum vector and count; the driver folds the partials,
    forms cov = (G − n·μμᵀ)/(n−1) and eigendecomposes the d×d matrix
    (trivial at embedding dims; this is exact PCA, not an iterative
    sketch). Communication: partitions × d² doubles, independent of
    row count — the classic scalable-PCA factoring.

    Returns (mean, eigenvalues_desc[:k], components[k, d]). Component
    sign is fixed by making each vector's largest-|coordinate| entry
    positive, so results are reproducible run to run."""
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tot_n, tot_s, tot_g = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            tot_n += len(mat)
            s = mat.sum(axis=0)
            g = mat.T @ mat
            tot_s = s if tot_s is None else tot_s + s
            tot_g = g if tot_g is None else tot_g + g
        if tot_n:
            yield pd.DataFrame(
                {"n": [tot_n], "s": [tot_s], "g": [tot_g.ravel()]}
            )

    parts = widen(df.select(vec_col)).mapInPandas(gram, schema).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = len(s)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, vals[order], comps


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project vectors onto fitted components: (x − μ) @ Wᵀ as one
    narrow Arrow pass (μ and the k×d component matrix ride a
    broadcast). Output: (id, pc ARRAY<DOUBLE> length k)."""
    bc = df.sparkSession.sparkContext.broadcast(
        (np.asarray(mean), np.asarray(components))
    )
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(out_col, ArrayType(DoubleType())),
        ]
    )

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu, comps = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (mat - mu[None, :]) @ comps.T
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: list(p)})

    return widen(df.select(id_col, vec_col)).mapInPandas(proj, schema)


def ivfpq_build(
    df: DataFrame,
    nlist: int = 16,
    m: int = 4,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Build the canonical IVF+PQ index (Jégou et al. — the FAISS
    IVFPQ architecture): coarse k-means lists for pruning, product
    quantization of the RESIDUAL (vector − its list centroid) for
    compression. Residual coding is the load-bearing detail: residuals
    concentrate near 0, so the same codebook budget quantizes them far
    more precisely than raw vectors.

    Returns (coded relation (id, list_id, codes), centroids, codebooks).
    The coded relation is the ONLY corpus-sized artifact — one small int
    for the list + m bytes of codes per vector; centroids and codebooks
    are kilobytes. At 100 TB the coded relation is written partitioned
    by list_id so probes prune files (the ivf_topk layout contract)."""
    cent = train_centroids(df, nlist, vec_col=vec_col)
    assigned = assign_lists(df.select(id_col, vec_col), cent, vec_col)
    bc = df.sparkSession.sparkContext.broadcast(cent)

    res_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("list_id", LongType()),
            StructField("residual", ArrayType(DoubleType())),
        ]
    )

    def residuals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            lids = pdf["list_id"].to_numpy()
            r = mat - c[lids]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "list_id": lids,
                    "residual": list(r),
                }
            )

    res = widen(assigned).mapInPandas(residuals, res_schema)
    books = pq_train(res, m=m, k_codes=k_codes, vec_col="residual", id_col=id_col)
    coded = pq_encode(res, books, vec_col="residual")
    return coded, cent, books


def ivfpq_topk(
    coded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF+PQ query: probe the ``nprobe`` nearest lists; within each,
    score by ADC against a PER-LIST lookup table built from the query's
    residual to THAT list's centroid (the residual-coding counterpart
    of ``pq_topk``'s single table). Scanned volume ≈ nprobe/nlist of
    the codes; per row the cost is m table lookups. The probed-list
    filter is a pushable IN predicate (file pruning under the
    partitioned-by-list layout); tables are nprobe × m × k_codes
    doubles, broadcast."""
    q = np.asarray(query_vec, dtype=np.float64)
    mm, k_codes, sub = codebooks.shape
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]
    tables = {}
    for li in probe:
        rq = q - centroids[li]
        t = np.empty((mm, k_codes), dtype=np.float64)
        for s in range(mm):
            t[s] = ((codebooks[s] - rq[None, s * sub : (s + 1) * sub]) ** 2).sum(
                axis=1
            )
        tables[li] = t
    bt = coded.sparkSession.sparkContext.broadcast(tables)

    schema = StructType(
        [StructField(id_col, LongType()), StructField("adc_dist", DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tabs = bt.value
        rows = np.arange(mm)
        for pdf in batches:
            if pdf.empty:
                continue
            out_ids, out_d = [], []
            for li, grp in pdf.groupby("list_id"):
                t = tabs.get(li)
                if t is None:
                    continue
                codes = np.vstack(grp["codes"].to_numpy()).astype(np.int64)
                dd = t[rows[None, :], codes].sum(axis=1)
                out_ids.append(grp[id_col].to_numpy())
                out_d.append(dd)
            if out_ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(out_ids),
                        "adc_dist": np.concatenate(out_d),
                    }
                )

    return (
        coded.filter(F.col("list_id").isin(probe))
        .select(id_col, "list_id", "codes")
        .mapInPandas(score, schema)
        .orderBy(F.col("adc_dist").asc(), id_col)
        .limit(k)
    )
