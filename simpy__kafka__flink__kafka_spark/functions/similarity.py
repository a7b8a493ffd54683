"""Similarity search over the ``embeddings`` table (``vec_id BIGINT,
embedding ARRAY<FLOAT>, label INT``).

Scale design (100 TB):

* ``brute_force_topk`` broadcasts the (small) query set and scans the corpus
  once — embarrassingly parallel, no shuffle on the corpus side; the top-k is
  a per-query window over a corpus-partitioned intermediate.  This is the
  correctness baseline.
* ``ivf_topk`` is the scale path: k-means-style cell assignment (here:
  deterministic seed centroids = lowest vec_ids, so the oracle can reproduce
  the partitioning) prunes the scan to ``nprobe`` cells per query.  On a real
  corpus the centroid set comes from ``pyspark.ml.clustering.KMeans``; the
  query plan — broadcast centroids, cell-assign scan, equi-join on cell_id,
  per-query window — is exactly what ships here.

Float determinism contract: embeddings are cast FLOAT -> DOUBLE before any
arithmetic on BOTH engines, dot products are sequential left-to-right folds
in both (Spark ``aggregate``, DuckDB ``list_dot_product`` over DOUBLE[]), and
outputs are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_CENTROIDS = 16
NPROBE = 2


def _dbl(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


def brute_force_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact cosine top-k: queries = the ``n_queries`` lowest vec_ids,
    corpus = everything else.  Output (query_id, vec_id, cos_sim, rank)."""
    from pyspark.sql import Window as W

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).withColumn("qn2", dot(F.col("q_emb"), F.col("q_emb")))
    corpus = emb.where(F.col("vec_id") >= n_queries).withColumn(
        "vn2", dot(F.col("embedding"), F.col("embedding"))
    )
    # norms precomputed per row on each side: the scored stage folds once
    # (the dot product) per (corpus, query) pair instead of three times
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("vn2"))),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ivf_assign(emb: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (deterministic
    argmax: highest similarity, ties to lowest centroid id).
    Output (vec_id, cell_id, cell_sim)."""
    from pyspark.sql import Window as W

    # squared norms precomputed per vector and per centroid: one fold (the
    # dot product) per (vector, centroid) instead of three
    cents = emb.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    ).withColumn("cn2", dot(F.col("c_emb"), F.col("c_emb")))
    scored = (
        emb.withColumn("vn2", dot(F.col("embedding"), F.col("embedding")))
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "cell_id",
            F.round(
                dot(F.col("embedding"), F.col("c_emb"))
                / (F.sqrt(F.col("vn2")) * F.sqrt(F.col("cn2"))),
                6,
            ).alias("cell_sim"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cell_sim").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell_id", "cell_sim")
    )


def ivf_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             n_centroids: int = N_CENTROIDS, nprobe: int = NPROBE) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` nearest cells per query, brute
    force only inside them.  Approximate by construction (recall < 1 when the
    true neighbor lives in an unprobed cell) — that's the documented
    trade-off, identical on the oracle side."""
    from pyspark.sql import Window as W

    assign = ivf_assign(emb, n_centroids)
    cents = emb.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).withColumn("qn2", dot(F.col("q_emb"), F.col("q_emb")))
    qcells = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cell_id",
        "q_emb",
        "qn2",
        cosine(F.col("q_emb"), F.col("c_emb")).alias("qc_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("qc_sim").desc(), F.col("cell_id"))
    probed = qcells.withColumn("rn", F.row_number().over(wq)).where(
        F.col("rn") <= nprobe
    ).select("query_id", "cell_id", "q_emb", "qn2")

    corpus = emb.where(F.col("vec_id") >= n_queries).join(assign, "vec_id") \
        .withColumn("vn2", dot(F.col("embedding"), F.col("embedding")))
    # probe-stage scoring folds once per candidate (norms precomputed above)
    scored = corpus.join(probed, "cell_id").select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("vn2"))),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ml_lsh_neighbors(emb: DataFrame, n_queries: int = 5, k: int = 10,
                     bucket_length: float = 2.0,
                     num_tables: int = 3) -> DataFrame:
    """pyspark.ml-native ANN: BucketedRandomProjectionLSH
    (random-hyperplane bucketing) approxSimilarityJoin between the query set
    and the corpus.  Declared rows-only (the hash tables are
    seed-and-impl-specific, not oracle-reproducible); the expression-level
    IVF/brute-force variants are the hash-checked twins.

    Euclidean-distance based (the ml LSH family's metric); on normalized
    vectors Euclidean ordering == cosine ordering.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window as W

    # array_to_vector is a JVM-side expression (no Python round-trip),
    # unlike a row-at-a-time Vectors.dense UDF.
    with_vec = emb.select(
        "vec_id", array_to_vector(_dbl(F.col("embedding"))).alias("raw")
    )
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(
        with_vec
    ).select("vec_id", "features")

    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=42,
    )
    model = lsh.fit(normed)
    q = normed.where(F.col("vec_id") < n_queries)
    corpus = normed.where(F.col("vec_id") >= n_queries)
    joined = model.approxSimilarityJoin(q, corpus, 2.0, distCol="dist")
    scored = joined.select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("vec_id"),
        F.round("dist", 6).alias("dist"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("dist"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_blocked(emb: DataFrame, threshold: float = 0.92,
                               block_size: int = 1024) -> DataFrame:
    """Scale path for all-pairs near-dup: block-nested-loop with numpy matmul.

    Vectors are packed into per-block matrices (one Arrow row per block);
    block pairs (a.block <= b.block) fan out across the cluster and each task
    does one dense ``A @ B.T`` — the work is O(N²·d) either way, but it runs
    at BLAS speed instead of one interpreted fold per pair, and the shuffle
    moves each block once per block-pair rather than each vector once per
    pair.  At sf0.1 (2000 vectors) this is ~100x faster than the expression
    fold; the fold version remains the oracle-checked correctness form.
    """
    import numpy as np
    import pandas as pd

    pack_schema = ("block long, ids array<long>, mat array<double>")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        # pre-normalize rows so the block product is directly cosine
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.DataFrame(
            [{
                "block": int(pdf["block"].iloc[0]),
                "ids": pdf["vec_id"].tolist(),
                "mat": mat.ravel().tolist(),
            }]
        )

    packed = (
        emb.select("vec_id", "embedding",
                   (F.col("vec_id") / block_size).cast("long").alias("block"))
        .groupBy("block")
        .applyInPandas(_pack, pack_schema)
    )
    a = packed.select(F.col("block").alias("ablock"), F.col("ids").alias("aids"),
                      F.col("mat").alias("amat"))
    b = packed.select(F.col("block").alias("bblock"), F.col("ids").alias("bids"),
                      F.col("mat").alias("bmat"))
    joined = a.join(b, F.col("ablock") <= F.col("bblock"))

    out_schema = "vec_a long, vec_b long, cos_sim double"

    def _sim(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                # dim recovered from the packed payload itself — keeps the
                # build path lazy (no eager .first() scan on the driver)
                dim = len(row.amat) // len(row.aids)
                A = np.asarray(row.amat).reshape(len(row.aids), dim)
                B = np.asarray(row.bmat).reshape(len(row.bids), dim)
                S = np.round(A @ B.T, 6)
                ai = np.asarray(row.aids)
                bi = np.asarray(row.bids)
                ia, ib = np.nonzero(S >= threshold)
                keep = ai[ia] < bi[ib]
                frames.append(pd.DataFrame({
                    "vec_a": ai[ia][keep],
                    "vec_b": bi[ib][keep],
                    "cos_sim": S[ia, ib][keep],
                }))
            if frames:
                yield pd.concat(frames)

    return joined.mapInPandas(_sim, out_schema)


def embedding_near_dup_ivf(emb: DataFrame, threshold: float = 0.92,
                           n_centroids: int = N_CENTROIDS) -> DataFrame:
    """Near-duplicate pairs via IVF candidate blocking: vectors that are
    near-duplicates (cosine >= ~0.9) almost always land in the same IVF cell,
    so the pair enumeration is an equi-join on cell_id instead of an
    all-pairs product — the 100 TB composition (assign is one broadcast-
    centroid scan; in-cell pair counts are bounded by cell size, with the
    same skew handling as any groupBy key).  Approximate by construction
    (a near-dup pair straddling a cell boundary is missed); the oracle
    mirrors the identical cell blocking, so the gate checks this exact
    semantic.

    Caching contract: pins the assign+norm frame (read by both self-join
    sides).  Long-lived drivers release plan caches between query
    generations via ``spark.catalog.clearCache()`` (the bench harness
    does)."""
    a, b, cos = _cell_pair_frames(_assigned_cells(emb, n_centroids))
    return (
        a.join(b, "cell_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def _assigned_cells(emb: DataFrame, n_centroids: int) -> DataFrame:
    """Pinned (vec_id, embedding, cell_id, cell_sim, n2) frame — the
    IVF-blocked pair machinery's shared input.  Squared norm
    precomputed per VECTOR (not per pair): the pair stage then does one
    fold (the dot product) instead of three.  Pinned because the
    assign+norm subtree feeds both sides of the in-cell self-join."""
    from ..cachepin import pin

    return pin(
        emb.select("vec_id", "embedding")
        .join(ivf_assign(emb, n_centroids), "vec_id")
        .withColumn("n2", dot(F.col("embedding"), F.col("embedding")))
    )


def _cell_pair_frames(cells: DataFrame):
    """The two sides of the in-cell self-join plus the rounded cosine
    column — ONE rendering shared by embedding_near_dup_ivf and
    semantic_dedup so the blocking invariants cannot drift."""
    a = cells.select(
        "cell_id", F.col("vec_id").alias("vec_a"),
        F.col("cell_sim").alias("sim_a"),
        F.col("embedding").alias("emb_a"), F.col("n2").alias("n2_a"),
    )
    b = cells.select(
        "cell_id", F.col("vec_id").alias("vec_b"),
        F.col("cell_sim").alias("sim_b"),
        F.col("embedding").alias("emb_b"), F.col("n2").alias("n2_b"),
    )
    cos = F.round(
        dot(F.col("emb_a"), F.col("emb_b"))
        / (F.sqrt(F.col("n2_a")) * F.sqrt(F.col("n2_b"))),
        6,
    )
    return a, b, cos


def kmeans_centroids(emb: DataFrame, n_centroids: int = N_CENTROIDS,
                     seed: int = 42) -> DataFrame:
    """Train KMeans centroids over the embedding column.

    Output ``(cell_id, embedding array<double>)`` — the shape
    ``ivf_assign_with_centroids`` consumes.  Training is inherently an eager
    action (iterative Lloyd passes over the corpus); run it offline and
    persist the centroid table at scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = emb.select("vec_id", array_to_vector(_dbl(F.col("embedding"))).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(feats)
    spark = emb.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(rows, "cell_id int, c_emb array<double>")


def ivf_assign_with_centroids(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """ivf_assign against an explicit centroid table (e.g. KMeans-trained).
    ``cents``: (cell_id, c_emb).  Same plan as ivf_assign: broadcast
    centroids, one corpus scan, per-vector argmax window."""
    from pyspark.sql import Window as W

    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell_id",
        cosine(F.col("embedding"), F.col("c_emb")).alias("cell_sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cell_sim").desc(), F.col("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell_id", "cell_sim")
    )


def ivf_topk_trained(emb: DataFrame, n_queries: int = 5, k: int = 10,
                     n_centroids: int = N_CENTROIDS, nprobe: int = NPROBE,
                     seed: int = 42) -> DataFrame:
    """IVF top-k over KMeans-trained centroids (rows-only at the gate:
    KMeans init/iteration order is impl-specific, not oracle-reproducible).
    Same physical shape as ivf_topk; recall vs brute force is asserted in
    tests/test_kmeans_ivf.py."""
    from pyspark.sql import Window as W

    cents = kmeans_centroids(emb, n_centroids, seed)
    assign = ivf_assign_with_centroids(emb, cents)
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qcells = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "cell_id", "q_emb",
        cosine(F.col("q_emb"), F.col("c_emb")).alias("qc_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("qc_sim").desc(), F.col("cell_id"))
    probed = qcells.withColumn("rn", F.row_number().over(wq)).where(
        F.col("rn") <= nprobe
    ).select("query_id", "cell_id", "q_emb")

    corpus = emb.where(F.col("vec_id") >= n_queries).join(
        assign.select("vec_id", "cell_id"), "vec_id"
    )
    scored = corpus.join(probed, "cell_id").select(
        "query_id", "vec_id",
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Symmetric int8 scalar quantization — the standard storage/transport
    compression for embedding corpora (4x smaller than float32, ~1% recall
    loss for cosine retrieval): q_i = round(x_i / max|x| * 127), plus the
    per-vector scale needed to dequantize (x ~ q * scale / 127).

    Pure column expressions; zero vectors quantize to all-zero codes with
    scale 0.  Output: (vec_id, scale, q_emb array<int>).
    """
    dbl = _dbl(F.col("embedding"))
    max_abs = F.array_max(F.transform(dbl, lambda x: F.abs(x)))
    q = F.when(
        max_abs > 0,
        F.transform(dbl, lambda x: F.round(x / max_abs * 127).cast("int")),
    ).otherwise(F.transform(dbl, lambda x: F.lit(0)))
    return emb.select(
        "vec_id", F.round(max_abs, 6).alias("scale"), q.alias("q_emb")
    )


def quantized_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Brute-force top-k over DEQUANTIZED int8 embeddings — the retrieval
    path a quantized corpus actually runs.  Cosine is scale-invariant, so
    per-vector scales cancel and recall loss comes only from the 8-bit
    rounding; tests/test_quantized_recall.py pins it >= 0.9 @ k=10."""
    q = quantize_embeddings(emb)
    deq = q.select(
        "vec_id",
        F.transform(
            "q_emb", lambda x: x.cast("double") * F.col("scale") / 127.0
        ).alias("embedding"),
    )
    return brute_force_topk(deq, n_queries, k)


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.92) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine >= threshold).
    All-pairs here (correctness form); at scale the same predicate runs after
    LSH/IVF candidate pruning."""
    e = emb.select("vec_id", "embedding").withColumn(
        "n2", dot(F.col("embedding"), F.col("embedding"))
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"))
        / (F.sqrt(F.col("a.n2")) * F.sqrt(F.col("b.n2"))),
        6,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


# --- Product quantization (IVF-PQ's memory path) ------------------------------

def pq_train(emb: DataFrame, m: int = 8, k: int = 16,
             sample: int = 2048, iters: int = 10):
    """Train PQ codebooks: split the (unit-normalized) vector into ``m``
    subvectors and run Lloyd's k-means with ``k`` centroids per subspace
    — driver-side numpy over a DETERMINISTIC sample (the ``sample``
    lowest vec_ids), which is how production PQ trains (FAISS trains on a
    sample too; the corpus-scale work is encoding, not training).  EAGER
    by design (training exemption, like the KMeans/IVF/BPE paths).
    Deterministic: fixed init (first k sample rows per subspace), fixed
    iteration count, ties broken by numpy argmin (lowest index).

    Returns an (m, k, dim/m) float64 numpy array of centroids.
    """
    import numpy as np

    rows = (emb.orderBy("vec_id").limit(sample)
            .select("embedding").collect())
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    ds = d // m
    codebooks = np.zeros((m, k, ds))
    for j in range(m):
        sub = X[:, j * ds:(j + 1) * ds]
        C = sub[:k].copy()
        for _ in range(iters):
            dists = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = dists.argmin(1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        codebooks[j] = C
    return codebooks


def pq_encode(emb: DataFrame, codebooks) -> DataFrame:
    """Encode every vector as ``m`` small centroid ids — the 100 TB
    memory story: a 64-dim float32 vector (256 B) becomes m=8 nibble-
    range codes (8 B here, 32x; FAISS-style m=8/k=256 gives 8 B for a
    768-dim vector).  Arrow-batched pandas iterator, codebooks broadcast
    by closure; one narrow scan, no shuffle.
    Output: (vec_id, codes: array<int>).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cb = codebooks.copy()
    m, k, ds = cb.shape
    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("codes", T.ArrayType(T.IntegerType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:      # np.array of an empty list is shape (0,) —
                continue       # indexing [:, j*ds:...] would IndexError
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * ds:(j + 1) * ds]
                dists = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = dists.argmin(1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "codes": list(codes),
            })

    return emb.select("vec_id", "embedding").mapInPandas(run, schema)


def pq_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
            m: int = 8, n_centroids: int = 16) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes: queries
    stay exact floats, each query precomputes an (m x n_centroids) inner-
    product table against the codebooks (driver-side, tiny), and a doc's
    score is the sum of m table lookups on its codes — the FAISS IVF-PQ
    scoring loop as an Arrow-batched scan.  Corpus work per doc: m adds,
    reading 8 B of codes instead of 256 B of floats.  Rows-only at the
    gate (approximate scores are not SQL-oracle-expressible; recall vs
    the exact baseline is pinned by pytest and charted in
    experiments/pq_recall.py).
    Output: (query_id, vec_id, score, rank) — rank by ADC inner product.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    cb = pq_train(emb, m=m, k=n_centroids)
    q_rows = (emb.where(F.col("vec_id") < n_queries)
              .select("vec_id", "embedding").collect())
    ds = cb.shape[2]
    tables = {}
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qv = qv / (np.linalg.norm(qv) + 1e-12)
        tables[int(r["vec_id"])] = np.stack([
            cb[j] @ qv[j * ds:(j + 1) * ds] for j in range(cb.shape[0])
        ])  # (m, k) inner products

    codes = pq_encode(emb.where(F.col("vec_id") >= n_queries), cb)
    schema = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:      # shape-(0,) codes array cannot be indexed
                continue       # by C.shape[1] — skip, like the winnower
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qid, tab in tables.items():
                s = tab[np.arange(C.shape[1])[None, :], C].sum(1)
                out_q.append(np.full(len(ids), qid, dtype=np.int64))
                out_v.append(ids)
                out_s.append(np.round(s, 6))
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            })

    scored = codes.mapInPandas(run, schema)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_topk_rerank(emb: DataFrame, n_queries: int = 5, k: int = 10,
                   shortlist_mult: int = 10, m: int = 16,
                   n_centroids: int = 16) -> DataFrame:
    """PQ shortlist + exact re-rank — the production IVF-PQ pipeline's
    refine stage: ADC retrieves ``k * shortlist_mult`` candidates per
    query from the compressed codes (cheap scan of ~8-16 B/doc), then
    ONLY those candidates' float vectors are read back for exact cosine
    — float I/O is candidate-bounded, not corpus-bounded, which is the
    whole point at 100 TB.  Recall@10 >= 0.9 on the testdata at the
    defaults (pinned by pytest; curve in experiments/pq_recall.py).
    Output: (query_id, vec_id, cos_sim, rank) — same shape as
    brute_force_topk, directly comparable.
    """
    from pyspark.sql import Window as W

    shortlist = pq_topk(emb, n_queries=n_queries, k=k * shortlist_mult,
                        m=m, n_centroids=n_centroids).select(
        "query_id", "vec_id")
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    cand = shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id", "vec_id",
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def semantic_dedup(emb: DataFrame, threshold: float = 0.92,
                   n_centroids: int = N_CENTROIDS) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings and dropping, within each cluster, every
    vector that has a near-neighbor (cosine >= threshold) ranked
    before it — where rank is (cell_sim ASC, vec_id), so the survivor
    of each duplicate group is the one LEAST similar to its centroid
    (the paper's keep-rule: it preserves the cluster's diversity
    extremes rather than its redundant core).

    Scale shape: the pair enumeration is the :func:`embedding_near_dup_ivf`
    cell blocking — an equi-join on cell_id bounded by cell size, never
    all-pairs — and the keep-rule needs only EXISTS(earlier near
    neighbor): a semi-join-shaped aggregate, no transitive closure.
    Centroid assignment is one broadcast-centroid scan.

    Output: (vec_id, cell_id, cell_sim, kept int) — every input vector
    keeps a row; ``kept = 0`` marks semantic duplicates to drop."""
    cells = _assigned_cells(emb, n_centroids)
    a, b, cos = _cell_pair_frames(cells)
    earlier = (F.col("sim_a") < F.col("sim_b")) | (
        (F.col("sim_a") == F.col("sim_b"))
        & (F.col("vec_a") < F.col("vec_b")))
    dups = (
        a.join(b, "cell_id")
        .where(earlier)
        .where(cos >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        cells.join(dups, "vec_id", "left")
        .select("vec_id", "cell_id", "cell_sim",
                F.when(F.col("_dup").isNull(), 1).otherwise(0)
                .cast("int").alias("kept"))
    )


def near_dup_twin_augment(emb: DataFrame,
                          id_offset: int = 10 ** 12) -> DataFrame:
    """The deterministic perturbed-twin augmentation of the embedding
    near-dup / semantic-dedup gate fixtures — ONE Spark rendering
    (the oracles embed the matching SQL): every 10th vector gains a
    twin at ``vec_id + id_offset`` with +0.01 on every coordinate.
    The synthetic corpus is near-orthogonal (max pairwise cosine
    ~0.45), so WITHOUT twins every near-dup row's duplicate arm is
    vacuous at any SF.  The offset is 10^12 so a twin id can only
    collide with a real vector in a trillion-row fixture (the review
    found the former +100000 collides from sf10 up — and because the
    oracle replays the identical collision, parity would have stayed
    green while the one-twin-per-original semantic silently broke)."""
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    twins = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01))
        .alias("embedding"))
    return base.unionByName(twins)
