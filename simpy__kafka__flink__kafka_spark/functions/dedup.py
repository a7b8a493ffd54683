"""Near-duplicate detection over the ``documents`` table — exact,
MinHash+LSH, SimHash, and n-gram Jaccard.  All JVM-side expressions; no
Python UDFs.

Scale design (100 TB):

* Exact dedup is a hash-groupBy on the md5 fingerprint — map-side combinable,
  one shuffle on a uniform key.
* MinHash signatures are one shuffle (groupBy doc) over the exploded shingle
  stream; LSH banding then buckets docs by (band_idx, band_hash) so candidate
  generation is an equi-join on a high-cardinality key — never an all-pairs
  product.  Bucket skew (a degenerate band value shared by thousands of docs)
  is the known hazard; AQE skew-join handles moderate cases and a
  bucket-size cap (``max_bucket``) drops degenerate buckets explicitly.
* n-gram Jaccard is exact verification: join on shingle, count
  intersections per pair, compare to union.  Quadratic in the worst case —
  at scale it runs AFTER LSH candidate pruning (``verify_jaccard`` takes a
  candidate-pair DataFrame), not instead of it; the standalone
  ``ngram_jaccard_pairs`` form is the small-scale correctness twin.
* SimHash packs each doc into a 16-bit signature (built from md5 hex digits
  so the oracle can reproduce it); hamming-distance pairing uses pigeonhole
  banding — the signature splits into ``max_hamming + 1`` segments, any pair
  within the hamming bound must agree exactly on >= 1 segment, so candidates
  come from an equi-join on (segment_idx, segment_value) and hamming is only
  verified on those.

MinHash determinism contract: one md5 per shingle, sliced into disjoint
4-hex-char values (hash_j = substr(md5(shingle), j*4+1, 4)) compared as
*hex strings* (lexicographic min) — identical in Spark and DuckDB, no
64-bit truncation needed, and 8x fewer digest computations than hashing
per seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalized, shingle_array, shingles

NUM_HASHES = 8
BANDS = 4  # rows_per_band = NUM_HASHES // BANDS = 2
SIMHASH_BITS = 16


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), F.md5(normalized(text_col)).alias("fingerprint"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    return (
        fingerprint(df, id_col, text_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- MinHash ------------------------------------------------------------------

def minhash_signatures(df: DataFrame, num_hashes: int = NUM_HASHES,
                       shingle_df: DataFrame | None = None) -> DataFrame:
    """(doc_id, h0..h{n-1}) — per-doc MinHash signature.

    One md5 per distinct shingle, sliced into ``num_hashes`` disjoint
    4-hex-char values (md5 bits are independent, so slices act as
    independent 16-bit hash functions); each signature entry is the
    lexicographic min of its slice.  8x fewer digest computations than
    hashing per seed — the digest is the scan-dominant cost at corpus scale.
    """
    assert num_hashes <= 8, "32 hex chars / 4 per slice"
    # no .distinct(): min over the shingle multiset == min over the set,
    # and distinct would add a full shuffle before the aggregation.
    # ``shingle_df`` lets composed pipelines share (e.g. cache) one shingle
    # scan between signature generation and Jaccard verification.
    base = shingles(df) if shingle_df is None else shingle_df
    sh = base.withColumn("h", F.md5(F.col("shingle")))
    aggs = [
        F.min(F.substring("h", j * 4 + 1, 4)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_local(df: DataFrame,
                             num_hashes: int = NUM_HASHES,
                             text_col: str = "text") -> DataFrame:
    """Row-local MinHash: identical signature semantics to
    :func:`minhash_signatures` (one md5 per shingle, sliced into
    ``num_hashes`` 4-hex-char values, lexicographic min per slice) but
    computed INSIDE each doc row — a transform to the md5 array followed
    by one aggregate fold taking all slice minima in a single pass.
    ZERO shuffle: the corpus is scanned, never exchanged, which at
    cluster scale replaces the signature groupBy (the one corpus-scale
    shuffle of the LSH pipeline) with per-row compute.  Docs with no
    shingles (< n words) are dropped, matching the groupBy form's
    empty-group absence — without the filter every shingle-less doc
    would share one sentinel signature and bucket together.

    The fold's sentinel is ``"g"``: md5 hex is [0-9a-f], so "g" compares
    greater than every real slice value and never survives a non-empty
    array."""
    arr = shingle_array(text_col)
    fold = minhash_fold(text_col, num_hashes)
    return (
        df.where(F.size(arr) > 0)
        .select("doc_id", fold.alias("_s"))
        .select("doc_id",
                *[F.col(f"_s.h{j}").alias(f"h{j}")
                  for j in range(num_hashes)])
    )


def minhash_fold(text_col: str, num_hashes: int = NUM_HASHES):
    """The row-local MinHash signature as a single struct COLUMN
    (h0..h{n-1}) — see :func:`minhash_signatures_local` for semantics.
    Exposed separately so streaming plans (which cannot run the groupBy
    form — arbitrary aggregations don't compose with stream-stream
    joins) can attach signatures per-row while carrying event-time
    columns through."""
    arr = shingle_array(text_col)
    harr = F.transform(arr, lambda s: F.md5(s))
    init = F.struct(*[F.lit("g").alias(f"h{j}") for j in range(num_hashes)])
    return F.aggregate(
        harr,
        init,
        lambda acc, h: F.struct(*[
            F.least(acc[f"h{j}"], F.substring(h, j * 4 + 1, 4))
            .alias(f"h{j}")
            for j in range(num_hashes)
        ]),
    )


def band_structs(num_hashes: int = NUM_HASHES, bands: int = BANDS):
    """array<struct<band, bucket>> over h0..h{n-1} columns — the LSH
    banding expression shared by the batch bucketer and streaming plans."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def lsh_buckets(df: DataFrame, num_hashes: int = NUM_HASHES,
                bands: int = BANDS,
                shingle_df: DataFrame | None = None,
                local: bool = False) -> DataFrame:
    """(doc_id, band, bucket) — one row per (doc, band); bucket is the md5 of
    the band's signature slice.  ``local=True`` computes signatures
    row-locally (:func:`minhash_signatures_local`) — no corpus shuffle."""
    sig = (minhash_signatures_local(df, num_hashes) if local
           else minhash_signatures(df, num_hashes, shingle_df))
    return sig.select(
        "doc_id", F.explode(band_structs(num_hashes, bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = NUM_HASHES,
                      bands: int = BANDS, max_bucket: int = 1000,
                      shingle_df: DataFrame | None = None,
                      local: bool = False) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) that share >= 1 LSH bucket.

    ``max_bucket`` drops degenerate buckets (a safety valve at scale; with
    the default far above any bucket size in the testdata it does not change
    results — the oracle applies the same cap).
    """
    # Single aggregation over the bucket stream: collect each bucket's doc
    # list, then enumerate in-bucket pairs from the (size-capped) array.  The
    # previous formulation self-joined the bucket DataFrame plus a count
    # join, which executed the shingle->md5->signature subtree 4x; this shape
    # computes signatures exactly once.  Buckets are capped, so the per-row
    # pair lambda is O(max_bucket^2) worst case, constant per bucket at scale.
    bk = lsh_buckets(df, num_hashes, bands, shingle_df, local=local)
    grouped = (
        bk.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where((F.size("docs") >= 2) & (F.size("docs") <= max_bucket))
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "docs",
                    lambda x, i: F.transform(
                        F.slice("docs", i + F.lit(2), F.size("docs")),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


# --- n-gram Jaccard (exact verification) -------------------------------------

def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over distinct 3-gram shingle sets; pairs (a<b) with
    similarity >= threshold.  Output jaccard rounded to 6 — the division is
    over exact integer counts so both engines agree bit-for-bit."""
    sh = shingles(df).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def verify_jaccard(df: DataFrame, pairs: DataFrame,
                   threshold: float = 0.5,
                   shingle_df: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard verification restricted to a candidate-pair DataFrame
    ``(doc_a, doc_b)`` — the 100 TB dedup composition: LSH prunes, this
    verifies.  Work is O(candidates x shingles-per-doc), never all-pairs.

    Verification is pair-local: the corpus is pre-filtered to candidate
    docs (broadcast semi-join — LSH pruning plus the ``max_bucket`` cap
    make candidates << corpus), each candidate doc's shingle SET is
    built in one array row, and the Jaccard is an ``array_intersect``
    per pair.  With no ``shingle_df`` the set is computed row-locally
    (``array_distinct`` over the shingle array — no shuffle at all);
    with a shared ``shingle_df`` (a composed pipeline's cached scan) it
    is a ``collect_set`` aggregation, which dedups in-agg so the
    multiset stream needs no separate distinct shuffle.  Either way the
    corpus-scale shingle table is never exchanged here, per-doc arrays
    are bounded by doc length, and the whole tail is two
    broadcast-sized joins instead of a shingle-level join cascade
    (ngram_jaccard_pairs keeps the join-based form as the all-pairs
    small-scale twin)."""
    cand_docs = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    if shingle_df is None:
        sets = (
            df.join(F.broadcast(cand_docs), "doc_id")
            .select("doc_id",
                    F.array_distinct(shingle_array("text")).alias("_sh"))
        )
    else:
        sets = (
            shingle_df.join(F.broadcast(cand_docs), "doc_id")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("_sh"))
        )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sb"))
    n_inter = F.size(F.array_intersect("_sa", "_sb"))
    n_union = F.size("_sa") + F.size("_sb") - n_inter
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(n_inter / n_union.cast("double"), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dup_clusters(pairs: DataFrame, iterations: int = 4) -> DataFrame:
    """Connected components over a near-duplicate pair graph by iterated
    min-label propagation: every doc starts labeled with its own id; each
    round every doc takes the min of its own and its neighbors' labels.
    After ``iterations`` rounds, docs within that graph distance of their
    component's minimum id share ``cluster_id`` = that minimum — the
    canonical keeper, so dedup = keep rows where doc_id == cluster_id.

    Near-dup components have tiny diameters (dup groups are near-cliques
    from LSH banding), so a small fixed round count converges; each round is
    one equi-join + min-aggregate — the same shuffle shape per round at any
    scale.  The fixed round count is a CONTRACT with the gate oracle (which
    unrolls the identical rounds): a component whose radius from its min-id
    node exceeds ``iterations`` leaves locally-minimal labels unresolved on
    BOTH engines.  For graphs where that can happen (adversarial chains),
    use :func:`near_dup_clusters_fixpoint` — true connected components via
    large-star/small-star iterated to convergence.
    Output: (doc_id, cluster_id) for every doc appearing in ``pairs``.
    """
    from ..cachepin import pin

    # Plan-growth contract: the iterate must reference the previous round's
    # `labels` exactly ONCE.  The naive update — least(own label, min of
    # neighbor labels) — references it twice (inside the neighbor aggregate
    # and as the join's left side), so the analyzed plan carries
    # ~2^iterations copies of the seed subtree; Catalyst planning and cache
    # canonicalization over that tree cost a scale-FLAT ~15 s at the gate
    # (and per-round caching does NOT help: cache substitution happens
    # after analysis, which already paid the exponential tree).  Folding a
    # self-edge per node into the edge list makes the identical value —
    # min over N(d) ∪ {d} — a single join + min-aggregate per round, so
    # the lineage grows linearly in ``iterations``.
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # pinned: referenced by the self-edge union AND the label seed
    nodes = pin(und.select(F.col("src").alias("doc_id")).distinct())
    # pinned: every round's join reads this frame
    edges = pin(und.unionByName(
        nodes.select(F.col("doc_id").alias("src"),
                     F.col("doc_id").alias("dst"))
    ))
    labels = nodes.withColumn("label", F.col("doc_id"))
    for _ in range(iterations):
        labels = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("doc_id"), "label")
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def _large_star(bidir: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u}).
    Input edges must contain both directions; output is directed
    child -> parent with parent < child."""
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    m = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        bidir.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """Connect every parent of u (all < u) plus u itself to
    min(parents(u) + {u}).  Input/output: directed child -> parent."""
    m = directed.groupBy("u").agg(F.min("v").alias("m"))  # m < u by invariant
    j = directed.join(m, "u")
    out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
        m.select("u", F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def near_dup_clusters_fixpoint(pairs: DataFrame,
                               max_iterations: int = 25) -> DataFrame:
    """True connected components over a near-dup pair graph: alternating
    large-star / small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") iterated to a fixpoint — converges
    in O(log n) rounds on ANY graph shape, including the adversarial long
    chains that defeat fixed-round min-label propagation.

    Eager by design (one count+checksum action per round to detect the
    fixpoint, ``localCheckpoint`` per round to truncate join lineage), so it
    lives outside the lazily-declared query registry; the registry's
    :func:`near_dup_clusters` stays the oracle-matched fixed-round twin.
    Output: (doc_id, cluster_id) for every doc appearing in ``pairs``.
    """
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iterations):
        bidir = e.unionByName(e.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        e = _small_star(_large_star(bidir)).localCheckpoint()
        # count + order-independent XOR checksum (sum would overflow long
        # under ANSI mode)
        sig = e.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
        ).collect()[0]
        if (sig[0], sig[1]) == prev_sig:
            break
        prev_sig = (sig[0], sig[1])
    parents = e.select(F.col("u").alias("doc_id"), F.col("v").alias("parent"))
    return nodes.join(parents, "doc_id", "left").select(
        "doc_id", F.coalesce("parent", "doc_id").alias("cluster_id")
    )


def dedup_survivors(docs: DataFrame, pairs: DataFrame, *,
                    fixpoint: bool = False, iterations: int = 4,
                    id_col: str = "doc_id") -> DataFrame:
    """Cluster-canonical dedup: keep every doc that is its own cluster
    minimum (or in no near-dup cluster at all) — one anti-join against the
    cluster losers, so the corpus itself never shuffles on a wide key.

    ``fixpoint=False`` (default) uses fixed-round min-label propagation —
    the oracle-matched contract form (see :func:`near_dup_clusters`).
    ``fixpoint=True`` is the 100 TB scale recommendation: large-star /
    small-star contraction to convergence (:func:`near_dup_clusters_fixpoint`),
    which survives adversarial chain components whose radius exceeds the
    fixed round count — on a chain a1—a2—…—ak, fixed rounds leave k - 1 -
    ``iterations`` docs wrongly labeled as their own cluster minimum and
    therefore wrongly KEPT.  Both modes return the identical survivor set
    whenever every component's radius from its min-id node is within
    ``iterations`` (the normal LSH near-clique case).
    """
    clusters = (near_dup_clusters_fixpoint(pairs) if fixpoint
                else near_dup_clusters(pairs, iterations=iterations))
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


# --- SimHash ------------------------------------------------------------------

def _hex_digit(col, i: int):
    """Value of hex digit i (1-based) of an md5 string — strpos-decoded so
    the oracle can use the identical expression."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(col, i, 1)) - 1


def simhash(df: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — ``bits``-bit SimHash from the first bits/4 hex
    digits of each shingle's md5.  bit_k = majority vote of shingle bit_k."""
    sh = shingles(df).withColumn("h", F.md5(F.col("shingle")))
    digits = bits // 4
    for d in range(digits):
        sh = sh.withColumn(f"d{d}", _hex_digit(F.col("h"), d + 1))
    votes = [
        F.sum(
            (F.floor(F.col(f"d{k // 4}") / (2 ** (3 - k % 4))) % 2) * 2 - 1
        ).alias(f"v{k}")
        for k in range(bits)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    value = None
    for k in range(bits):
        bit = F.when(F.col(f"v{k}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(2 ** (bits - 1 - k))
        value = term if value is None else value + term
    return agg.select("doc_id", value.cast("long").alias("simhash"))


def hamming_near_dup_pairs(sig: DataFrame, max_hamming: int = 3,
                           bits: int = SIMHASH_BITS,
                           id_col: str = "doc_id",
                           hash_col: str = "simhash") -> DataFrame:
    """Generic banded hamming near-dup over ANY integer bit-signature
    frame — pairs (a<b) with hamming(hash_a, hash_b) <= max_hamming, via
    pigeonhole banding: split the signature into ``max_hamming + 1``
    disjoint bit segments — a pair within the hamming bound differs in
    at most ``max_hamming`` bits, so by pigeonhole it matches >= 1
    segment exactly.  Candidates come from an equi-join on
    (segment_idx, segment_value); hamming is computed only on
    candidates.  No all-pairs product anywhere — per-segment-value group
    sizes bound the work, exactly like LSH banding.  Consumers: text
    SimHash (:func:`simhash_near_dup_pairs`) and image average-hash
    (functions/multimodal.py:image_near_dup_pairs).

    Caching contract: pins the keyed-signature frame (both sides of the
    candidate self-join read it).  Long-lived drivers should release plan
    caches between query generations via ``spark.catalog.clearCache()`` (the
    bench harness does) or ``df.unpersist()`` on the returned plan's source.
    """
    n_seg = max_hamming + 1
    width = -(-bits // n_seg)  # ceil
    mask = F.lit((1 << width) - 1)
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                F.shiftrightunsigned(F.col(hash_col), i * width)
                .bitwiseAND(mask)
                .alias("val"),
            )
            for i in range(n_seg)
        ]
    )
    # cached: both sides of the candidate self-join read this frame, and the
    # signature computation above it is the expensive part
    from ..cachepin import pin

    keyed = pin(sig.select(
        F.col(id_col), F.col(hash_col), F.explode(segs).alias("s")
    ).select(id_col, hash_col, "s.seg", "s.val"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    ham = F.bit_count(
        F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}")))
    return (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
    )


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3,
                           bits: int = SIMHASH_BITS) -> DataFrame:
    """Text SimHash near-dup: :func:`simhash` signatures through the
    generic banded hamming join (:func:`hamming_near_dup_pairs`)."""
    return hamming_near_dup_pairs(simhash(df, bits),
                                  max_hamming=max_hamming, bits=bits)


# --- Cross-snapshot incremental dedup ----------------------------------------
# The repeated-crawl posture (round-7 verdict task #7): a corpus snapshot
# persists a compact per-doc PROFILE (fingerprint + MinHash signature);
# the next snapshot dedups AGAINST that artifact so known content is
# never re-admitted — without ever reading the prior snapshot's text.

def snapshot_profile(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     num_hashes: int = NUM_HASHES,
                     local: bool = False) -> DataFrame:
    """The per-doc artifact a crawl run persists for future incremental
    dedup: (prior_id, fingerprint, h0..h{n-1}).  Signature columns are
    NULL for docs too short to shingle (they can still be exact-matched
    by fingerprint).

    Default shape: one scan for fingerprints + the one signature groupBy
    — the same codegen-friendly pipeline every LSH consumer uses (the
    round-6 A/B standard: the exchange beats interpreted higher-order
    folds by ~7x cold at sf0.1).  ``local=True`` swaps in the row-local
    MinHash fold (:func:`minhash_fold`, identical values — pytest-
    asserted): ONE pass, ZERO shuffle, for deployments where removing
    the shingle exchange is worth the interpreted-fold CPU (e.g. the
    profile rides an ingest job that is exchange-bound, not CPU-bound).
    """
    if local:
        base = df.select(F.col(id_col).alias("prior_id"),
                         F.col(text_col).alias("text"))
        arr = shingle_array("text")
        fold = minhash_fold("text", num_hashes)
        sig = F.when(F.size(arr) > 0, fold)
        return base.select(
            "prior_id",
            F.md5(normalized("text")).alias("fingerprint"),
            *[sig[f"h{j}"].alias(f"h{j}") for j in range(num_hashes)],
        )
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    fp = base.select(F.col("doc_id").alias("prior_id"),
                     F.md5(normalized("text")).alias("fingerprint"))
    sig = minhash_signatures(base, num_hashes).withColumnRenamed(
        "doc_id", "prior_id")
    return fp.join(sig, "prior_id", "left")


def dedup_against(new_docs: DataFrame, prior: DataFrame,
                  threshold: float = 0.5,
                  num_hashes: int = NUM_HASHES, bands: int = BANDS,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Classify every NEW-snapshot doc against a prior snapshot's
    :func:`snapshot_profile`: ``exact_known`` (fingerprint already seen),
    ``near_known`` (shares >= 1 LSH bucket with a prior doc AND >=
    ceil(threshold * num_hashes) signature slices agree — the standard
    MinHash Jaccard estimate, so threshold keeps its Jaccard meaning), or
    ``fresh``.  Exact wins over near when both hold.

    Scale shape: one signature groupBy over the NEW snapshot only, then
    banded (band, bucket) equi-joins — the prior side is the persisted
    profile, never its text; no all-pairs product anywhere.  Keeping only
    ``status <> 'fresh'`` rows out is a filter on the output.  The two
    signature frames are pinned (cachepin) at an explicit
    MEMORY_AND_DISK level: both are referenced twice (bucket explode +
    slice-agreement join), so the pin saves a full pipeline recompute
    per reference.  The safety argument is SPILL, not smallness — the
    frames are signature-sized (~40 bytes/doc), which at 100 B docs is
    still ~4 TB of cluster-wide cache; MEMORY_AND_DISK degrades that to
    local-disk reads instead of eviction-recompute or OOM, and caching
    remains a performance hint, never a correctness dependency.
    Output: (id_col, status) — one row per new doc."""
    import math

    from pyspark import StorageLevel

    from ..cachepin import pin

    k = max(1, math.ceil(threshold * num_hashes))
    base = new_docs.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("text"))
    fp_new = base.select("doc_id", F.md5(normalized("text")).alias("fingerprint"))
    exact = fp_new.join(prior.select("fingerprint").distinct(),
                        "fingerprint", "left_semi").select("doc_id")

    sig_new = pin(minhash_signatures(base, num_hashes),
                  level=StorageLevel.MEMORY_AND_DISK)
    prior_sig = pin(prior.select(
        "prior_id", *[f"h{j}" for j in range(num_hashes)]
    ).where(F.col("h0").isNotNull()), level=StorageLevel.MEMORY_AND_DISK)
    bk_new = sig_new.select(
        "doc_id", F.explode(band_structs(num_hashes, bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    bk_prior = prior_sig.select(
        "prior_id", F.explode(band_structs(num_hashes, bands)).alias("bb")
    ).select("prior_id", "bb.band", "bb.bucket")
    cand = (bk_new.join(bk_prior, ["band", "bucket"])
            .select("doc_id", "prior_id").distinct())
    agree = sum(
        (F.col(f"n.h{j}") == F.col(f"p.h{j}")).cast("int")
        for j in range(num_hashes)
    )
    near = (
        cand.join(sig_new.alias("n"), "doc_id")
        .join(prior_sig.alias("p"), "prior_id")
        .where(agree >= k)
        .select("doc_id").distinct()
    )
    return (
        base.select("doc_id")
        .join(exact.withColumn("_e", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("_n", F.lit(1)), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.when(F.col("_e") == 1, F.lit("exact_known"))
            .when(F.col("_n") == 1, F.lit("near_known"))
            .otherwise(F.lit("fresh")).alias("status"),
        )
    )


def soft_dedup_weights(docs: DataFrame, pairs: DataFrame,
                       scale: int = 1_000_000,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Duplicate-DISCOUNTED sampling weights instead of removal (the
    SoftDeDup posture): every document survives, but its training weight
    is divided by its effective duplicate multiplicity, so a family of N
    copies contributes ~one document's worth of gradient in expectation.
    ``n_eff = max(exact-copy count, near-dup cluster size)`` — exact
    copies are a lower bound the near-dup cluster can only widen, and a
    doc in neither family keeps weight ``scale``.

    Integer posture: ``weight_ppm = scale div n_eff`` (floor), so the
    row is hash-oracle-checkable; consumers treat ppm as the sampling
    weight numerator.

    Scale shape: the exact count is ONE fingerprint-keyed window (text
    never shuffles — md5 only); cluster sizes are a groupBy over the
    cluster assignment (pair-volume-sized, not corpus-sized) joined
    back on doc_id.  ``pairs`` is the VERIFIED near-dup pair set — the
    banded LSH candidates after Jaccard confirmation — so the whole
    plan stays bucket-bounded.
    Output: (id_col, n_exact, n_eff, weight_ppm)."""
    from pyspark.sql import Window as W

    from .text import normalized

    fpw = W.partitionBy("_fp")
    exact = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized(text_col)).alias("_fp"),
    ).select(
        "doc_id",
        F.count(F.lit(1)).over(fpw).cast("long").alias("n_exact"),
    )
    # cluster sizes via ONE window over the (pair-volume-sized) cluster
    # assignment — a groupBy + join-back would reference `clusters` twice
    # and re-execute the whole propagation chain for each reference
    cw = W.partitionBy("cluster_id")
    per_doc = near_dup_clusters(pairs).select(
        "doc_id", F.count(F.lit(1)).over(cw).cast("long").alias("_csize"))
    out = (
        exact.join(per_doc, "doc_id", "left")
        .withColumn("n_eff", F.greatest(
            "n_exact", F.coalesce("_csize", F.lit(1).cast("long"))))
    )
    return out.select(
        F.col("doc_id").alias(id_col), "n_exact", "n_eff",
        F.expr(f"{scale} div n_eff").cast("long").alias("weight_ppm"),
    )
