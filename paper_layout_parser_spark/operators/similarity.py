"""Similarity search over an embedding column (array<float>).

  * brute_force_topk — exact cosine top-k per query vector. The correctness
    baseline; O(Q x N) but fully JVM-side (zip_with + aggregate fold, no
    Python), broadcast the query side.
  * lsh_topk         — random-hyperplane (SRP) LSH-bucketed approximate
    variant: candidates share >= 1 hyperplane-sign band, then exact cosine
    re-rank inside candidates. The 100 TB path: shuffle is O(N x bands).
  * cosine_neardup_pairs — all pairs with cosine >= threshold (embedding
    near-duplicate detection).

Cosine accumulates in float64 in element order (aggregate is a sequential
left fold), matching the DuckDB oracle's list_cosine_similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import round_half_up


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either side has zero norm.

    try_divide, not `/`: Spark 4 runs ANSI mode by default, where plain
    double division raises DIVIDE_BY_ZERO — one all-zero embedding in a
    100 TB corpus would kill the whole job (the try_parse_url argument).
    NULL flows into each consumer's existing degenerate handling: the
    brute-force twins sanitize it to -inf (_sanitize_cos, ranks last),
    ranking windows sort NULL cos last under DESC, and threshold
    filters (embed_neardup) drop it."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _cosine_hoisted(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the norm folds precomputed by the caller (r9):
    the interpreted HOF fold costs ~dim steps per aggregate, and the
    naive per-pair cosine runs THREE of them (dot + both norms) — the
    norms are per-VECTOR quantities recomputed once per candidate pair.
    Hoisting them to the pair sides (one fold per row instead of per
    pair) leaves only the dot fold at pair grain: ~3x less interpreted
    work per pair, bit-identical cos (same _norm expression over the
    same values, same try_divide)."""
    return F.try_divide(_dot(a, b), na * nb)


def _sanitize_cos(raw: Column) -> Column:
    """Degenerate-cosine contract shared by BOTH brute-force twins: a
    cosine that comes out NULL — NULL query or candidate embedding, OR
    a ZERO-NORM vector on either side (``cosine`` divides with
    try_divide, so 0/0 is NULL under Spark 4 ANSI, not IEEE NaN) — or
    NaN (a NaN element riding through the fold / Arrow batch) becomes
    -inf, so degenerate candidates rank LAST
    deterministically (id tie-break) under the (cos DESC, id ASC)
    window. Without this the engines disagree three ways: Spark's desc
    window ranks NaN ABOVE every double, NULL cos sorts NULLS-LAST, and
    a zero-substituted NULL embedding (or a norm-1.0-substituted zero
    vector, the r7 ADVICE seam) would score 0 (mid-ranking)."""
    return F.when(raw.isNull() | F.isnan(raw),
                  F.lit(float("-inf"))).otherwise(raw)


def _report_cos(col: Column) -> Column:
    """round_half_up goes through F.floor (long-valued) which cannot
    represent -inf — report the -inf sentinel unrounded."""
    return F.when(col == F.lit(float("-inf")),
                  col).otherwise(round_half_up(col, 6))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """For each query row, the top-k nearest candidates by cosine
    (excluding self), deterministic tie-break on candidate id.
    Degenerate pairs (NULL embedding on either side, NaN element,
    zero-norm vector on either side) report cos = -inf and rank last —
    see _sanitize_cos; this is the same contract the Arrow twin
    implements, so the twins agree on NaN/NULL/zero-norm inputs.

    ``queries`` is expected to be small relative to ``embeddings`` —
    broadcast it so the scan over the big side is shuffle-free."""
    # per-vector norms computed once per side (broadcast row / candidate
    # row), not once per (query, candidate) pair — see _cosine_hoisted
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    ))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _sanitize_cos(_cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                _report_cos(F.col("cos")).alias("cos"))
    )


def brute_force_topk_arrow(embeddings: DataFrame, queries: DataFrame,
                           k: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Arrow-vectorized production twin of brute_force_topk for WIDE
    embeddings: the native path scores each (query, candidate) pair with
    the interpreted HOF fold (Q x dim interpreter steps per candidate
    row — the same bottleneck BENCH/ANN_CAPACITY.md measured at ~300x on
    IVF assignment), this one does one (B x dim) @ (dim x Q) matmul per
    Arrow batch and prunes to the batch-local top-(k+1) per query before
    anything shuffles — the exchange carries ~partitions x (k+1) rows
    per query instead of N. Same output contract (rank by cos DESC,
    neighbor_id ASC, self excluded, cos rounded half-up to 6); batch-
    local pruning is exact because it uses the same (cos DESC, id ASC)
    order as the global window. Degenerate candidates — NULL embedding,
    a cosine that comes out non-finite (NaN element riding through
    Arrow), or a ZERO-NORM vector on either side (whose native
    try_divide cosine is NULL) — score -inf and rank LAST with id
    tie-break, the
    SAME contract the native twin's _sanitize_cos enforces, so the
    twins agree row-for-row on NaN/NULL/zero-norm inputs (twin-compared
    in tests/test_round6_hardening.py and test_round8_hardening.py). NULL QUERY embeddings raise
    ValueError up front — the native path returns all-(-inf)-cos rows
    for them, a degenerate answer better surfaced than silently
    returned (filter them, or use brute_force_topk). Queries are collected
    driver-side — the same "small relative to embeddings" contract the
    native path's broadcast already imposes, made explicit.
    Seam vs native: ranking runs on the UNROUNDED cosine in both twins,
    so a last-ulp difference between numpy and JVM fold summation can
    permute rank order between candidates whose scores tie to the bit
    under one engine — the 6-decimal rounding applies to the REPORTED
    cos only, not the ordering (parity pytested on real data; exact
    rank parity is not guaranteed on sub-ulp score ties)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = queries.select(id_col, vec_col).collect()
    null_q = [r[0] for r in qrows if r[1] is None]
    if null_q:
        raise ValueError(
            f"brute_force_topk_arrow: {len(null_q)} query row(s) have a "
            f"NULL {vec_col!r} (e.g. {id_col}={null_q[0]!r}) — the native "
            "path would return all-NULL-cos rows for them, which the "
            "matmul path cannot reproduce; filter NULL-embedding queries "
            "or use brute_force_topk"
        )
    out_schema = StructType([
        StructField("query_id", queries.schema[id_col].dataType),
        StructField("neighbor_id", embeddings.schema[id_col].dataType),
        StructField("cos", DoubleType()),
    ])
    spark = embeddings.sparkSession
    if not qrows:
        scored = spark.createDataFrame([], out_schema)
    else:
        qids = [r[0] for r in qrows]
        Q = np.array([[float(v) for v in r[1]] for r in qrows],
                     dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1)
        zero_q = qn == 0.0
        qn[zero_q] = 1.0
        bc = spark.sparkContext.broadcast((qids, (Q / qn[:, None]).T,
                                           zero_q))
        dim = Q.shape[1]
        kk = k + 1   # +1 so self-exclusion cannot eat a real neighbor

        def score(batches):
            q_ids, Qt, zero_q = bc.value
            zero = np.zeros(dim)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf[id_col].to_numpy()
                raw = pdf[vec_col].to_numpy()
                null_mask = np.fromiter((x is None for x in raw),
                                        dtype=bool, count=len(raw))
                if null_mask.any():
                    raw = np.array([zero if x is None else x for x in raw],
                                   dtype=object)
                m = np.stack(raw).astype(np.float64, copy=False)
                vn = np.linalg.norm(m, axis=1)
                zero_cand = vn == 0.0
                vn[zero_cand] = 1.0
                scores = (m / vn[:, None]) @ Qt          # B x Q
                # degenerate contract (_sanitize_cos): NaN scores,
                # NULL-embedding candidates, AND zero-norm vectors on
                # either side become -inf so they sort last everywhere
                # — locally, and in the global window where Spark
                # would rank NaN ABOVE all doubles under desc. Without
                # the masks a zero-substituted NULL embedding or a
                # norm-1.0-substituted zero vector would score 0
                # (mid-ranking), while the native twin's try_divide
                # 0/0 cosine is NULL -> -inf — the twins would diverge
                # row-for-row on exactly those rows (r7 ADVICE)
                scores[~np.isfinite(scores)] = -np.inf
                if null_mask.any():
                    scores[null_mask, :] = -np.inf
                if zero_cand.any():
                    scores[zero_cand, :] = -np.inf
                if zero_q.any():
                    scores[:, zero_q] = -np.inf
                take = min(kk, len(ids))
                out_q, out_n, out_c = [], [], []
                for j, qid in enumerate(q_ids):
                    # batch-local top-(k+1) in the GLOBAL order
                    # (cos DESC, id ASC) — lexsort keys: last is primary
                    top = np.lexsort((ids, -scores[:, j]))[:take]
                    out_q.extend([qid] * len(top))
                    out_n.extend(ids[top])
                    out_c.extend(scores[top, j])
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n,
                     "cos": out_c})

        scored = embeddings.select(id_col, vec_col).mapInPandas(
            score, out_schema)
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                _report_cos(F.col("cos")).alias("cos"))
    )


def srp_signatures(embeddings: DataFrame, num_planes: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int = 64, seed: int = 7) -> DataFrame:
    """Signed-random-projection bit signature, one bit per hyperplane.

    Hyperplane coefficients are a deterministic +/-1 pattern derived from
    xxhash64-free integer mixing (computed driver-side once, shipped as
    literals — no RNG at runtime, reproducible across runs/engines)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.choice([-1.0, 1.0], size=(num_planes, dim))
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        coeffs = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = _dot(F.col(vec_col), coeffs)
        sig = sig.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p))
            .otherwise(F.lit(0).cast("long"))
        )
    return embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("embedding"),
                             sig.alias("srp_sig"))


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             num_planes: int = 24, bands: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, max_bucket: int | None = 4096,
             reuse_tables: bool = True, checkpoint=None) -> DataFrame:
    """Approximate top-k: SRP band-bucket candidate join + exact cosine
    re-rank. Recall < 1 by construction; the scale path when Q x N is too
    large to brute-force. Defaults (24 planes / 8 bands of 3 bits) measure
    ~86% top-10 recall on the near-uniform driver embeddings; band
    selectivity should grow with corpus size (more planes per band).

    ``max_bucket`` caps the candidate side per (band, bucket) — a hot
    bucket (mirrored embeddings, zero vectors) otherwise multiplies every
    query hitting it (see dedup.cap_buckets)."""
    from .dedup import cap_buckets

    rows = num_planes // bands
    mask = (1 << rows) - 1
    sigs = srp_signatures(embeddings, num_planes, id_col, vec_col, dim)
    if reuse_tables:
        # both the query side and the candidate side derive from sigs —
        # without materialization each re-computes every plane dot product
        # over a fresh corpus scan (see dedup.minhash_lsh_pairs);
        # checkpoint= swaps localCheckpoint for a durable catalog table
        from .materialize import materialize

        sigs = materialize(sigs, checkpoint, "srp_sigs")
    # per-vector norm computed once per signature row (pre-explode), not
    # once per candidate pair inside the re-rank — see _cosine_hoisted
    sigs = sigs.withColumn("vnorm", _norm(F.col("embedding")))

    def banded(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(f"{side}_id"),
            F.col("embedding").alias(f"{side}_v"),
            F.col("vnorm").alias(f"{side}_n"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("srp_sig"), b * rows)
                    .bitwiseAND(F.lit(mask)).alias("bucket"),
                )
                for b in range(bands)
            ])).alias("bb"),
        ).select(f"{side}_id", f"{side}_v", f"{side}_n",
                 "bb.band", "bb.bucket")

    qs = banded(
        sigs.join(queries.select(F.col(id_col).alias("vec_id")), "vec_id"), "q"
    )
    cs = cap_buckets(banded(sigs, "c"), max_bucket, "c_id")
    cands = (
        F.broadcast(qs).join(cs, ["band", "bucket"])
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_v", "q_n", "c_id", "c_v", "c_n")
        .distinct()
    )
    scored = cands.withColumn("cos", _cosine_hoisted(
        F.col("q_v"), F.col("c_v"), F.col("q_n"), F.col("c_n")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"),
                "rank", round_half_up(F.col("cos"), 6).alias("cos"))
    )


# Scale for the fixed-point element sums inside k-means mean updates:
# sum(round(v * SCALE)) is an INTEGER aggregate (associative, partition-order
# independent) where a plain avg() over doubles is not — this is what makes
# centroid training bit-deterministic across runs AND reproducible by the
# DuckDB oracle. 2^24 keeps ~7 decimal digits per element and bounds the
# per-cluster sum to |v|max * 2^24 * rows (well inside int64 at any tested
# scale; lower it if a single cluster could exceed 2^53 rows*|v|).
IVF_MEAN_SCALE = float(1 << 24)


def _centroid_rows(centroids: list[list[float]]) -> list[tuple]:
    import math

    return [
        (i, [float(v) for v in c], math.sqrt(sum(v * v for v in c)) or 1.0)
        for i, c in enumerate(centroids)
    ]


def with_centroid_table(df: DataFrame, centroids: list[list[float]],
                        col: str = "__ctab") -> DataFrame:
    """Attach the centroid table as ONE array<struct> column via a one-row
    broadcast cross join. This is the scale-safe replacement for inlining
    every centroid as expression literals (``assign_cluster``): expression
    size is O(1) in the number of centroids — C only grows the broadcast
    relation (C x dim doubles, kilobytes) — so ``num_centroids`` in the
    thousands (real 100 TB IVF: nlist ~ sqrt(N)) never chokes Catalyst
    analysis or codegen. Norms are precomputed driver-side (``or 1.0``
    guard for zero vectors, mirrored by the oracle's CASE)."""
    one = df.sparkSession.createDataFrame(
        [(_centroid_rows(centroids),)],
        f"{col} array<struct<cid:int,cvec:array<double>,cnorm:double>>",
    )
    return df.crossJoin(F.broadcast(one))


def cluster_scores(vec: Column, ctab: Column) -> Column:
    """array<struct<s,negc>> of cosine scores against every centroid in the
    attached table. negc = -cid so array_max / descending sorts tie-break
    toward the LOWEST centroid id (same contract as assign_cluster and the
    oracle's ORDER BY cos DESC, cid ASC). Zero vectors score 0 against
    every centroid (norm guarded to 1, mirroring the centroid-side
    ``or 1.0`` guard) and tie-break to the lowest cid instead of
    raising DIVIDE_BY_ZERO under ANSI mode — a 100 TB embedding corpus
    will contain the occasional all-zero row."""
    vnorm = _norm(vec)
    vnorm = F.when(vnorm == 0.0, F.lit(1.0)).otherwise(vnorm)
    return F.transform(
        ctab,
        lambda cc: F.struct(
            (_dot(vec, cc["cvec"]) / (vnorm * cc["cnorm"])).alias("s"),
            (-cc["cid"]).alias("negc"),
        ),
    )


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding",
                    out_col: str = "cluster") -> DataFrame:
    """Adds ``out_col`` = argmax-cosine centroid id (ties -> lowest cid).
    One broadcast cross join + one O(1)-size projection regardless of C —
    see with_centroid_table."""
    df2 = with_centroid_table(df, centroids)
    best = F.array_max(cluster_scores(F.col(vec_col), F.col("__ctab")))
    return df2.withColumn(out_col, (-best["negc"]).cast("int")).drop("__ctab")


def _resolve_assigner(assign_impl: str):
    """One home for the assign_impl contract: validates the knob and
    resolves the implementation, so call sites cannot drift (an unknown
    string must raise here, never silently fall through to one path)."""
    impls = {"native": assign_clusters, "arrow": assign_clusters_arrow}
    if assign_impl not in impls:
        raise ValueError(f"unknown assign_impl {assign_impl!r}; "
                         f"expected one of {sorted(impls)}")
    return impls[assign_impl]


def _arrow_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str, out_col: str):
    """Internal: the matmul assignment plus its broadcast handle, so
    callers with a bounded consumption window (the training loop) can
    destroy the broadcast after the result is consumed instead of
    leaking one dim x C array per Lloyd iteration."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0
    # pre-normalized dim x C, shipped once per executor via broadcast
    bc = df.sparkSession.sparkContext.broadcast((C / cn[:, None]).T)
    dim = C.shape[1]

    # no pd.Series type hints: the module's `from __future__ import
    # annotations` stringifies them and pyspark's hint parser rejects
    # unresolvable strings — the returnType + default SCALAR kind carry
    # the same information
    @pandas_udf("int")
    def _assign(v):
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        raw = v.to_numpy()
        # NULL embeddings: the native twin scores them NULL against
        # every centroid and array_max tie-breaks to cid 0 — replace
        # with a zero vector (all scores 0 -> argmax 0), instead of
        # letting np.stack raise on the ragged object array
        if any(x is None for x in raw):
            zero = np.zeros(dim)
            raw = np.array([zero if x is None else x for x in raw],
                           dtype=object)
        m = np.stack(raw).astype(np.float64, copy=False)
        vn = np.linalg.norm(m, axis=1)
        vn[vn == 0.0] = 1.0
        scores = (m / vn[:, None]) @ bc.value
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    return df.withColumn(out_col, _assign(F.col(vec_col))), bc


def assign_clusters_arrow(df: DataFrame, centroids: list[list[float]],
                          vec_col: str = "embedding",
                          out_col: str = "cluster") -> DataFrame:
    """Arrow-vectorized production twin of assign_clusters for WIDE
    shapes: one numpy matmul per Arrow batch ((B x dim) @ (dim x C))
    replaces the interpreted per-element HOF fold, whose cost is C x dim
    interpreter steps per row — at dim=768 / C=1024 that is ~0.8M steps
    per row and the matmul path is orders of magnitude faster
    (measured: BENCH/ANN_CAPACITY.md). Same argmax-cosine contract,
    ties -> lowest centroid id (np.argmax returns the first maximum);
    NULL and all-zero embeddings both resolve to cid 0, matching the
    native twin.

    Seam vs the native path: numpy's blocked summation can round the
    last ulp of a cosine differently than the fold's strict
    left-to-right order, so two centroids whose scores differ below
    double rounding could argmax differently — a tie-class divergence,
    same category as the engine seams on the md5 hash families. The
    graded/oracle path stays assign_clusters (native); parity is
    asserted exactly on separated data in pytest.

    Resource note: each call creates one SparkContext broadcast (the
    pre-normalized dim x C matrix, ~C*dim*8 bytes) that lives until the
    session ends — fine for a handful of calls; the training loop uses
    the internal handle-returning variant and destroys per-iteration
    broadcasts after the means collect."""
    return _arrow_assign(df, centroids, vec_col, out_col)[0]


def train_ivf_centroids(embeddings: DataFrame, num_centroids: int = 16,
                        max_iter: int = 5, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        dim: int = 64,
                        sample_fraction: float = 1.0,
                        sample_salt: str = "plp-ivf",
                        init_hash: str = "xxhash64",
                        assign_impl: str = "native") -> list[list[float]]:
    """Deterministic spherical k-means coarse quantizer (the IVF index's
    centroid table). Classic Spark k-means shape: centroids live on the
    DRIVER (C x dim doubles — tiny) and ship via a one-row broadcast table
    (with_centroid_table — expression size O(1) in C); each Lloyd iteration
    is one scan (assign = argmax cosine) + one groupBy computing
    element-wise means. Means aggregate SCALED-INTEGER element sums
    (sum(floor(v * 2^24 + 0.5)) as long — associative, so the result is
    bit-identical across runs, partition counts, AND engines; double
    avg() is partition-order dependent) and divide driver-side. No RNG at
    runtime: init picks the hash-ordered top-C vectors, so runs agree;
    ``init_hash='md5'`` swaps xxhash64 for md5 ordering so an independent
    engine (the DuckDB oracle) can re-derive the identical init set and
    replay the whole training bit-for-bit (same pattern as the md5
    MinHash/SimHash families).

    ``sample_fraction`` < 1 trains on a deterministic md5 hex-threshold
    sample (curation.hex_bound — the same engine-portable mechanism as
    assign_split; no RNG, a pure codegen filter Catalyst pushes into the
    scan). At 100 TB this is the difference between ``max_iter``+1 full
    corpus scans and scans of a centroid-training sample that fits a few
    executors; centroid quality needs only a representative sample, and
    the ASSIGNMENT plan (the part that must see every row) is unchanged.

    ``assign_impl='arrow'`` swaps the per-iteration assignment for the
    numpy-matmul path (assign_clusters_arrow) — the production choice at
    wide dim x C, where the interpreted HOF fold dominates training wall
    (BENCH/ANN_CAPACITY.md). Bit-reproducibility of training then rests
    on the arrow path's tie seam (see its docstring); the oracle-replayed
    md5 family keeps ``'native'``."""
    _resolve_assigner(assign_impl)   # validate the knob before any scan
    train = embeddings
    if sample_fraction < 1.0:
        from .curation import hex_bound, salted_h8

        train = embeddings.where(
            salted_h8(sample_salt, id_col) < F.lit(hex_bound(sample_fraction))
        )
    # init: a deterministic pseudo-random sample via hash-ordered top-N —
    # orderBy+limit plans as TakeOrderedAndProject (distributed top-N),
    # never a global sort; no RNG, so runs/engines agree. The limit also
    # clamps num_centroids to the corpus size for free (no count() scan).
    order = (F.md5(F.col(id_col).cast("string")) if init_hash == "md5"
             else F.xxhash64(F.col(id_col).cast("string")))
    init = (
        train.orderBy(order, id_col)
        .limit(max(1, num_centroids))
        .select(vec_col)
        .collect()
    )
    centroids = [[float(v) for v in r[0]] for r in init]
    if not centroids:
        raise ValueError(
            "train_ivf_centroids: the training input is empty "
            f"(sample_fraction={sample_fraction}); raise sample_fraction — "
            "an empty centroid table would silently return zero neighbors "
            "for every query"
        )
    S = IVF_MEAN_SCALE
    for _ in range(max_iter):
        bc = None
        if assign_impl == "arrow":
            # handle-returning variant: the means collect below is the
            # last consumer of this iteration's assignment, so the
            # centroid broadcast is destroyed right after instead of
            # accumulating one dim x C array per Lloyd iteration
            assigned, bc = _arrow_assign(train, centroids, vec_col, "__c")
        else:
            assigned = assign_clusters(train, centroids, vec_col, "__c")
        means = assigned.groupBy("__c").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(
                F.floor(F.col(vec_col)[i].cast("double") * S + F.lit(0.5))
                .cast("long")
            ).alias(f"s{i}") for i in range(dim)]
        ).collect()
        if bc is not None:
            bc.destroy()
        new = list(centroids)
        for r in means:
            n = float(r["n"])
            new[r["__c"]] = [float(r[f"s{i}"]) / n / S for i in range(dim)]
        if new == centroids:
            break
        centroids = new
    return centroids


def assign_cluster(vec: Column, centroids: list[list[float]]) -> Column:
    """LEGACY small-C column-expression variant of assign_clusters: inlines
    every centroid as literals, so the expression tree is C x dim nodes —
    fine at C=16, but a real IVF wants nlist in the thousands where this
    chokes Catalyst. Kept as the independent parity twin for
    assign_clusters (tested equal at C=16); new code should use
    assign_clusters (broadcast centroid table, O(1) expression size).
    Ties -> lowest centroid index, same contract as assign_clusters
    (including the zero-vector norm guard)."""
    import math

    vnorm = _norm(vec)
    vnorm = F.when(vnorm == 0.0, F.lit(1.0)).otherwise(vnorm)
    scores = F.array(*[
        F.struct(
            (_dot(vec, F.array(*[F.lit(v) for v in c]))
             / (vnorm * F.lit(math.sqrt(sum(v * v for v in c)) or 1.0))
             ).alias("s"),
            F.lit(-i).alias("negc"),   # struct order: max s, then MIN index
        )
        for i, c in enumerate(centroids)
    ])
    return -F.array_max(scores)["negc"]


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             num_centroids: int = 16, nprobe: int = 4, max_iter: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, sample_fraction: float = 1.0,
             init_hash: str = "xxhash64",
             assign_impl: str = "native",
             centroids: list | None = None,
             assigned: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``num_centroids`` inverted lists, probe each query against its
    ``nprobe`` nearest lists only, exact cosine re-rank inside the probed
    lists. The second scale path next to lsh_topk (the brief's "IVF or
    LSH-bucketed variant"): candidate volume is ~N * nprobe/num_centroids
    per query instead of N, and the big side shuffles once on the cluster
    id. Recall < 1 by construction; raise nprobe to trade compute back for
    recall (nprobe = num_centroids degenerates to exact).
    ``sample_fraction`` bounds centroid TRAINING to a deterministic sample
    (see train_ivf_centroids); assignment still covers every row.
    ``init_hash='md5'`` makes the whole surface (training included)
    reproducible by the DuckDB oracle — see train_ivf_centroids.
    ``assign_impl='arrow'`` routes BOTH the training iterations and the
    corpus assignment through the numpy-matmul path — the production
    choice at wide dim x C (BENCH/ANN_CAPACITY.md measures the
    interpreted fold at ~8 ms/vector at dim=768/C=1024 vs milliseconds
    per thousand on the matmul); the query-side probe scoring stays
    native (queries x C is small).
    ``centroids=`` (a pre-trained list of centroid vectors, e.g. from
    train_ivf_centroids) skips training — the production shape, where
    one trained index serves many query batches; ``assigned=`` (the
    embeddings frame with a ``cluster`` column, e.g. a persisted
    assign_clusters[_arrow] output) additionally skips corpus
    assignment, so nprobe varies per call against one materialized
    inverted index (BENCH/ANN_CAPACITY.md's query-leg probe)."""
    if assigned is not None and centroids is None:
        raise ValueError("assigned= requires centroids= (probe "
                         "selection scores queries against the same "
                         "centroid table the index was built with)")
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, num_centroids, max_iter, id_col, vec_col, dim,
            sample_fraction=sample_fraction, init_hash=init_hash,
            assign_impl=assign_impl,
        )
    if assigned is not None:
        assigned = assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"), F.col("cluster"),
        )
    else:
        assigned = _resolve_assigner(assign_impl)(
            embeddings.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cv")
            ),
            centroids, "cv", "cluster",
        )
    # per query: nprobe nearest centroids -> explode to (query, cluster).
    # array_sort ascending on (s, negc) then reverse = s DESC, cid ASC on
    # ties — identical to the oracle's ORDER BY cos DESC, cid ASC.
    q = with_centroid_table(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv")),
        centroids,
    )
    scores = cluster_scores(F.col("qv"), F.col("__ctab"))
    probes = (
        q.withColumn("__probe",
                     F.slice(F.reverse(F.array_sort(scores)), 1, nprobe))
        .select("query_id", "qv",
                F.explode(F.transform(
                    "__probe", lambda x: (-x["negc"]).cast("int")
                )).alias("cluster"))
    )
    # per-vector norms once per probe row / corpus row, not per candidate
    # pair inside the probed-list re-rank — see _cosine_hoisted
    scored = (
        F.broadcast(probes.withColumn("qn", _norm(F.col("qv"))))
        .join(assigned.withColumn("cn", _norm(F.col("cv"))), "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                round_half_up(F.col("cos"), 6).alias("cos"))
    )


def cosine_neardup_lsh(embeddings: DataFrame, threshold: float = 0.4,
                       num_planes: int = 24, bands: int = 8,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       dim: int = 64, max_bucket: int | None = 256,
                       reuse_tables: bool = True, checkpoint=None) -> DataFrame:
    """Embedding near-dup pairs at scale: SRP band-bucket candidates
    (O(N x bands) shuffle, never O(N^2)) verified with exact cosine.
    Precision 1.0 vs cosine_neardup_pairs; recall < 1 by construction.
    ``max_bucket`` bounds the in-bucket join against viral duplicates
    (see dedup.cap_buckets)."""
    from .dedup import cap_buckets

    rows = num_planes // bands
    mask = (1 << rows) - 1
    sigs = srp_signatures(embeddings, num_planes, id_col, vec_col, dim)
    if reuse_tables:
        # the banded self-join otherwise re-computes every plane dot
        # product on both sides (see dedup.minhash_lsh_pairs);
        # checkpoint= swaps localCheckpoint for a durable catalog table
        from .materialize import materialize

        sigs = materialize(sigs, checkpoint, "srp_neardup_sigs")
    # per-vector norm once per signature row (pre-explode), not per
    # verified candidate pair — see _cosine_hoisted
    banded = sigs.withColumn("vnorm", _norm(F.col("embedding"))).select(
        "vec_id", "embedding", "vnorm",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("srp_sig"), b * rows)
                .bitwiseAND(F.lit(mask)).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("vec_id", "embedding", "vnorm", "bb.band", "bb.bucket")
    banded = cap_buckets(banded, max_bucket, "vec_id")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("id_a"), F.col("a.embedding").alias("va"),
                F.col("a.vnorm").alias("na"),
                F.col("b.vec_id").alias("id_b"), F.col("b.embedding").alias("vb"),
                F.col("b.vnorm").alias("nb"))
        .distinct()
    )
    cos = _cosine_hoisted(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        cands.withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", round_half_up(F.col("cos"), 6).alias("cos"))
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.4,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """All (a < b) pairs with cosine >= threshold. Exact; at scale, use
    cosine_neardup_lsh (SRP candidates) instead of the pairwise join."""
    # per-vector norms once per side row, not per pair — _cosine_hoisted
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                          _norm(F.col(vec_col)).alias("na"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                          _norm(F.col(vec_col)).alias("nb"))
    cos = _cosine_hoisted(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", round_half_up(F.col("cos"), 6).alias("cos"))
    )
