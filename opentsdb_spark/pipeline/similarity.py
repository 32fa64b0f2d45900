"""Approximate-nearest-neighbor search over an embedding column.

  brute_force_topk   exact cosine top-k: query-set broadcast x full scan,
                     per-query row_number window — the correctness baseline
  lsh_topk           sign-bucketed candidate pruning (same buckets as
                     dedup.embedding_dup_pairs) then exact re-rank — the
                     scale path: each query only scores its bucket

Vector math (bucket folds, cosine scoring, cell assignment) runs in
Arrow-batched pandas_udfs with dim-sequential accumulation: Spark's
higher-order array expressions are CodegenFallback (interpreted, ~100ns per
lambda op on whole-corpus paths) while the numpy loops replay the identical
IEEE op order — bit-identical results at vectorized speed. The expression
forms are kept (_dot/_norm/with_hyperplane_buckets_expr) as the reference
semantics the pandas paths must match. At 100 TB the scan side stays
partition-parallel and the tiny query set broadcasts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentsdb_spark.session import tiny_df


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cosine_pairs_udf(bit_exact: bool = False):
    """Arrow-batched cosine over (query_vec, corpus_vec) row pairs. The
    expression form (_dot/_norm) is CodegenFallback — interpreted lambda ops
    per element on the scoring hot path.

    bit_exact=True loops dim-sequentially so every product/sum/sqrt/divide
    replays the fold's IEEE op order — bit-identical to the expression form.
    The default uses einsum (pairwise summation, ~3x fewer python-level
    passes); its ~1e-15 relative FP-order noise is absorbed by the
    catalog's 4-decimal RND rounding (whose +1e-7 boundary bias exists
    precisely to keep such noise off rounding edges), so oracle hashes are
    unchanged — pinned by the full-catalog run and the fast-vs-exact
    equality test."""

    @F.pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        import numpy as np

        n = len(qv)
        if n == 0:
            return pd.Series([], dtype=float)
        Q = np.asarray([np.asarray(v, np.float64) for v in qv], dtype=np.float64)
        C = np.asarray([np.asarray(v, np.float64) for v in cv], dtype=np.float64)
        if not bit_exact:
            dot = np.einsum("ij,ij->i", Q, C)
            qn = np.einsum("ij,ij->i", Q, Q)
            cn = np.einsum("ij,ij->i", C, C)
        else:
            dot = np.zeros(n)
            qn = np.zeros(n)
            cn = np.zeros(n)
            for d in range(Q.shape[1]):
                dot = dot + Q[:, d] * C[:, d]
                qn = qn + Q[:, d] * Q[:, d]
                cn = cn + C[:, d] * C[:, d]
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(dot / (np.sqrt(qn) * np.sqrt(cn)))

    return cos


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    queries: (query_id, embedding). Self-matches (same id) are kept; filter
    upstream if undesired. Returns (query_id, vec_id, cosine, rank).
    Scoring is the vectorized pandas cosine (see _cosine_pairs_udf); the
    query set broadcasts so the corpus never shuffles before the per-query
    top-k window."""
    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _cosine_pairs_udf()(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def sign_bucket(vec_col, sign_bits: int = 8):
    """Axis-aligned sign-pattern bucket id over the first n dims (kept as the
    degenerate single-table LSH; prefer hyperplane_buckets for real recall)."""
    v = _as_double(vec_col)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(sign_bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2 + F.when(F.element_at(v, i + 1) >= 0, 1).otherwise(0),
    )


def _plane_coeffs(table: int, bit: int, dim: int, seed: int) -> list[float]:
    """Deterministic Gaussian hyperplane — same (seed, table, bit) always
    yields the same plane, so corpus and query sides bucket identically and
    plans are reproducible across sessions (no RNG state on executors; the
    planes are plan-time literals broadcast inside the expression tree)."""
    import random

    rng = random.Random((seed * 1_000_003 + table) * 1_000_003 + bit)
    return [rng.gauss(0.0, 1.0) for _ in range(dim)]


def seeded_centroids(n: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Data-independent Gaussian cell vectors for ivf_topk(centroids=...) —
    deterministic from (seed, i), generated off the same stream as the LSH
    planes (table index offset keeps them disjoint). Directions are uniform
    on the sphere, which is what cosine quantization cares about."""
    return [_plane_coeffs(1_000_000 + i, 0, dim, seed) for i in range(n)]


def hyperplane_bucket(vec_col, table: int, bits: int, dim: int, seed: int = 42):
    """Random-hyperplane (SimHash-style) bucket id for one LSH table: bit j
    is the sign of <v, p_tj> for a fixed Gaussian plane p_tj. P[bit agrees]
    = 1 - theta/pi for angle theta, so K independent tables catch what any
    single sign pattern misses."""
    v = _as_double(vec_col)
    acc = F.lit(0).cast("long")
    for j in range(bits):
        plane = F.array(*[F.lit(c) for c in _plane_coeffs(table, j, dim, seed)])
        d = _dot(v, plane)
        acc = acc * 2 + F.when(d >= 0, 1).otherwise(0)
    return acc


def _bucket_fold(v, planes_col, tables: int, bits: int):
    """(table, bucket) struct array from a 3-D planes array column: bucket
    bit j (MSB-first) is the sign of <v, planes[t][j]>. Nested higher-order
    lambdas — ONE compiled lambda body regardless of tables*bits (emitting a
    separate fold expression per plane made Janino compile seconds of code
    for a millisecond of math). Per-plane fold order is the same sequential
    left fold as hyperplane_bucket — bit-compatible with the DuckDB
    oracles."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(tables - 1)),
        lambda t: F.struct(
            t.cast("int").alias("table"),
            F.aggregate(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc * 2
                + F.when(
                    _dot(v, F.element_at(F.element_at(planes_col, t + 1), j + 1)) >= 0,
                    1,
                ).otherwise(0),
            ).alias("bucket"),
        ),
    )


def hyperplane_buckets(vec_col, tables: int, bits: int, dim: int, seed: int = 42):
    """Array of (table, bucket) structs — explode for multi-table candidate
    generation; a pair is a candidate if it collides in ANY table.

    Column-expression variant: the tables*bits plane coefficients ride in
    ONE 3-D literal parsed from a single SQL string (one py4j call — F.lit
    per coefficient cost ~7s of driver round-trips at 10x6x64). repr() is
    shortest-roundtrip so the parsed doubles are bit-identical to F.lit
    values; the D suffix forces DoubleType (bare decimals parse as DECIMAL
    and would re-round). Prefer with_hyperplane_buckets for DataFrame
    pipelines — it ships the planes as broadcast data instead of 3840
    analyzer/codegen literal nodes."""
    planes = F.expr(
        "array(%s)"
        % ",".join(
            "array(%s)"
            % ",".join(
                "array(%s)"
                % ",".join(
                    repr(c) + "D" for c in _plane_coeffs(t, j, dim, seed)
                )
                for j in range(bits)
            )
            for t in range(tables)
        )
    )
    return _bucket_fold(_as_double(vec_col), planes, tables, bits)


def with_hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    tables: int,
    bits: int,
    dim: int,
    seed: int = 42,
    out: str = "tb",
    bit_exact: bool = False,
) -> DataFrame:
    """df + exploded ``out`` = (table, bucket) struct per LSH table.

    The bucket fold runs in an Arrow-batched pandas_udf: the higher-order-
    function form (with_hyperplane_buckets_expr) is CodegenFallback, so its
    tables*bits*dim lambda ops ran INTERPRETED — ~100ns per multiply on the
    whole-corpus hot path (measured 3.9s for 5k x 10x6x64 at sf0.1; the
    numpy path is ~50ms). Planes ride the pickled UDF closure (data, not
    plan nodes).

    Default (bit_exact=False): ONE BLAS matmul V @ planes^T per Arrow batch
    — ~tables*bits fewer python-level passes than the fold. Its blocked FP
    summation can in principle flip a sign vs the expression form only when
    |<v,plane>| ~ 1e-15 * ||terms||; measured corpus margins are ~1e-6
    (nine orders of magnitude), so buckets agree in practice
    (tests/test_pipeline.py pins agreement + identical top-k).
    bit_exact=True reproduces aggregate(zip_with(...))'s dim-sequential
    left-sum order exactly — bit-identical to with_hyperplane_buckets_expr
    and the DuckDB oracles by construction; use it when an oracle must be
    pinned against adversarial margins."""
    import numpy as np

    planes = np.array(
        [[_plane_coeffs(t, j, dim, seed) for j in range(bits)] for t in range(tables)],
        dtype=np.float64,
    )
    flat_planes = planes.reshape(tables * bits, dim)

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        if not bit_exact:
            signs = (V @ flat_planes.T) >= 0.0  # (n, tables*bits)
            weights = (1 << np.arange(bits - 1, -1, -1, dtype=np.int64))
            buckets = (
                signs.reshape(n, tables, bits).astype(np.int64) * weights
            ).sum(axis=2)
            return pd.Series(list(buckets))
        buckets = np.zeros((n, tables), dtype=np.int64)
        for t in range(tables):
            for j in range(bits):
                c = planes[t, j]
                acc = np.zeros(n, dtype=np.float64)
                for d in range(V.shape[1]):
                    # dim-sequential: acc_d = acc_{d-1} + (v_d * c_d), the
                    # exact op sequence of aggregate(zip_with(v,c,*), 0, +)
                    acc = acc + V[:, d] * c[d]
                buckets[:, t] = buckets[:, t] * 2 + (acc >= 0.0)
        return pd.Series(list(buckets))

    return (
        df.withColumn("__b", _buckets(F.col(vec_col)))
        .select("*", F.posexplode("__b").alias("__t", "__bk"))
        .withColumn(
            out,
            F.struct(
                F.col("__t").cast("int").alias("table"),
                F.col("__bk").alias("bucket"),
            ),
        )
        .drop("__b", "__t", "__bk")
    )


def with_hyperplane_buckets_expr(
    df: DataFrame,
    vec_col: str,
    tables: int,
    bits: int,
    dim: int,
    seed: int = 42,
    out: str = "tb",
) -> DataFrame:
    """Pure-column-expression variant (planes as a broadcast single-row
    frame, BroadcastNestedLoopJoin, no Python workers). Kept as the
    reference implementation the pandas path must match bit-for-bit, and
    for environments where Python workers are unavailable; interpreted
    higher-order functions make it ~50x slower on the corpus hot path."""
    planes = [[_plane_coeffs(t, j, dim, seed) for j in range(bits)] for t in range(tables)]
    pdf = tiny_df(df.sparkSession,
                  [(planes,)], "__planes array<array<array<double>>>")
    bcol = _bucket_fold(_as_double(F.col(vec_col)), F.col("__planes"), tables, bits)
    return (
        df.crossJoin(F.broadcast(pdf))
        .withColumn(out, F.explode(bcol))
        .drop("__planes")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    tables: int = 10,
    bits: int = 6,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    bit_exact: bool = False,
) -> DataFrame:
    """Multi-table hyperplane-LSH ANN: a corpus vector is a candidate for a
    query if they collide in ANY of ``tables`` independent sign-hash tables;
    candidates are exactly cosine-scored and top-k ranked.
    ``bit_exact`` selects the fold-order-exact bucket path (see
    with_hyperplane_buckets) — the matmul default is ~10x fewer CPU ops.

    Recall tuning: P[candidate] = 1 - (1 - p^bits)^tables with
    p = 1 - theta/pi. The defaults (10 tables x 6 bits) give ~0.95 for
    cosine 0.8 neighbors; the recall test pins >= 0.9 against
    brute_force_topk on the driver fixture. At corpus scale the corpus side
    explodes ``tables`` rows per vector (8B bucket keys); the query side
    stays broadcast."""
    # candidate generation runs on bare 8-byte ids + bucket keys — the
    # dim-length vectors do NOT ride the tables-fold explode or the
    # dropDuplicates shuffle (~64x the bytes at dim 64 x 10 tables); the
    # survivors re-join their vectors afterwards, same pattern as
    # dedup.embedding_dup_pairs
    corpus = with_hyperplane_buckets(
        embeddings.select(F.col(id_col), F.col(vec_col)),
        vec_col, tables, bits, dim, seed, bit_exact=bit_exact,
    ).select(id_col, "tb.table", "tb.bucket")
    q = with_hyperplane_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)),
        vec_col, tables, bits, dim, seed, bit_exact=bit_exact,
    ).select(query_id_col, _as_double(F.col(vec_col)).alias("qv"), "tb.table", "tb.bucket")
    # candidate = collision in any table; dedup (query, id) before scoring so
    # multi-table collisions are scored once
    cands = (
        corpus.join(F.broadcast(q.select(query_id_col, "table", "bucket")),
                    on=["table", "bucket"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    vecs = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    qv = q.select(query_id_col, "qv").dropDuplicates([query_id_col])
    scored = (
        cands.join(vecs, on=id_col)
        .join(F.broadcast(qv), on=query_id_col)
        .withColumn("cosine", _cosine_pairs_udf()(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _cell_cosines_udf(cent_arr: list[list[float]]):
    """Cosine of each vector to every centroid, dim-sequential like the
    expression fold — one Arrow batch computes the corpus x cells block
    that previously ran as interpreted lambdas through a join+groupBy."""

    @F.pandas_udf("array<double>")
    def cellcos(vs: pd.Series) -> pd.Series:
        import numpy as np

        n = len(vs)
        if n == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(v, np.float64) for v in vs], dtype=np.float64)
        Cm = np.asarray(cent_arr, dtype=np.float64)
        dots = np.zeros((n, Cm.shape[0]))
        vn = np.zeros(n)
        cn = np.zeros(Cm.shape[0])
        for d in range(V.shape[1]):
            vn = vn + V[:, d] * V[:, d]
            cn = cn + Cm[:, d] * Cm[:, d]
            dots = dots + V[:, d][:, None] * Cm[None, :, d]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (np.sqrt(vn)[:, None] * np.sqrt(cn)[None, :])
        return pd.Series(list(cos))

    return cellcos


def _assign_cells(corpus: DataFrame, cent_arr: list[list[float]], vec_alias: str) -> DataFrame:
    """+`cell` = argmax-cosine centroid index — a narrow map stage straight
    off the scan (no corpus x centroids join, no groupBy(id) shuffle);
    array_position takes the FIRST max, so ties resolve to the lowest cell."""
    return (
        corpus.withColumn("__cc", _cell_cosines_udf(cent_arr)(F.col(vec_alias)))
        .withColumn(
            "cell",
            (F.array_position("__cc", F.array_max("__cc")) - 1).cast("int"),
        )
        .drop("__cc")
    )


def _kmeans_iterations(sample, n_centroids: int, iters: int, seed: int) -> list[list[float]]:
    """The numpy k-means kernel shared by the Spark trainer and the
    Spark-free oracle replica (train_centroids_replica) — any change here
    changes trained centroids on BOTH sides identically."""
    import numpy as np

    if len(sample) == 0:
        raise ValueError("k-means training set is empty — no embedding rows")
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), min(n_centroids, len(sample)), replace=False)].copy()
    sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (sn @ cn.T).argmax(1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(0)
    return [[float(x) for x in c] for c in cent]


def _train_kmeans(
    embeddings: DataFrame,
    n_centroids: int,
    train_size: int,
    iters: int,
    seed: int,
    vec_col: str,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical-ish k-means on a BOUNDED driver-side sample (train_size
    rows — at 100 TB you train on a sample regardless; the full corpus never
    leaves executors). The sample is the train_size LOWEST xxhash64(id)
    rows, id-tiebroken — a deterministic uniform draw across the whole
    corpus (TakeOrdered heap per partition, no full sort): a bare limit()
    would take the first file(s) in scan order and train centroids on one
    corpus slice, which skews cell occupancy for everything downstream.
    Hashing the 8-byte id (not the vector's string form) keeps the draw
    cheap AND replicable off-Spark (xxh64_sql.py py_hash_long), which is
    what lets the trained path be value-checked by an external oracle."""
    import numpy as np

    sample = np.array(
        [
            r[0]
            for r in embeddings.select(
                _as_double(F.col(vec_col)).alias("__v"), F.col(id_col).alias("__id")
            )
            .orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
            .limit(train_size)
            .collect()
        ]
    )
    return _kmeans_iterations(sample, n_centroids, iters, seed)


def train_centroids_replica(
    parquet_path: str,
    n_centroids: int,
    train_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spark-FREE replica of _train_kmeans for oracle construction: reads
    the embeddings parquet via DuckDB, reproduces the hash-ordered sample
    with the bit-exact python XXH64 (py_hash_long == Spark xxhash64 on a
    LONG column), and runs the shared numpy kernel — so the returned
    centroids are literal-for-literal what ivf_topk trains on the same
    data, without a SparkSession."""
    import duckdb
    import numpy as np

    from opentsdb_spark.pipeline.xxh64_sql import py_hash_long

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {id_col}, {vec_col}::DOUBLE[] FROM read_parquet(?)",
        [parquet_path],
    ).fetchall()
    rows.sort(key=lambda r: (py_hash_long(int(r[0]), 42), r[0]))
    sample = np.array([r[1] for r in rows[:train_size]])
    return _kmeans_iterations(sample, n_centroids, iters, seed)


def _subdiv_sig_udf(planes: list[list[float]]):
    """Packed sign signature over the subdivision planes (bit 0 = most
    significant, matching the sig*2+bit fold it replaces): one V @ P^T per
    Arrow batch."""

    @F.pandas_udf("long")
    def sig(vs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        V = np.asarray([np.asarray(v, np.float64) for v in vs], np.float64)
        P = np.asarray(planes, np.float64)
        S = (V @ P.T) >= 0
        weights = (1 << np.arange(len(planes))[::-1]).astype("int64")
        return pd.Series((S * weights).sum(1).astype("int64"))

    return sig


def _subdivide_cells(
    assigned: DataFrame,
    embeddings: DataFrame,
    dim: int,
    max_cell: int | None,
    seed: int,
) -> DataFrame:
    """Quadratic-kernel guard shared by semdedup and knn_graph: pair work
    per cell is |cell|^2, so a cell past ``max_cell`` is SUBDIVIDED by
    extra random-hyperplane sign bits (ceil(log2(size/max_cell)) bits,
    deterministic planes disjoint from the ANN tables) before the pairwise
    kernel — adds the ``__sub`` subcell column. Proper SemDeDup raises
    n_centroids with the corpus (the paper runs ~100k clusters); the cap
    is the safety net when centroids are fixed — pairs never cross a
    subcell, the standard LSH recall trade (measured: 30x-replicated
    sf0.1 at 8 fixed cells went 136s -> bounded without it)."""
    assigned = assigned.withColumn("__sub", F.lit(0))
    # cheap pre-gate: a metadata-level row count (no UDF) skips the whole
    # probe when no cell can possibly exceed the cap
    if max_cell is not None and embeddings.count() <= max_cell:
        max_cell = None
    if max_cell is not None:
        # persisted: the size probe and the kernel otherwise each run the
        # assignment UDF over the corpus. Registered as per-thread scratch
        # so a serving layer can unpin it after the query completes.
        from pyspark.storagelevel import StorageLevel

        from opentsdb_spark.operators.groupby import _register_scratch

        assigned = _register_scratch(assigned.persist(StorageLevel.MEMORY_AND_DISK))
        sizes = {r["cell"]: r["n"] for r in
                 assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()}
        import math as _math

        bits = {c: max(0, _math.ceil(_math.log2(n / max_cell))) if n > max_cell else 0
                for c, n in sizes.items()}
        maxbits = max(bits.values(), default=0)
        if maxbits > 0:
            maxbits = min(maxbits, 16)
            planes = [
                _plane_coeffs(2_000_000, j, dim, seed)
                for j in range(maxbits)
            ]
            # ONE matmul per Arrow batch for all sign planes — the
            # expression fold (_dot per bit) is CodegenFallback: 4 bits x
            # 64 interpreted lambdas per row dominated the subdivided
            # path at 100x scale. Sign margins are ~1e-6 (the ANN
            # measurement) vs ~1e-15 reassociation noise, and subdivision
            # only exists past max_cell — the oracle gate (500 rows)
            # never enters this branch.
            sig = _subdiv_sig_udf(planes)(F.col("cv"))
            bits_map = F.create_map(*[
                F.lit(x) for kv in bits.items() for x in kv
            ])
            nb = bits_map[F.col("cell")]
            # per-cell right shift: shiftright() takes only a literal shift,
            # so divide by 2^(maxbits-nb) instead (exact: sig < 2^16)
            shifted = F.floor(
                sig.cast("double") / F.pow(F.lit(2.0), (F.lit(maxbits) - nb).cast("double"))
            ).cast("long")
            assigned = assigned.withColumn(
                "__sub", F.when(nb > 0, shifted).otherwise(F.lit(0)).cast("long")
            )
    return assigned


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
    train_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = 2048,
    bit_exact: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means the embedding
    space into cells, then drop semantic near-duplicates WITHIN each cell —
    pairwise cosine never crosses a cell boundary, so the quadratic blow-up
    is bounded by the largest cluster, not the corpus.

    Keep policy (deterministic, unlike the paper's arbitrary-one-per-group):
    a vector is removed iff some LOWER-id vector in its COMPARISON GROUP
    has cosine >= threshold to it — same keep-lowest-id convention as
    exact_dedup / minhash_lsh_pairs. The comparison group is the k-means
    cell, further subdivided by random-hyperplane sign bits when a cell
    exceeds ``max_cell`` rows (the quadratic-kernel guard): past the cap,
    pairs never cross a subcell, so near-dups split across subcells both
    survive — the standard LSH recall trade. Pass max_cell=None for exact
    within-cell semantics regardless of size. Returns one row per input
    vector: (id, cell, kept, dup_cosine) where dup_cosine is the max
    cosine to a lower-id group-mate over the threshold (null when kept).

    When the corpus exceeds max_cell this runs eager probe jobs (a row
    count and a per-cell size aggregate) and persists the assigned frame;
    the persist is registered with operators.groupby's per-thread scratch
    registry — long-running servers release it via release_scratch(),
    batch scripts with session lifetime can ignore it.

    Scale shape: assignment is a narrow map stage (centroids ride the UDF
    closure); the only shuffle is the within-cell self-join on the int cell
    key. At 100 TB you'd raise n_centroids so cells stay ~1e4 vectors (the
    paper uses ~100k clusters for ~100M docs) — pair work per cell is
    |cell|^2/2 and cells are independent tasks."""
    cent_arr = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else _train_kmeans(embeddings, n_centroids, train_size, iters, seed, vec_col,
                           id_col=id_col)
    )
    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    assigned = _assign_cells(corpus, cent_arr, "cv")
    assigned = _subdivide_cells(assigned, embeddings, len(cent_arr[0]),
                                max_cell, seed)

    # Within-cell scoring as ONE Arrow batch per cell: the pair-join form
    # (self-join on cell + per-pair cosine UDF) ships two dim-length arrays
    # per candidate pair — ~0.5 GB of Arrow traffic for a 2k-vector corpus
    # at 8 cells, measured 9x slower than this kernel. Here each cell
    # materializes its |cell| x dim block once and the O(|cell|^2) cosine
    # matrix accumulates DIM-SEQUENTIALLY (outer-product per dimension), so
    # every pair's dot/norm replays the expression fold's IEEE op order —
    # values stay bit-identical to the pairwise UDF and the DuckDB oracle.
    # Memory is O(|cell|^2) doubles per task — the SemDeDup regime (raise
    # n_centroids so cells stay ~1e4; a 1e4 cell = 800 MB transient matrix,
    # chunk the column loop if cells must grow past that). Zero-norm
    # vectors yield NaN cosines and are kept (numpy NaN comparisons are
    # false; drop zero vectors upstream as the quantized entry does).
    out_schema = f"{id_col} long, cell int, kept boolean, dup_cosine double"

    def _cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col)
        n = len(pdf)
        if n == 1:
            return pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": [True],
                "dup_cosine": [None],
            })
        V = np.asarray([np.asarray(v, np.float64) for v in pdf["cv"]])
        if bit_exact:
            dot = np.zeros((n, n))
            nn = np.zeros(n)
            for d in range(V.shape[1]):
                c = V[:, d]
                dot = dot + np.multiply.outer(c, c)
                nn = nn + c * c
        else:
            # ONE BLAS gram matrix instead of dim outer-product passes:
            # same arithmetic, ~10-30x less memory traffic per cell
            # (measured: 100x-replicated sweep 165s -> see BENCH notes).
            # FP sums reassociate, so cosines can move ~1e-15 — the
            # dim-sequential path stays behind bit_exact=True and a test
            # pins identical kept/rounded-cosine output on the fixture.
            dot = V @ V.T
            nn = np.einsum("ij,ij->i", V, V)
        with np.errstate(divide="ignore", invalid="ignore"):
            rt = np.sqrt(nn)
            cos = dot / (rt[:, None] * rt[None, :])
        below = np.tri(n, k=-1, dtype=bool)  # [j, i] True iff i < j
        masked = np.where(below, cos.T, -np.inf)
        colmax = masked.max(axis=1)  # per id: max cosine to any LOWER id
        removed = colmax >= threshold
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "cell": pdf["cell"].to_numpy(),
            "kept": ~removed,
            "dup_cosine": np.where(removed, colmax, np.nan),
        })

    out = assigned.groupBy("cell", "__sub").applyInPandas(_cell_kernel, out_schema)
    # pandas NaN -> SQL NULL for kept rows (the pair-join form produced NULL
    # via the left join; applyInPandas maps NaN to NULL already, but be
    # explicit so the contract survives an Arrow behavior change)
    return out.select(
        id_col, "cell", "kept",
        F.when(F.col("kept"), F.lit(None).cast("double")).otherwise(
            F.col("dup_cosine")
        ).alias("dup_cosine"),
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
    train_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = 2048,
    bit_exact: bool = False,
) -> DataFrame:
    """Corpus k-NN graph: each vector's top-``k`` cosine neighbors, with
    candidates bounded to the vector's k-means cell (the clustered-kNN
    standard — same cell machinery as semdedup/IVF). The graph is the
    input to density estimation, graph-based diversity selection, and
    cluster-quality audits over a training corpus; unlike the ann_* ops
    (few queries vs the corpus) this is corpus x corpus, so candidates
    MUST be bucket-bounded — an exact all-pairs kNN does not exist at
    100 TB.

    Neighbors are ranked (cosine DESC, neighbor id ASC); self-matches are
    excluded; vectors alone in their cell emit no rows. Cells past
    ``max_cell`` subdivide by hyperplane sign bits (see _subdivide_cells)
    — neighbors split across subcells are missed, the standard LSH recall
    trade; raise n_centroids with the corpus instead of leaning on the
    cap. NaN cosines (zero-norm vectors) rank last and are emitted only
    when a cell has fewer than k finite candidates.

    Scale shape: assignment is a narrow map (centroids ride the UDF
    closure); the only shuffle is the applyInPandas repartition on the
    int (cell, __sub) key; per-cell work is one |distinct| x dim matmul
    (bit-identical vectors collapse to one kernel row and expand after —
    hyperplane subdivision cannot split a clone clique, so without the
    collapse a clone-heavy cell pays |members|^2) plus an O(k)-bounded
    merge per clique; memory O(|distinct|^2 + |cell| x dim) doubles per
    task. Returns (id, nbr_id, cell, cosine, nbr_rank)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cent_arr = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else _train_kmeans(embeddings, n_centroids, train_size, iters, seed,
                           vec_col, id_col=id_col)
    )
    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    assigned = _assign_cells(corpus, cent_arr, "cv")
    assigned = _subdivide_cells(assigned, embeddings, len(cent_arr[0]),
                                max_cell, seed)

    out_schema = (f"{id_col} long, nbr_id long, cell int, "
                  "cosine double, nbr_rank int")

    def _cell_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col)
        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(
                {id_col: [], "nbr_id": [], "cell": [], "cosine": [],
                 "nbr_rank": []}
            ).astype({id_col: "int64", "nbr_id": "int64", "cell": "int32",
                      "cosine": "float64", "nbr_rank": "int32"})
        ids = pdf[id_col].to_numpy()
        V = np.asarray([np.asarray(v, np.float64) for v in pdf["cv"]])
        # Collapse bit-identical vectors before the quadratic kernel: a
        # corpus with exact-duplicate embeddings (deduped text often still
        # carries cloned vectors; replicated benchmark corpora always do)
        # otherwise pays |members|^2 for scores that are all equal to the
        # distinct-pair scores. The kernel runs on the DISTINCT rows and
        # the clone cliques expand afterwards — measured x256 pair-work
        # cut at 100x-replicated sf0.1 with the output unchanged. The
        # clique's internal cosine is the matrix DIAGONAL (same IEEE ops
        # as any other pair, ~1.0 up to rounding), never an assumed 1.0,
        # so expanded values stay bit-identical to the uncollapsed kernel.
        Vd, inv = np.unique(V, axis=0, return_inverse=True)
        nd = len(Vd)
        members = [ids[inv == j] for j in range(nd)]  # ids asc per clique
        if bit_exact:
            # dim-sequential accumulation replays the SQL fold's IEEE op
            # order — bit-identical cosines for the hash-checked oracle
            dot = np.zeros((nd, nd))
            nn = np.zeros(nd)
            for d in range(Vd.shape[1]):
                c = Vd[:, d]
                dot = dot + np.multiply.outer(c, c)
                nn = nn + c * c
        else:
            dot = Vd @ Vd.T
            nn = np.einsum("ij,ij->i", Vd, Vd)
        with np.errstate(divide="ignore", invalid="ignore"):
            rt = np.sqrt(nn)
            cos = dot / (rt[:, None] * rt[None, :])
        # rank key: NaN (zero-norm partner) sorts last; self is dropped by
        # member ID below (the diagonal block holds a member's own clique,
        # including itself)
        key = np.where(np.isnan(cos), -np.inf, cos)
        kk = min(k, n - 1)
        src, nbr, cval, rk = [], [], [], []
        for j in range(nd):
            row_key, row_cos = key[j], cos[j]
            # Walk clique blocks in key-desc order, collecting candidate
            # members until kk+1 are in hand (+ every block TIED with the
            # last collected one, so the member-id tiebreak below sees the
            # full tie group). Each block contributes at most its kk+1
            # lowest ids — later ones can never rank.
            order = np.argsort(-row_key, kind="stable")
            cid_b, ccos_b = [], []
            cnt, last_key = 0, None
            for jj in order:
                bk = row_key[jj]
                if cnt >= kk + 1 and bk != last_key:
                    break
                blk = members[jj][: kk + 1]
                cid_b.append(blk)
                ccos_b.append(np.full(len(blk), row_cos[jj]))
                cnt += len(blk)
                last_key = bk
            cid = np.concatenate(cid_b)
            ccos = np.concatenate(ccos_b)
            ckey = np.where(np.isnan(ccos), -np.inf, ccos)
            # top kk+1 by (cosine desc, id asc); per member drop itself
            # and take kk — exactly the uncollapsed per-row ordering
            sel = np.lexsort((cid, -ckey))[: kk + 1]
            cid, ccos = cid[sel], ccos[sel]
            for m in members[j]:
                take = np.nonzero(cid != m)[0][:kk]
                src.extend([m] * len(take))
                nbr.extend(cid[take])
                cval.extend(ccos[take])
                rk.extend(range(1, len(take) + 1))
        return pd.DataFrame({
            id_col: np.asarray(src, "int64"),
            "nbr_id": np.asarray(nbr, "int64"),
            "cell": np.full(len(src), pdf["cell"].iloc[0], "int32"),
            "cosine": np.asarray(cval, "float64"),
            "nbr_rank": np.asarray(rk, "int32"),
        })

    return assigned.groupBy("cell", "__sub").applyInPandas(_cell_kernel, out_schema)


def knn_density(
    embeddings: DataFrame,
    k: int = 3,
    **knn_kwargs,
) -> DataFrame:
    """k-NN density score per vector: the mean cosine to its ``k``
    nearest within-cell neighbors (knn_graph). High density = the vector
    sits in a crowded semantic region (aggressive-dedup / downsampling
    candidate); low density = isolated (outlier / rare-content candidate
    worth keeping — the data-pruning signal complementary to
    prototypicality's distance-to-centroid). Vectors alone in their cell
    have no neighbors and emit no row (undefined density, not zero).

    Scale shape: knn_graph's (one narrow assignment map + one bounded
    per-cell kernel shuffle) plus an 8-byte-key aggregation of at most
    corpus x k rows, map-side combinable."""
    g = knn_graph(embeddings, k=k, **knn_kwargs)
    id_col = g.columns[0]
    return g.groupBy(id_col, "cell").agg(
        F.avg("cosine").alias("knn_density"),
        F.count("*").cast("int").alias("n_neighbors"),
    )


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
    dim: int | None = None,
    train_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots (crawl
    N vs crawl N+1, or corpus vs incoming batch): partition the space
    with ONE shared set of k-means cells (trained on snapshot A when
    ``centroids`` is None — the reference frame), then compare per cell
      * occupancy: n_a, n_b and the share delta (share_b - share_a) —
        which regions grew or shrank;
      * direction: cosine(mean_a, mean_b) — whether the region's content
        moved even where occupancy held (NULL when either side is empty).
    A healthy recrawl shows share deltas near 0 and mean cosines near 1;
    a topic shift shows up as mass moving between cells, a pipeline
    regression (embedder change, encoding bug) as low mean cosines
    everywhere. This is the distribution-level audit run BEFORE pointwise
    dedup/curation of a new snapshot.

    Scale shape: assignment is the narrow _assign_cells map on each side;
    each side folds to (cell, count, per-dim sums) via d codegen sum()
    aggregates — map-side combinable, shuffle bounded at cells x (d+2)
    DOUBLEs however large the snapshots; the final outer join and cosine
    fold run on the n_centroids-row frame. Returns one row per observed
    cell: (cell, n_a, n_b, share_a, share_b, share_delta, mean_cosine)."""
    cent_arr = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else _train_kmeans(emb_a, n_centroids, train_size, iters, seed,
                           vec_col, id_col=id_col)
    )
    # vector width comes from the centroids themselves (like knn_graph /
    # _subdivide_cells) — an explicit dim must agree or the per-dim sum
    # columns would silently truncate / NULL-pad the mean direction
    if dim is None:
        dim = len(cent_arr[0])
    elif dim != len(cent_arr[0]):
        raise ValueError(
            f"dim={dim} does not match centroid width {len(cent_arr[0])}"
        )

    def _side(emb: DataFrame, tag: str) -> DataFrame:
        corpus = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
        assigned = _assign_cells(corpus, cent_arr, "cv")
        return assigned.groupBy("cell").agg(
            F.count("*").alias(f"n_{tag}"),
            F.array(*[F.sum(F.col("cv")[d]) for d in range(dim)]).alias(f"s_{tag}"),
        )
    a = _side(emb_a, "a")
    b = _side(emb_b, "b")
    joined = a.join(b, on="cell", how="full")
    na = F.coalesce(F.col("n_a"), F.lit(0)).cast("long")
    nb = F.coalesce(F.col("n_b"), F.lit(0)).cast("long")
    # totals over the tiny cells frame; the constant-valued non-foldable
    # partition spec avoids the WindowExec warning (see sample_fixed_n)
    wtot = Window.partitionBy(F.lit(0) * F.col("cell"))
    tot_a = F.sum(na).over(wtot)
    tot_b = F.sum(nb).over(wtot)
    ma = F.transform("s_a", lambda x: x / na.cast("double"))
    mb = F.transform("s_b", lambda x: x / nb.cast("double"))
    # dim-sequential folds (same IEEE order as the SQL oracle's k-ordered
    # accumulation up to reassociation absorbed by rounding)
    dot = F.aggregate(F.zip_with(ma, mb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = (
        lambda m: F.sqrt(F.aggregate(F.transform(m, lambda x: x * x),
                                     F.lit(0.0), lambda acc, x: acc + x))
    )
    share_a = na.cast("double") / tot_a.cast("double")
    share_b = nb.cast("double") / tot_b.cast("double")
    return joined.select(
        "cell", na.alias("n_a"), nb.alias("n_b"),
        share_a.alias("share_a"), share_b.alias("share_b"),
        (share_b - share_a).alias("share_delta"),
        F.when((na > 0) & (nb > 0), dot / (nrm(ma) * nrm(mb)))
        .alias("mean_cosine"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    train_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells + multi-probe.

    Train: k-means on a BOUNDED driver-side sample (train_size rows — at
    100 TB you train on a sample regardless; the full corpus never leaves
    executors). Assign: one broadcast join corpus x centroids, argmax dot
    via max_by — a single shuffle-free map stage plus one groupBy(id).
    Search: each query probes its ``n_probe`` nearest cells; candidates =
    union of those cells, exact cosine re-rank. Scanned fraction ~=
    n_probe/n_centroids, recall rises with n_probe — the standard IVF
    dial (Jegou et al., PAMI 2011).

    ``centroids`` skips training and quantizes against the given cell
    vectors (data-independent — lets an external oracle recompute the
    identical partition; recall depends on how well they span the data)."""
    cent_arr = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else _train_kmeans(embeddings, n_centroids, train_size, iters, seed, vec_col,
                           id_col=id_col)
    )

    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    assigned = _assign_cells(corpus, cent_arr, "cv")
    q = queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    probes = (
        q.withColumn("__qc", _cell_cosines_udf(cent_arr)(F.col("qv")))
        .select(
            query_id_col,
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.col("__qc"),
                                lambda c, i: F.struct((-c).alias("nc"), i.alias("cell")),
                            )
                        ),
                        lambda s: s["cell"],
                    ),
                    1, n_probe,
                )
            ).alias("cell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .join(F.broadcast(q), on=query_id_col)
        .withColumn("cosine", _cosine_pairs_udf()(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_stats(embeddings: DataFrame, group_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding statistics (mean L2 norm, count) — sanity/EDA op."""
    v = _as_double(F.col(vec_col))
    return (
        embeddings.withColumn("__n", _norm(v))
        .groupBy(group_col)
        .agg(F.avg("__n").alias("mean_norm"), F.count("*").alias("n"))
    )


def quantize_embeddings(embeddings: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = clamp(floor(v_i / scale + 0.5), -127, 127).

    The scale-path compression for ANN: 4 bytes/dim -> 1, cutting both the
    candidate-shuffle volume and the resident index ~4x while keeping
    cosine ranking nearly intact (dequantize q*scale on the scoring side).
    Pure column expressions — floor(x+0.5) rather than round() so every
    engine (Spark, DuckDB, numpy) agrees bit-for-bit on tie behavior.
    Zero vectors get scale=0 and all-zero codes."""
    from pyspark.sql import types as T

    # one Arrow batch per partition: the column-expression form hit
    # projection collapse — Catalyst inlined the scale subexpression
    # (array_max over a transform) into EVERY per-element lambda of the code
    # transform, turning O(dim) work into O(dim^2) interpreted ops per row
    # (measured ~2s for 2k x 64 at sf0.1; this path is ~20ms). Every step
    # (abs, max, divide, +0.5, floor, clamp) is a single exact IEEE op, so
    # codes match the expression form and the DuckDB oracle bit-for-bit.
    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("scale", T.DoubleType()),
                T.StructField("q", T.ArrayType(T.IntegerType())),
            ]
        )
    )
    def _quantize(vs: pd.Series) -> pd.DataFrame:
        import numpy as np

        n = len(vs)
        if n == 0:
            return pd.DataFrame({"scale": [], "q": []})
        V = np.asarray([np.asarray(v, np.float64) for v in vs], dtype=np.float64)
        amax = np.max(np.abs(V), axis=1)
        scale = np.where(amax > 0.0, amax / 127.0, 0.0)
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.clip(np.floor(V / safe[:, None] + 0.5), -127, 127).astype(np.int32)
        codes[scale == 0.0] = 0
        return pd.DataFrame({"scale": scale, "q": list(codes)})

    out = embeddings.select(
        F.col(id_col), _quantize(_as_double(F.col(vec_col))).alias("__qz")
    )
    return out.select(id_col, F.col("__qz.scale").alias("scale"), F.col("__qz.q").alias("q"))


def pq_codebooks(m: int = 8, k: int = 16, dim: int = 64,
                 seed: int = 42) -> list[list[list[float]]]:
    """Deterministic Gaussian product-quantization codebooks: ``m``
    subspaces of dim/m dimensions, ``k`` centroids each, drawn from the
    same seeded stream as the LSH planes / IVF cells (offset keeps them
    disjoint). Data-independent like seeded_centroids — the oracle-able
    fixed-codebook path; production swaps in per-subspace k-means exactly
    as ivf_topk swaps seeded cells for trained ones."""
    sub = dim // m
    return [
        [_plane_coeffs(3_000_000 + j * 1024 + c, 0, sub, seed)
         for c in range(k)]
        for j in range(m)
    ]


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode (Jégou et al., PAMI 2011): each vector
    becomes ``m`` one-byte-scale codes — code_j = argmin_c of the L2
    distance between the j-th subvector and codebook j's centroid c
    (first-min ties -> lowest c). The memory-scale path for
    billion-vector ANN: a 64-dim float64 vector (512 B) compresses to m
    small ints, and ADC search (pq_adc_topk) scores candidates WITHOUT
    touching the original vectors.

    One Arrow-batched narrow map; the codebooks ride the UDF closure.
    Distances fold dimension-sequentially so the codes are bit-identical
    to the SQL replica's left-to-right sums — argmin decisions, not just
    rounded outputs, hash-check cross-engine. Returns (id, codes
    array<int>)."""
    import numpy as np

    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    C = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)

    @F.pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        n = len(vs)
        if n == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(v, np.float64) for v in vs])
        codes = np.empty((n, m), np.int32)
        for j in range(m):
            S = V[:, j * sub:(j + 1) * sub]
            dist = np.zeros((n, k))
            for d in range(sub):
                diff = S[:, d][:, None] - C[j, :, d][None, :]
                dist = dist + diff * diff
            codes[:, j] = np.argmin(dist, axis=1)  # first min = lowest c
        return pd.Series(list(codes))

    return embeddings.select(
        F.col(id_col), _enc(_as_double(F.col(vec_col))).alias("codes"))


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus: per query,
    the m x k table dtab[j][c] = ||q_subj - C_jc||^2 is computed ONCE on
    the (bounded, broadcast) query side, and each corpus row scores as
    m table lookups on its codes — the original vectors never load, the
    scan reads m ints per vector, and ranking is (adc asc, id asc).

    100 TB shape: the corpus side is the codes frame only (m ints per
    row); queries + their distance tables broadcast; the per-row score
    is m codegen element_at lookups. The top-k is a TREE reduction: a
    partition-local partial top-k (one Arrow pass, vectorized grouped
    head-k per batch) bounds the shuffle at partitions x queries x k
    narrow rows, and only that bounded frame enters the final per-query
    rank window — the corpus never sorts through a single per-query
    task, unlike the brute-force exact baseline. Returns (query_id,
    vec_id, adc, rank)."""
    m = len(codebooks)
    qt = _pq_query_tables(queries, codebooks, query_vec_col, query_id_col)
    return _adc_rank(codes.crossJoin(F.broadcast(qt)), m, k,
                     id_col, query_id_col)


def _pq_query_tables(queries: DataFrame, codebooks, query_vec_col: str,
                     query_id_col: str, extra: tuple = ()) -> DataFrame:
    """(query_id, __dt0..__dt{m-1}) — the per-query ADC distance tables,
    each a k-wide array folded dimension-sequentially (the IEEE order the
    encode kernel and the SQL replica share).

    One Arrow UDF, not an m x k x sub codegen expression tree: the
    expression form put ~1000 nodes through Catalyst, and the OPTIMIZER
    cost (~1 s per action on the composed join+window plan, driver-side)
    dwarfed the query-bounded execution. The numpy fold accumulates
    d-sequentially per cell — bit-identical to the expression form and
    the SQL replica."""
    import numpy as np

    m, nc, sub = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    C = np.asarray(codebooks, dtype=np.float64)  # (m, nc, sub)

    @F.pandas_udf("array<array<double>>")
    def _tables(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            V = np.asarray(v, np.float64)
            dts = np.zeros((m, nc))
            for j in range(m):
                acc = np.zeros(nc)
                for d in range(sub):
                    diff = V[j * sub + d] - C[j, :, d]
                    acc = acc + diff * diff
                dts[j] = acc
            out.append(list(dts))
        return pd.Series(out)

    qt = queries.select(
        F.col(query_id_col), *extra,
        _tables(_as_double(F.col(query_vec_col))).alias("__dts"),
    )
    return qt.select(
        query_id_col, *extra,
        *[F.element_at("__dts", j + 1).alias(f"__dt{j}") for j in range(m)],
    )


def _adc_rank(pairs: DataFrame, m: int, k: int, id_col: str,
              query_id_col: str) -> DataFrame:
    """ADC score + tree top-k over a (query_id, id, codes, __dt*) pair
    frame: m codegen table lookups per row, a partition-local partial
    top-k (vectorized grouped head-k per Arrow batch, bounding the
    shuffle at partitions x queries x k narrow rows), then the final
    per-query rank window over that bounded frame only."""
    from pyspark.sql import Window

    score = F.lit(0.0)
    for j in range(m):
        score = score + F.element_at(
            F.col(f"__dt{j}"),
            F.element_at(F.col("codes"), j + 1) + 1)
    scored = pairs.withColumn("adc", score).select(query_id_col, id_col, "adc")
    out_schema = f"{query_id_col} long, {id_col} long, adc double"

    def _partial_topk(batches):
        carry = None
        for pdf in batches:
            cur = pd.concat([carry, pdf]) if carry is not None else pdf
            cur = cur.sort_values([query_id_col, "adc", id_col],
                                  kind="mergesort")
            carry = cur.groupby(query_id_col, sort=False).head(k)
        if carry is not None and len(carry):
            yield carry

    part = scored.mapInPandas(_partial_topk, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (
        part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc", "rank")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: the billion-vector ANN architecture (Jégou et al., PAMI
    2011) assembled from the two halves this module already ships —
    coarse k-means cells prune the corpus to ~n_probe/n_centroids of its
    cells, and PQ/ADC scores the survivors from their codes. The resident
    index is (id, cell, m codes) — a few bytes per vector; neither the
    original vectors nor any candidate floats load at query time.

    Approximations compose: cell recall (raise n_probe) x ADC distance
    distortion (raise m / train codebooks) — both standard dials. Ranks
    by (adc asc, id asc).

    100 TB shape: assignment and encode are narrow maps off one scan;
    the query side (probes + distance tables) broadcasts; candidates =
    one equi-join on the int cell key; the top-k is _adc_rank's tree
    reduction. Returns (query_id, vec_id, adc, rank)."""
    books = codebooks if codebooks is not None else pq_codebooks(
        m=8, k=16, dim=dim, seed=seed)
    cent_arr = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None else seeded_centroids(n_centroids, dim, seed)
    )
    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("cv"))
    index = _assign_cells(corpus, cent_arr, "cv").select(id_col, "cell") \
        .join(pq_encode(embeddings, books, vec_col=vec_col, id_col=id_col),
              on=id_col)
    q = queries.select(F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv"))
    probes = (
        q.withColumn("__qc", _cell_cosines_udf(cent_arr)(F.col("qv")))
        .select(
            query_id_col,
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.col("__qc"),
                                lambda c, i: F.struct((-c).alias("nc"),
                                                      i.alias("cell")),
                            )
                        ),
                        lambda s: s["cell"],
                    ),
                    1, n_probe,
                )
            ).alias("cell"),
        )
    )
    qt = _pq_query_tables(queries, books, vec_col, query_id_col)
    pairs = (
        index.join(F.broadcast(probes), on="cell")
        .join(F.broadcast(qt), on=query_id_col)
    )
    return _adc_rank(pairs, len(books), k, id_col, query_id_col)


def dequantized_view(quant: DataFrame, vec_col: str = "q") -> DataFrame:
    """Reconstruct double vectors (q * scale) for scoring — composes with
    brute_force_topk/lsh_topk so the quantized index reuses the exact
    search operators."""
    return quant.withColumn(
        "embedding",
        F.transform(F.col(vec_col), lambda x: x.cast("double") * F.col("scale")),
    ).drop(vec_col, "scale")


def prototypicality(
    embeddings: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    centroids: list[list[float]] | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SSL-prototypes / D4-style prototypicality score (Sorscher et al.,
    arXiv:2206.14486; Tirumala et al., arXiv:2308.12284): cosine of each
    vector to its assigned cluster centroid, plus the vector's rank within
    its cluster (rank 1 = most prototypical). Data pruning keeps the HARD
    examples (low rank from the bottom) on big corpora and the easy ones on
    small — this emits the raw score/rank so either policy is a filter.

    Assignment + score is one narrow map stage (_cell_cosines_udf computes
    all centroid cosines per Arrow batch; argmax picks the cell, max IS the
    score — no corpus x centroid join). The within-cell rank is the only
    shuffle: cells partition the corpus, rank sorts inside each cell. At
    100 TB you'd raise n_centroids so cells stay bounded (same knob as
    semdedup) — the sort is per-cell, never global.

    Pass ``centroids`` (e.g. from _train_kmeans) for trained cells;
    defaults to the deterministic seeded hyperplane centroids so the whole
    path is data-independent and SQL-replayable. Returns
    (id, cell, proto = cosine to own centroid, cell_rank)."""
    cents = (
        [[float(x) for x in c] for c in centroids]
        if centroids is not None
        else seeded_centroids(n_centroids, dim, seed)
    )
    corpus = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    # NaN cosines (zero-norm vectors: 0/0 on both engines) pin to -2.0 —
    # below any real cosine — so cell assignment and rank are deterministic
    # and engine-independent instead of riding NaN-ordering differences
    cc = F.transform(
        _cell_cosines_udf(cents)(F.col("__v")),
        lambda x: F.nanvl(x, F.lit(-2.0)),
    )
    scored = (
        corpus.withColumn("__cc", cc)
        .select(
            id_col,
            (F.array_position("__cc", F.array_max("__cc")) - 1).cast("int").alias("cell"),
            F.array_max("__cc").alias("proto"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy(F.col("proto").desc(), F.col(id_col).asc())
    return scored.withColumn("cell_rank", F.row_number().over(w).cast("long"))


def covariance_matrix(
    embeddings: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Population covariance of the embedding cloud, E[x_i x_j] - mu_i mu_j,
    as (i, j, cov) rows for i <= j — the input PCA / ZCA-whitening needs.

    Shape at 100 TB: one mapInPandas pass emits PER-ARROW-BATCH moment
    partials (count, d sums, d*d outer-product sums via one numpy matmul);
    partials posexplode to (idx, partial) and sum per idx — shuffle volume
    is #batches x d^2 rows, independent of corpus size, and the final
    combine runs on a d^2-row frame. No n x d^2 explode, no per-row UDF.
    The d x d result is tiny even at d = 4096; eigendecomposition of it is
    a driver/numpy step (pca_components below)."""
    import numpy as np

    v = _as_double(F.col(vec_col))
    rows = embeddings.select(v.alias("__v"))

    def _moments(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(x, np.float64) for x in pdf["__v"]], np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(V)],
                    "s": [V.sum(0).tolist()],
                    "ss": [(V.T @ V).reshape(-1).tolist()],
                }
            )

    parts = rows.mapInPandas(_moments, "n long, s array<double>, ss array<double>")
    # single tiny barrier frames: #batches rows in, d^2 (+d) rows out
    from opentsdb_spark.pipeline.dedup import _persist_small

    parts = _persist_small(parts, True)
    n = parts.agg(F.sum("n").alias("n"))
    sums = (
        parts.select(F.posexplode("s").alias("i", "sv"))
        .groupBy("i").agg(F.sum("sv").alias("s"))
    )
    sq = (
        parts.select(F.posexplode("ss").alias("idx", "ssv"))
        .groupBy("idx").agg(F.sum("ssv").alias("ss"))
        .select(
            (F.col("idx") / dim).cast("int").alias("i"),
            (F.col("idx") % dim).cast("int").alias("j"),
            "ss",
        )
        .where(F.col("i") <= F.col("j"))
    )
    mi = sums.select(F.col("i"), F.col("s").alias("si"))
    mj = sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    return (
        sq.join(mi, on="i").join(mj, on="j").crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("ss") / F.col("n")
             - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))).alias("cov"),
        )
    )


def pca_components(cov_rows, dim: int = 64, q: int = 8):
    """Top-q principal axes from covariance_matrix() output: rebuild the
    symmetric d x d matrix driver-side (d^2 rows is kilobytes), numpy
    eigendecomposition, return (components [q x d], explained_variance [q]).
    Sign convention: each component's largest-|coefficient| entry is made
    positive, so the basis is deterministic across BLAS builds."""
    import numpy as np

    C = np.zeros((dim, dim))
    for r in cov_rows.collect() if hasattr(cov_rows, "collect") else cov_rows:
        C[r["i"]][r["j"]] = C[r["j"]][r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:q]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps.tolist(), vals[order].tolist()


def pca_replica(parquet_path: str, dim: int = 64, q: int = 8,
                vec_col: str = "embedding"):
    """Spark-free replica of covariance_matrix() -> pca_components() for
    oracle construction (the trained-IVF pattern, train_centroids_replica
    above): numpy population covariance straight off the parquet file,
    then the SAME pca_components eigh + sign-convention code path, so the
    returned axes match the distributed pipeline to summation-order FP
    noise (~1e-12 — far inside the catalog's 1e-4 rounding).

    Returns (components [q x dim], explained_variance [q])."""
    import numpy as np
    import pyarrow.parquet as pq

    col = pq.read_table(parquet_path, columns=[vec_col]).column(vec_col)
    V = np.asarray([np.asarray(v.as_py(), np.float64) for v in col], np.float64)
    n = len(V)
    mu = V.sum(0) / n
    C = (V.T @ V) / n - np.outer(mu, mu)
    rows = [{"i": i, "j": j, "cov": C[i, j]}
            for i in range(dim) for j in range(i, dim)]
    return pca_components(rows, dim=dim, q=q)


def pca_project(
    embeddings: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each embedding onto fixed principal axes: one Arrow-batched
    matmul per batch, a narrow map stage (components ride the closure like
    the ANN centroids). Returns (id, proj array<double>[q])."""
    import numpy as np

    Cm = [[float(x) for x in c] for c in components]

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray([np.asarray(x, np.float64) for x in vs], np.float64)
        P = V @ np.asarray(Cm, np.float64).T
        return pd.Series([p.tolist() for p in P])

    return embeddings.select(F.col(id_col), proj(_as_double(F.col(vec_col))).alias("proj"))


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining: for each query vector, the ``k`` most
    cosine-similar corpus vectors carrying a DIFFERENT label — the standard
    negative-selection step when building contrastive / embedding training
    pairs (hardest negatives teach the most).

    ``queries`` defaults to the corpus itself (self-matches are excluded by
    the label predicate only when labels differ — a query is never its own
    negative since it shares its own label). Returns
    (query_id, vec_id, neg_label, cosine, rank).

    Scale shape: identical to ``brute_force_topk`` — the query side
    broadcasts with its labels, the corpus never shuffles, the label
    predicate prunes candidates BEFORE the per-query top-k window, and
    scoring is the same Arrow-batched cosine kernel. For corpus-x-corpus
    mining at 100 TB, feed ``queries`` from an LSH/IVF candidate join
    (lsh_topk/ivf_topk) instead of the full cross product.
    """
    corpus = embeddings.select(
        F.col(id_col),
        F.col(label_col).alias("neg_label"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    if queries is None:
        queries = embeddings.select(
            F.col(id_col).alias(query_id_col), F.col(label_col), F.col(vec_col))
    q = queries.select(
        F.col(query_id_col),
        F.col(label_col).alias("q_label"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("neg_label") != F.col("q_label"))
        .withColumn("cosine", _cosine_pairs_udf()(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "neg_label", "cosine", "rank")
    )
