"""Distributed sketches: HyperLogLog cardinality + count-min frequency.

The canonical bounded-state operators a 100 TB corpus pass needs when the
exact answer's key space (the vocabulary, the distinct-id set) is itself
too large to shuffle:

* ``hll_registers`` / ``hll_estimate`` — HyperLogLog (Flajolet et al. 2007)
  distinct counting. Per-group state is a fixed 2^p register array; the
  register update (max of leading-zero ranks) is idempotent and map-side
  combinable, so the shuffle carries at most ``groups x 2^p`` rows no
  matter how many input rows or distinct values there are. Standard error
  ~= 1.04 / sqrt(2^p).

* ``cms_cells`` / ``cms_estimate`` — count-min sketch (Cormode &
  Muthukrishnan 2005) frequency estimation. The cell grid is ``d x w``
  counters; updates are additive (map-side combinable) and the shuffle key
  space is the grid, not the vocabulary. Point estimates are one-sided:
  ``est >= true`` always, ``est <= true + e*N/w`` with probability
  ``1 - (1/2)^d`` for N total updates.

Unlike library HLL/CMS implementations (Spark's approx_count_distinct,
DataSketches), every value here is a DETERMINISTIC integer function of the
input multiset — hashing is Spark's xxhash64 (seed 42), replicated
bit-exactly in DuckDB SQL by pipeline/xxh64_sql.py — so the catalog
value-checks registers, cells, and estimates instead of trusting an
opaque sketch blob. The only floats are the final HLL estimate's
alpha*m^2/Z fold, rounded at 1e-4 on both engines.

Reference scope note: the reference engine (opentsdb) has no sketch
surface — these extend the pipeline family (SURVEY.md "beyond the
reference" operators), hashing with the same xxhash64 the dedup family
keys on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opentsdb_spark.session import tiny_df

from opentsdb_spark.pipeline.xxh64_sql import M64, py_hash_long, py_xxh64


def _rank_expr(v, rest_bits: int):
    """HLL rank rho = (position of the highest set bit of ``v``, counted
    from the top of a ``rest_bits``-wide field) via pure integer threshold
    sums — floor(log2)+1 as SUM(v >= 2^i), identical on any engine (no
    libm, no clz builtin needed). v == 0 -> rest_bits + 1."""
    hb = None
    for i in range(rest_bits):
        t = (v >= F.lit(1 << i)).cast("int")
        hb = t if hb is None else hb + t
    return (F.lit(rest_bits) - hb + F.lit(1)).alias("rho")


def hll_registers(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """SPARSE HLL registers per group: (group_cols..., bucket, r) with one
    row per OCCUPIED bucket (r >= 1 always; empty buckets are implicit —
    hll_estimate folds them back in arithmetically, so no 2^p-row grid is
    ever materialized).

    One narrow map computes (bucket, rho) per row; the only shuffle is the
    groupBy(group, bucket) max — partial-aggregated map-side, key space
    bounded by groups x 2^p. Duplicate values are absorbed by max(), so no
    distinct (= no vocabulary-sized shuffle) ever runs. The max aggregate
    is also streaming-legal: this same frame works as a watermarked
    windowed aggregation."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    rest = 64 - p
    h = F.xxhash64(F.col(value_col))
    v = F.shiftright(h, p).bitwiseAND(F.lit((1 << rest) - 1))
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).cast("int").alias("bucket"),
            _rank_expr(v, rest),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...],
    p: int = 10,
) -> DataFrame:
    """Fold a sparse register frame into the HLL cardinality estimate:
    (group_cols..., est, v_zero, reg_sum). The 2^p - #occupied empty
    registers enter the harmonic sum as 2^0 terms and the zero count
    arithmetically — identical numbers to a dense grid without ever
    building one. alpha_m for m >= 128, with the small-range
    linear-counting correction (E <= 2.5m and empty registers present ->
    m * ln(m / V)); the 32-bit large-range correction does not apply to a
    64-bit hash."""
    m = 1 << p
    if m < 128:
        raise ValueError("estimate constants assume m >= 128 (p >= 7)")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("__zo"),
        F.count("*").alias("__occ"),
        F.sum("r").alias("reg_sum"),
    )
    v_zero = F.lit(m) - F.col("__occ")
    z = F.col("__zo") + v_zero.cast("double")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est"),
                      v_zero.alias("v_zero"), "reg_sum")


def cms_cells(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min cell grid: (r, c, cnt) with d rows x w columns. Row
    ``i``'s hash is Spark's multi-argument xxhash64(value, i::long) — the
    chained hashLong(i, seed=xxh64(value)) the SQL replica reproduces.
    Updates are plain additive counts (or ``weight_col`` sums): one narrow
    map emits d (r, c) pairs per row, and the only shuffle is the
    d*w-bounded cell aggregate."""
    if d < 1 or w < 2 or w & (w - 1):
        raise ValueError("need d >= 1 and w a power of two >= 2")
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("r"),
            F.xxhash64(F.col(value_col), F.lit(i).cast("long"))
            .bitwiseAND(F.lit(w - 1)).alias("c"),
        )
        for i in range(d)
    ])
    wcol = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    return (
        df.select(F.explode(pairs).alias("p"), wcol.alias("__w"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_probe_positions(token: str, d: int = 4, w: int = 1024) -> list[tuple[int, int]]:
    """Driver-side (r, c) positions of a probe value — py_xxh64/py_hash_long
    replicate Spark's chained xxhash64 bit-exactly (pinned in tests), so
    probes never need a Spark job."""
    h1 = py_xxh64(token.encode("utf-8")) % M64
    out = []
    for i in range(d):
        hi = py_hash_long(i, h1)
        hs = hi - M64 if hi >= M64 // 2 else hi
        out.append((i, hs & (w - 1)))
    return out


def cms_estimate(
    cells: DataFrame,
    probes: list[str],
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-estimate probe frequencies from a cell grid: (token, est) with
    est = min over rows of the probed cell. The probe table is tiny and
    broadcast; absent cells count 0 (value never seen)."""
    spark = cells.sparkSession
    probe_rows = [
        (tok, r, c) for tok in probes for r, c in cms_probe_positions(tok, d, w)
    ]
    pdf = tiny_df(spark, probe_rows, "token string, r int, c int")
    return (
        F.broadcast(pdf)
        .join(cells, on=["r", "c"], how="left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )
