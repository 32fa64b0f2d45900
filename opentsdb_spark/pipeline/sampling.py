"""Deterministic sampling / dataset-split operators for training pipelines.

A 100-TB corpus cannot be split with ``df.randomSplit`` (non-reproducible
across re-runs and cluster layouts) or with a shuffle-based sample. Both
operators here key every decision on a PER-ROW DETERMINISTIC hash of the
document id, so:
  * re-running the pipeline yields byte-identical splits (lineage-safe),
  * the split is a narrow map — no shuffle, no extra scan,
  * adding documents never moves an existing document between splits.

The default hash is Spark's ``xxhash64`` (seeded). For cross-engine
verification the hash is pluggable — the catalog query mirrors a pure
integer multiplicative hash (Knuth 2654435761) that evaluates identically
in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _default_hash_bucket(id_col: Column, seed: int) -> Column:
    return F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(_BUCKETS))


def knuth_hash_bucket(id_col: Column) -> Column:
    """SQL-mirrorable bucket: ((id % 100003) * 2654435761 % 1000003) % 10000.
    Pure 64-bit-safe integer arithmetic — identical in Spark, DuckDB, or any
    ANSI engine; use for oracle-checked splits, xxhash64 for production."""
    return ((id_col % 100003) * 2654435761 % 1000003) % _BUCKETS


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Assign every row to a named split by hash-bucket range.

    ``weights`` maps split name -> fraction (must sum to ~1); assignment is
    by cumulative ranges over 10k buckets in the given key order, so
    {"train": .9, "val": .05, "test": .05} puts buckets [0,9000) in train,
    [9000,9500) in val, [9500,10000) in test. Adds a ``split`` column."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fractions: dict,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash bucket
    falls below fraction*10k for its stratum value. Unlike
    ``DataFrame.sampleBy`` this is reproducible row-exact across runs and
    partitionings, and it is a pure narrow filter (predicate-pushable).
    Strata missing from ``fractions`` are dropped (fraction 0)."""
    b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), seed)
    thresh = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in (kv[0], int(round(kv[1] * _BUCKETS)))]
    )
    return docs.where(b < F.coalesce(thresh[F.col(strata_col)], F.lit(0)))
