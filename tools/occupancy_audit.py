"""Candidate-growth audit for the banded/bucketed pair family.

The scale sweeps (tools/scale_check.py) flag the pair generators as the
fastest-growing queries at 100x data — but the replica is built by
CLONING every document K times, so part of that growth can be
output-truthful (a replicated corpus genuinely contains K*(K-1)/2
within-clique pairs per duplicated item) rather than a bucket-skew
pathology. This tool separates the two by measuring, at 1x and Kx:

  * per band-bucket / k-means-cell OCCUPANCY (rows, distinct hash
    values, max/median/p99) — skew that the hot-bucket cap should bite;
  * rep-level candidate work (sum over buckets of nd*(nd-1)/2 distinct-
    hash pairs; sum of |cell|^2 for the quadratic kernels);
  * OUTPUT pair counts — the floor any correct engine must pay.

If candidate work grows ~ output growth, the wall ratio is candidate-
truthful and the plan is already the one you'd want; if candidate work
outgrows output, the bucket cap / more bands are the lever.

    python tools/occupancy_audit.py [big_dir] [out_json]

big_dir defaults to /tmp/scale_check_sf100x (build with scale_check).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opentsdb_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"


def _occupancy(df, keys: list[str], val: str) -> dict:
    """Occupancy stats of `val` values grouped by `keys`: rows + distinct
    values per bucket, with distribution stats over buckets."""
    per = df.groupBy(*keys).agg(
        F.count("*").alias("rows"),
        F.countDistinct(val).alias("nd"),
    )
    stats = per.agg(
        F.count("*").alias("n_buckets"),
        F.max("rows").alias("max_rows"),
        F.max("nd").alias("max_nd"),
        F.expr("percentile_approx(rows, 0.5)").alias("med_rows"),
        F.expr("percentile_approx(rows, 0.99)").alias("p99_rows"),
        # rep-level candidate pairs: nd*(nd-1)/2 per bucket (upper bound
        # across bands; the real join dedups cross-band repeats)
        F.sum(F.col("nd") * (F.col("nd") - 1) / 2).alias("cand_pairs_ub"),
    ).collect()[0]
    return {k: (int(v) if v is not None else None)
            for k, v in stats.asDict().items()}


def _banded(hashes, hash_col: str):
    return hashes.select(
        hash_col,
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(hash_col, b * 16).bitwiseAND(F.lit(0xFFFF))
                .alias("bh"))
            for b in range(4)])).alias("bb"),
    ).select(hash_col, "bb.band", "bb.bh")


def audit_dhash(spark, sf_dir: str) -> dict:
    from opentsdb_spark.catalog import _IMG_H, _IMG_W, _docs
    from opentsdb_spark.pipeline.multimodal import (
        dhash_dup_pairs, dhash_images, docs_as_raw_images)

    media = docs_as_raw_images(_docs(spark, sf_dir), _IMG_W, _IMG_H)
    hashes = dhash_images(media).where(F.col("dhash").isNotNull()) \
        .select("media_id", "dhash").localCheckpoint()
    occ = _occupancy(_banded(hashes, "dhash"), ["band", "bh"], "dhash")
    occ["n_items"] = hashes.count()
    occ["clique_max"] = hashes.groupBy("dhash").count() \
        .agg(F.max("count")).collect()[0][0]
    t0 = time.time()
    occ["out_pairs"] = dhash_dup_pairs(media, max_hamming=6).count()
    occ["out_wall_s"] = round(time.time() - t0, 2)
    # clone-class form (round 12): output linear in classes — the member
    # k^2 mass rides in n_pairs instead of rows
    from opentsdb_spark.pipeline.multimodal import dhash_class_pairs
    t0 = time.time()
    occ["out_class_pairs"] = dhash_class_pairs(media, max_hamming=6).count()
    occ["out_class_wall_s"] = round(time.time() - t0, 2)
    return occ


def audit_audio(spark, sf_dir: str) -> dict:
    from opentsdb_spark.catalog import _AUD_IN, _AUD_N, _docs
    from opentsdb_spark.pipeline.multimodal import (
        audio_dup_pairs, audio_fingerprint, docs_as_raw_audio)

    media = docs_as_raw_audio(_docs(spark, sf_dir), _AUD_N, _AUD_IN)
    fp = audio_fingerprint(media).where(F.col("afp") != 0) \
        .select("media_id", "afp").localCheckpoint()
    occ = _occupancy(_banded(fp, "afp"), ["band", "bh"], "afp")
    occ["n_items"] = fp.count()
    occ["clique_max"] = fp.groupBy("afp").count() \
        .agg(F.max("count")).collect()[0][0]
    t0 = time.time()
    occ["out_pairs"] = audio_dup_pairs(media, max_hamming=3).count()
    occ["out_wall_s"] = round(time.time() - t0, 2)
    from opentsdb_spark.pipeline.multimodal import audio_class_pairs
    t0 = time.time()
    occ["out_class_pairs"] = audio_class_pairs(media, max_hamming=3).count()
    occ["out_class_wall_s"] = round(time.time() - t0, 2)
    return occ


def audit_knn(spark, sf_dir: str) -> dict:
    from opentsdb_spark.catalog import _emb
    from opentsdb_spark.pipeline.similarity import (
        _as_double, _assign_cells, _subdivide_cells, knn_graph,
        seeded_centroids)

    emb = _emb(spark, sf_dir)
    cents = seeded_centroids(16, 64)
    corpus = emb.select(F.col("vec_id"), _as_double(F.col("embedding")).alias("cv"))
    assigned = _subdivide_cells(_assign_cells(corpus, cents, "cv"),
                                emb, 64, 2048, 42)
    per = assigned.groupBy("cell", "__sub").agg(
        F.count("*").alias("n"),
        # the kernel collapses bit-identical vectors before the quadratic
        # score, so its true cost per subcell is nd^2, not n^2
        F.countDistinct("cv").alias("nd"),
    )
    stats = per.agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_rows"),
        F.expr("percentile_approx(n, 0.5)").alias("med_rows"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_rows"),
        F.sum(F.col("n") * F.col("n")).alias("member_pair_work"),
        F.sum(F.col("nd") * F.col("nd")).alias("pair_work"),
    ).collect()[0]
    occ = {k: (int(v) if v is not None else None)
           for k, v in stats.asDict().items()}
    occ["n_items"] = corpus.count()
    t0 = time.time()
    occ["out_pairs"] = knn_graph(emb, k=3, centroids=cents,
                                 bit_exact=True).count()
    occ["out_wall_s"] = round(time.time() - t0, 2)
    return occ


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_check_sf100x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("occupancy-audit")
    report = {}
    for name, fn in (("dhash", audit_dhash), ("audio", audit_audio),
                     ("knn", audit_knn)):
        report[name] = {"base": fn(spark, BASE), "big": fn(spark, big)}
        b, g = report[name]["base"], report[name]["big"]
        cand_key = "cand_pairs_ub" if "cand_pairs_ub" in b else "pair_work"
        growth = {
            "items": round(g["n_items"] / max(b["n_items"], 1), 1),
            "candidates": round(g[cand_key] / max(b[cand_key], 1), 1),
            "out_pairs": round(g["out_pairs"] / max(b["out_pairs"], 1), 1),
            "wall": round(g["out_wall_s"] / max(b["out_wall_s"], 1e-9), 1),
        }
        report[name]["growth"] = growth
        print(f"{name}: items x{growth['items']} candidates "
              f"x{growth['candidates']} out_pairs x{growth['out_pairs']} "
              f"wall x{growth['wall']}")
        print(f"  base: {b}")
        print(f"  big:  {g}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
