"""Benchmark harness — runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentsdb_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "flagship",
    "tsdb_ds_10m_avg",
    "tsdb_agg_sum_aligned_1h",
    "tsdb_agg_zimsum_by_user",
    "tsdb_rate",
    "tsdb_filter_not_literal_or",
    "tsdb_last",
    "gexp_sumseries",
    "exp_intersection_arith",
    "rollup_avg_rewrite_2h",
    "hist_p95_daily",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_bruteforce_top5",
    "ann_lsh_top5",
    "text_quality",
    "text_vocab_top50",
    "multimodal_features",
    "multimodal_resize",
    "ann_quantized_top5",
    "ingest_put_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("opentsdb-spark-bench")
    from opentsdb_spark import catalog

    fns = {"flagship": catalog.flagship}
    fns.update({n: qd.fn for n, qd in catalog.CATALOG.items()})

    # one warmup to exclude JVM/session startup from per-query numbers; the
    # trivial mapInPandas also spawns the Python worker pool (reused for the
    # whole session) so the first Arrow-UDF query isn't charged ~3s of
    # worker-fork cost that amortizes to zero in steady state
    catalog.flagship(spark, sf_dir).count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in fns:
            continue
        t0 = time.time()
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
