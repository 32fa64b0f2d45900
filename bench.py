"""Benchmark harness — runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}.

Load-immunity: wall-clock on a shared machine can inflate 3-8x under
builder/driver contention (it did in BENCH_r04), so each query runs
``--repeat N`` times (default 2, env SPARK_GRAFT_BENCH_REPEAT) and reports
the BEST wall time, plus the per-query CPU-seconds actually consumed by
this process tree (driver + JVM + reused Python workers, read from
/proc/*/stat deltas). CPU time barely moves under contention, so a loaded
run is detectable: wall >> cpu/ncores means the box was busy, not the
engine slow.
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
    "tsdb_agg_sum_raw_full",
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
    "dedup_semantic",
    "text_paragraph_dedup",
    "ann_bruteforce_top5",
    "ann_lsh_top5",
    "text_quality",
    "text_vocab_top50",
    "multimodal_features",
    "multimodal_resize",
    "ann_quantized_top5",
    "ingest_put_roundtrip",
]

_TICK = os.sysconf("SC_CLK_TCK")


def _tree_cpu_seconds() -> float:
    """Total CPU seconds (user+sys) consumed so far by this process and all
    its live descendants — the Spark JVM and its reused Python workers.
    Reads /proc/<pid>/stat; processes that already exited are missed, but
    the JVM and the Arrow worker pool live for the whole session."""
    me = os.getpid()
    procs: dict[int, tuple[int, float]] = {}  # pid -> (ppid, cpu_sec)
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat") as f:
                stat = f.read()
        except OSError:
            continue
        # field 2 (comm) may contain spaces/parens — split after the last ')'
        rest = stat.rsplit(")", 1)[1].split()
        # rest[1]=ppid (field 4), rest[11]=utime (14), rest[12]=stime (15)
        procs[int(ent)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / _TICK)

    total, frontier = 0.0, {me}
    while frontier:
        nxt = set()
        for pid, (ppid, cpu) in procs.items():
            if ppid in frontier:
                nxt.add(pid)
        for pid in frontier:
            if pid in procs:
                total += procs[pid][1]
        procs = {p: v for p, v in procs.items() if p not in frontier}
        frontier = nxt
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    repeat = max(1, repeat)

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
    cpu: dict[str, float] = {}
    for name in HEADLINE:
        if name not in fns:
            continue
        best_wall, best_cpu = float("inf"), float("inf")
        for _ in range(repeat):
            c0, t0 = _tree_cpu_seconds(), time.time()
            fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall, dcpu = time.time() - t0, _tree_cpu_seconds() - c0
            if wall < best_wall:
                best_wall, best_cpu = wall, dcpu
        timings[name] = round(best_wall, 3)
        cpu[name] = round(best_cpu, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cpu_queries": cpu,
        "cpu_total": round(sum(cpu.values()), 3),
        "repeat": repeat,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
