"""Audit which catalog query builders are PURE PLAN CONSTRUCTION.

A catalog fn's build phase is "pure" when calling ``fn(spark, sf_dir)``
submits ZERO Spark jobs: nothing is collected, counted, checkpointed,
trained, or streamed while the DataFrame is constructed — the fn only
assembles a logical plan. Pure builds are safe to memoize per
(session, sf_dir, table-mtimes) under the exact ``load_table`` plan-memo
contract (a PLAN, not data: every execution still scans parquet).

Impure builds (the CC family's localCheckpoint rounds, bloom-filter
training, streaming gates, IVF centroid fits, ...) perform real data
computation during construction; memoizing those would cache RESULTS of
that computation — banned. They are excluded automatically here.

Job counting uses the DAGScheduler's monotonically increasing nextJobId
counter (delta == jobs submitted process-wide, regardless of which
thread ran them — catches streaming/foreachBatch jobs that job-group
tagging would miss). Persist registrations are recorded for information
only: ``.persist()`` is lazy and the bench's best-of-N contract already
shares persisted scratch across repeats via Spark's CacheManager
plan-substitution, so a persist during build does not disqualify.

Usage: python tools/audit_plan_purity.py [sf_dir] [--json out.json]
Prints one line per query: name, jobs during build, persists, verdict.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentsdb_spark.session import get_spark  # noqa: E402


def _next_job_id(sc) -> int:
    # private[spark] compiles to public bytecode; stable across Spark 4.x.
    # (py4j already unwraps the AtomicInteger to a plain int here)
    val = sc._jsc.sc().dagScheduler().nextJobId()
    return val if isinstance(val, int) else val.get()


def _n_persisted(sc) -> int:
    return sc._jsc.getPersistentRDDs().size()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark("plan-purity-audit")
    sc = spark.sparkContext
    from opentsdb_spark import catalog
    from opentsdb_spark.sources.points import load_table

    # Warm the table plans first: the session's FIRST load of a parquet
    # table can submit one metadata job (footer/schema listing) — that job
    # belongs to load_table's already-committed plan-memo contract, not to
    # whichever query happens to build first (measured: cold events load =
    # 1 job, flagship build after it = 0). Without this, purity verdicts
    # would depend on audit ORDER.
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t)

    fns = {"flagship": catalog.flagship}  # bench-called directly, memoized too
    fns.update({n: qd.fn for n, qd in catalog.CATALOG.items()})
    results: dict[str, dict] = {}
    for name, fn in fns.items():
        fn = getattr(fn, "__wrapped__", fn)  # bypass any plan memo
        rec: dict = {}
        for attempt in ("first", "second"):
            j0, p0 = _next_job_id(sc), _n_persisted(sc)
            try:
                fn(spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — record, keep auditing
                rec[attempt] = {"error": f"{type(e).__name__}: {e}"}
                break
            rec[attempt] = {
                "jobs": _next_job_id(sc) - j0,
                "persists": _n_persisted(sc) - p0,
            }
        # pure = ZERO jobs on BOTH builds (a second build can differ when
        # the first populated an internal shared-builder memo — require
        # both clean so the memoized entry never embeds job output)
        rec["pure"] = all(
            isinstance(rec.get(a), dict) and rec[a].get("jobs") == 0
            for a in ("first", "second")
        )
        results[name] = rec
        mark = "PURE  " if rec["pure"] else "IMPURE"
        detail = ", ".join(
            f"{a}: jobs={rec[a].get('jobs', '?')} persists={rec[a].get('persists', '?')}"
            if "error" not in rec[a] else f"{a}: {rec[a]['error'][:80]}"
            for a in ("first", "second") if a in rec
        )
        print(f"{mark} {name}: {detail}", flush=True)

    pure = sorted(n for n, r in results.items() if r["pure"])
    print(f"\n{len(pure)}/{len(results)} pure builds")
    print("_PURE_PLAN_QUERIES = frozenset({")
    for n in pure:
        print(f"    {n!r},")
    print("})")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)


if __name__ == "__main__":
    main()
