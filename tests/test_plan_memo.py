"""Pin the catalog query-plan memo contract (catalog.py `_memo_plan`).

Safety invariant: every name in `_PURE_PLAN_QUERIES` must be PURE PLAN
CONSTRUCTION — building the DataFrame submits ZERO Spark jobs — so the
memoized object is a logical plan, never data. Anything that collects,
counts, checkpoints, trains or streams during build (the CC fixtures,
bloom training, streaming gates) embeds job output in what it returns and
must stay excluded. tools/audit_plan_purity.py generates the list; this
test re-audits it inside the suite so drift in a builder (a new count()
slipped into construction) fails CI instead of silently caching results.

Functional contract (mirrors the load_table/load_points memos pinned in
test_driver_tables.py): same session + unchanged tables -> same plan
object; OPENTSDB_SPARK_NO_PLAN_MEMO=1 -> fresh build; rewriting any table
in sf_dir changes the mtime stamp -> fresh build, never stale results; a
memo hit returns the same ROWS as a fresh build (plan identity, data
recomputed per execution).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from opentsdb_spark import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _next_job_id(sc) -> int:
    val = sc._jsc.sc().dagScheduler().nextJobId()
    return val if isinstance(val, int) else val.get()


def _wrapped_fn(name):
    fn = catalog.flagship if name == "flagship" else catalog.CATALOG[name].fn
    return getattr(fn, "__wrapped__", fn)


def test_every_memoized_query_builds_with_zero_jobs(spark):
    """The audit invariant, re-run in-suite: each memoized builder submits
    zero jobs on BOTH of two consecutive builds (the second catches
    builders whose first call populates a shared memo that itself ran
    jobs — such a plan would embed job output and must not be cached)."""
    for q in spark.streams.active:  # a lingering stream would tick jobs
        q.stop()
    # table-plan warmup: the session's FIRST load of a table can submit one
    # footer/metadata job that belongs to load_table's memo contract, not
    # to whichever query builds first (see tools/audit_plan_purity.py)
    from opentsdb_spark.sources.points import load_table
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, t)
    sc = spark.sparkContext
    dirty = {}
    for name in sorted(catalog._PURE_PLAN_QUERIES | {"flagship"}):
        fn = _wrapped_fn(name)
        jobs = []
        for _ in range(2):
            j0 = _next_job_id(sc)
            fn(spark, SF_DIR)
            jobs.append(_next_job_id(sc) - j0)
        if any(jobs):
            dirty[name] = jobs
    assert not dirty, (
        f"builders in _PURE_PLAN_QUERIES ran Spark jobs during plan "
        f"construction — memoizing them would cache job output, not a "
        f"plan; drop them from the frozenset or fix the builder: {dirty}"
    )


def test_memo_hit_same_plan_object_and_env_disable(spark, monkeypatch):
    monkeypatch.delenv("OPENTSDB_SPARK_NO_PLAN_MEMO", raising=False)
    for name in ("tsdb_last", "text_quality", "flagship"):
        fn = (catalog.flagship if name == "flagship"
              else catalog.CATALOG[name].fn)
        a = fn(spark, SF_DIR)
        b = fn(spark, SF_DIR)
        assert a is b, f"{name}: same session + unchanged tables must hit"
    monkeypatch.setenv("OPENTSDB_SPARK_NO_PLAN_MEMO", "1")
    c = catalog.CATALOG["tsdb_last"].fn(spark, SF_DIR)
    d = catalog.CATALOG["tsdb_last"].fn(spark, SF_DIR)
    assert c is not d, "env kill-switch must force fresh builds"


def test_memo_hit_resets_session_confs(spark):
    """A hit skips load_table, which (re)sets three session confs the
    engine depends on — the wrapper must restore them."""
    df = catalog.CATALOG["tsdb_last"].fn(spark, SF_DIR)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    hit = catalog.CATALOG["tsdb_last"].fn(spark, SF_DIR)
    assert hit is df
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_memo_rows_identical_to_fresh_build(spark):
    """A hit is a PLAN, not data: executing it recomputes from parquet and
    matches a fresh (memo-bypassed) build row-for-row."""
    name = "tsdb_suggest_metrics"
    memo_df = catalog.CATALOG[name].fn(spark, SF_DIR)
    memo_df = catalog.CATALOG[name].fn(spark, SF_DIR)  # guaranteed hit path
    fresh_df = _wrapped_fn(name)(spark, SF_DIR)
    assert sorted(map(tuple, memo_df.collect())) == \
        sorted(map(tuple, fresh_df.collect()))


def test_memo_mtime_invalidation(spark, tmp_path):
    """Rewriting ANY table in sf_dir (overwrite recreates the directory,
    bumping its mtime) must drop the entry: next call re-builds and sees
    the new data — never a stale plan over vanished files."""
    sf_dir = str(tmp_path / "sf")
    shutil.copytree(SF_DIR, sf_dir)
    name = "uid_metrics_listing"
    fn = catalog.CATALOG[name].fn
    df1 = fn(spark, sf_dir)
    assert fn(spark, sf_dir) is df1
    before = {r["name"] for r in df1.collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    kept = sorted(before)[:2]
    # materialize BEFORE the overwrite — Spark cannot lazily read a path
    # it is overwriting
    rows = ev.where(F.col("event_type").isin(kept)).limit(2000).collect()
    spark.createDataFrame(rows, ev.schema) \
        .write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    df2 = fn(spark, sf_dir)
    assert df2 is not df1, "rewritten table must invalidate the memo"
    after = {r["name"] for r in df2.collect()}
    assert after == {r["event_type"] for r in rows} != before


def test_frozenset_names_exist(spark):
    missing = catalog._PURE_PLAN_QUERIES - set(catalog.CATALOG) - {"flagship"}
    assert not missing


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
