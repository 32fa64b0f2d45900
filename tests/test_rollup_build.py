"""Materialized rollup storage: build -> manifest -> load -> query routing.

The reference expects an external batch job to feed its rollup tables and
registers them via the tsd.rollups.config JSON file
(src/rollup/RollupConfig.java:44-106); rollup ingest for an unconfigured
interval is rejected (src/rollup/NoSuchRollupForIntervalException.java).
Here the batch job is `build_rollup_tables` and the registry is the
rollups.json manifest; the daemon attaches it with --rollups-dir.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec
from opentsdb_spark.operators.downsample import downsample
from opentsdb_spark.plans.rollup import (
    ROLLUP_MANIFEST,
    build_rollup_tables,
    load_rollup_config,
    routed_downsample,
)
from opentsdb_spark.sources.points import series_id_col
from tests.conftest import EPOCH


def _rows(df):
    out = df.select(
        "metric", series_id_col().alias("sid"),
        F.unix_millis("ts").alias("t"), F.round("value", 6).alias("v"),
    ).collect()
    return sorted((r.metric, r.sid, r.t, r.v) for r in out)


@pytest.fixture(scope="module")
def rollup_dir(spark, fixture_points, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rollups"))
    build_rollup_tables(fixture_points, d, ["1h", "1d"])
    return d


def test_manifest_and_layout(rollup_dir, spark):
    meta = json.load(open(os.path.join(rollup_dir, ROLLUP_MANIFEST)))
    assert [e["interval"] for e in meta["intervals"]] == ["1h", "1d"]
    assert meta["intervals"][0]["interval_ms"] == 3_600_000
    # dt-partitioned directories, like the raw write_points layout
    table = os.path.join(rollup_dir, "1h")
    assert any(n.startswith("dt=") for n in os.listdir(table))
    cfg = load_rollup_config(spark, rollup_dir)
    assert [t.interval_label for t in cfg.tables] == ["1h", "1d"]
    assert "dt" in cfg.tables[0].df.columns


def test_duplicate_interval_rejected(fixture_points, tmp_path):
    with pytest.raises(ValueError, match="one rollup of each interval"):
        build_rollup_tables(fixture_points, str(tmp_path), ["1h", "1h"])


def test_routed_sum_matches_raw(spark, fixture_points, rollup_dir):
    """2h-sum answered from the 1h table == computed from raw (the rollup
    re-aggregation is exact for sum)."""
    cfg = load_rollup_config(spark, rollup_dir)
    spec = DownsampleSpec(interval_ms=7_200_000, aggregator="sum")
    routed = routed_downsample(fixture_points, cfg, spec, usage="ROLLUP_NOFALLBACK")
    raw = downsample(fixture_points, spec)
    assert _rows(routed) == _rows(raw)


def test_routed_avg_rewrite_from_disk(spark, fixture_points, rollup_dir):
    """avg = SUM/COUNT rewrite over the materialized table
    (src/core/Downsampler.java:163-221)."""
    cfg = load_rollup_config(spark, rollup_dir)
    spec = DownsampleSpec(interval_ms=3_600_000, aggregator="avg")
    routed = routed_downsample(fixture_points, cfg, spec, usage="ROLLUP_NOFALLBACK")
    raw = downsample(fixture_points, spec)
    assert _rows(routed) == _rows(raw)


def test_daemon_routes_to_materialized_table(spark, fixture_points, rollup_dir):
    """A daemon with rollup_cfg answers 1h-sum from the TABLE, not raw:
    prove it by attaching doctored rollups (values x2) and seeing doubled
    output, while rollup_raw on the same query still reads raw."""
    from opentsdb_spark.plans.rollup import RollupConfig, RollupTable
    from opentsdb_spark.tsd import TSD

    cfg = load_rollup_config(spark, rollup_dir)
    doctored = RollupConfig([
        RollupTable(t.interval_ms, t.interval_label,
                    t.df.withColumn("value", F.col("value") * 2))
        for t in cfg.tables
    ])
    tsd = TSD(spark, fixture_points, rollup_cfg=doctored)
    q = {"start": str(EPOCH), "end": str(EPOCH + 30 * 301),
         "m": "sum:1h-sum:sys.cpu.user"}
    out, _ = tsd._route("GET", "/api/query", dict(q), None)
    raw_out, _ = tsd._route(
        "GET", "/api/query",
        {**q, "m": "sum:1h-sum:rollup_raw:sys.cpu.user"}, None)
    assert out and raw_out
    dps = out[0]["dps"]
    raw_dps = raw_out[0]["dps"]
    assert set(dps) == set(raw_dps)
    for k, v in raw_dps.items():
        assert dps[k] == pytest.approx(2 * v)


def test_daemon_merges_ingested_rows(spark, fixture_points, rollup_dir):
    """Telnet-pushed rollup rows for a configured interval are served on
    the next query (the reference reads freshly-written cells from the
    same rollup table); the dt partition column is synthesized so pruning
    never drops them."""
    from opentsdb_spark.tsd import TSD

    cfg = load_rollup_config(spark, rollup_dir)
    tsd = TSD(spark, fixture_points, rollup_cfg=cfg)
    r = tsd.rollup_lines([
        f"rollup 1h:sum tsd.test.built {EPOCH} 42 host=web09",
        f"rollup 1h:count tsd.test.built {EPOCH} 1 host=web09",
    ])
    assert r["success"] == 2
    out, _ = tsd._route("GET", "/api/query", {
        "start": str(EPOCH - 60), "end": str(EPOCH + 7200),
        "m": "sum:1h-sum:tsd.test.built",
    }, None)
    [series] = out
    assert list(series["dps"].values()) == [42.0]


def test_unconfigured_daemon_never_routes(spark, fixture_points):
    """No --rollups-dir: pushed rollup rows are stored but queries scan
    raw (the reference rejects ingest for unconfigured intervals — an
    implicit sparse table must not answer ROLLUP_NOFALLBACK queries)."""
    from opentsdb_spark.tsd import TSD

    tsd = TSD(spark, fixture_points)
    tsd.rollup_lines([f"rollup 1h:sum sys.cpu.user {EPOCH} 999999 host=web01"])
    assert tsd._effective_rollup_cfg() is None
    out, _ = tsd._route("GET", "/api/query", {
        "start": str(EPOCH), "end": str(EPOCH + 3600),
        "m": "sum:1h-sum:sys.cpu.user",
    }, None)
    [series] = out
    assert 999999.0 not in series["dps"].values()


def test_cli_rollup_build(tmp_path, monkeypatch):
    """`tsdb rollup-build` end-to-end over the sf parquet tables."""
    from opentsdb_spark.cli import main

    out = str(tmp_path / "r")
    main(["rollup-build", "--out", out, "--interval", "1h"])
    meta = json.load(open(os.path.join(out, ROLLUP_MANIFEST)))
    assert meta["intervals"][0]["interval"] == "1h"


def _doctored(cfg, factor=2):
    from opentsdb_spark.plans.rollup import RollupConfig, RollupTable

    return RollupConfig([
        RollupTable(t.interval_ms, t.interval_label,
                    t.df.withColumn("value", F.col("value") * factor))
        for t in cfg.tables
    ], sla_ms=cfg.sla_ms)


def test_sla_split_old_from_table_recent_from_raw(spark, fixture_points, rollup_dir):
    """SLA straddle: buckets older than the aligned cutoff come from the
    (doctored) table, newer ones from raw (SplitRollupQuery.java,
    TsdbQuery.java:819-847)."""
    from opentsdb_spark.tsd import TSD

    cfg = _doctored(load_rollup_config(spark, rollup_dir))
    cfg.sla_ms = 3_600_000  # 1h lag
    tsd = TSD(spark, fixture_points, rollup_cfg=cfg)
    now_ms = (EPOCH + 9000) * 1000  # cutoff = EPOCH+5400s -> aligned EPOCH+3600s
    q = {"start": str(EPOCH), "end": str(EPOCH + 9001),
         "m": "sum:1h-sum:sys.cpu.user", "_now_ms": now_ms}
    out, _ = tsd._route("GET", "/api/query", dict(q), None)
    raw_out, _ = tsd._route(
        "GET", "/api/query",
        {**q, "m": "sum:1h-sum:rollup_raw:sys.cpu.user"}, None)
    dps, raw_dps = out[0]["dps"], raw_out[0]["dps"]
    assert set(dps) == set(raw_dps) and len(dps) == 3
    cut = EPOCH + 3600
    for k, v in raw_dps.items():
        expected = 2 * v if int(k) < cut else v
        assert dps[k] == pytest.approx(expected), k


def test_sla_entirely_recent_range_scans_raw(spark, fixture_points, rollup_dir):
    """start >= aligned cutoff: no split, pure raw — doctoring invisible."""
    from opentsdb_spark.tsd import TSD

    cfg = _doctored(load_rollup_config(spark, rollup_dir))
    cfg.sla_ms = 3_600_000
    tsd = TSD(spark, fixture_points, rollup_cfg=cfg)
    now_ms = (EPOCH + 9000) * 1000
    q = {"start": str(EPOCH + 3600), "end": str(EPOCH + 9001),
         "m": "sum:1h-sum:sys.cpu.user", "_now_ms": now_ms}
    out, _ = tsd._route("GET", "/api/query", dict(q), None)
    raw_out, _ = tsd._route(
        "GET", "/api/query",
        {**q, "m": "sum:1h-sum:rollup_raw:sys.cpu.user"}, None)
    assert out[0]["dps"] == raw_out[0]["dps"]


def test_sla_split_equals_raw_when_table_honest(spark, fixture_points, rollup_dir):
    """Undoctored table + SLA split == pure-raw answer (seam correctness)."""
    from opentsdb_spark.tsd import TSD

    cfg = load_rollup_config(spark, rollup_dir)
    cfg.sla_ms = 3_600_000
    tsd = TSD(spark, fixture_points, rollup_cfg=cfg)
    now_ms = (EPOCH + 9000) * 1000
    q = {"start": str(EPOCH), "end": str(EPOCH + 9001),
         "m": "sum:1h-sum:sys.cpu.user", "_now_ms": now_ms}
    out, _ = tsd._route("GET", "/api/query", dict(q), None)
    raw_out, _ = tsd._route(
        "GET", "/api/query",
        {**q, "m": "sum:1h-sum:rollup_raw:sys.cpu.user"}, None)
    for k, v in raw_out[0]["dps"].items():
        assert out[0]["dps"][k] == pytest.approx(v)


def test_filled_downsample_never_routes_to_rollup(spark, fixture_points, rollup_dir):
    """fill policies scan raw (rollup re-aggregation has no fill grid):
    the doctored table must be invisible to 1h-sum-zero."""
    from opentsdb_spark.tsd import TSD

    cfg = _doctored(load_rollup_config(spark, rollup_dir))
    tsd = TSD(spark, fixture_points, rollup_cfg=cfg)
    q = {"start": str(EPOCH), "end": str(EPOCH + 9001),
         "m": "sum:1h-sum-zero:sys.cpu.user"}
    out, _ = tsd._route("GET", "/api/query", dict(q), None)
    raw_out, _ = tsd._route(
        "GET", "/api/query",
        {**q, "m": "sum:1h-sum-zero:rollup_raw:sys.cpu.user"}, None)
    assert out[0]["dps"] == raw_out[0]["dps"]
