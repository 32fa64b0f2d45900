"""gexp / exp-v2 / topk layer tests (SURVEY.md §2.6-2.8)."""

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.model import (
    DownsampleSpec, ExpExpression, ExpJoin, ExpMetric, ExpQuery, FillPolicy, SubQuery, TagFilter,
    TSQuery,
)
from opentsdb_spark.operators import expressions as gexp
from opentsdb_spark.operators.join import evaluate_expression, series_join
from opentsdb_spark.operators.topk import highest_current, highest_max
from opentsdb_spark.plans.expquery import compile_exp_query
from opentsdb_spark.plans.planner import compile_query
from tests.conftest import EPOCH


def _grouped(spark, rows):
    """rows: (host, ts_sec_offset, value) -> grouped frame [host, ts, value]."""
    df = spark.createDataFrame(
        [(h, (EPOCH + t) * 1000, float(v)) for h, t, v in rows],
        "host string, ts_ms long, value double",
    )
    return df.select("host", F.timestamp_millis("ts_ms").alias("ts"), "value")


def test_absolute_scale_alias(spark):
    df = _grouped(spark, [("a", 0, -5), ("a", 30, 3)])
    out = gexp.absolute(df).orderBy("ts").collect()
    assert [r["value"] for r in out] == [5.0, 3.0]
    out = gexp.scale(df, -2.0).orderBy("ts").collect()
    assert [r["value"] for r in out] == [10.0, -6.0]
    out = gexp.alias_series(df, "cpu.@host.pct").select("alias").first()
    assert out["alias"] == "cpu.a.pct"


def test_time_shift_first_diff(spark):
    df = _grouped(spark, [("a", 0, 1), ("a", 30, 4), ("a", 60, 9)])
    out = gexp.time_shift(df, 3_600_000).orderBy("ts").collect()
    assert int(out[0]["ts"].timestamp()) == EPOCH + 3600
    out = gexp.first_diff(df, ("host",)).orderBy("ts").collect()
    assert [r["value"] for r in out] == [3.0, 5.0]


def test_moving_average(spark):
    df = _grouped(spark, [("a", 30 * i, 10 * (i + 1)) for i in range(5)])
    out = gexp.moving_average(df, ("host",), count=3).orderBy("ts").collect()
    assert [r["value"] for r in out] == [10.0, 15.0, 20.0, 30.0, 40.0]
    out = gexp.moving_average(df, ("host",), time_ms=60_000).orderBy("ts").collect()
    # 60s trailing window = current + 2 previous points (30s spacing)
    assert [r["value"] for r in out] == [10.0, 15.0, 20.0, 30.0, 40.0]
    with pytest.raises(ValueError):
        gexp.moving_average(df, ("host",))


def test_sum_diff_series(spark):
    a = _grouped(spark, [("x", 0, 10), ("x", 30, 20)])
    b = _grouped(spark, [("x", 0, 1), ("x", 60, 3)])
    out = gexp.sum_series([a, b], ("host",))
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals == {0: 11.0, 30: 20.0, 60: 3.0}
    out = gexp.diff_series([a, b], ("host",))
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals == {0: 9.0, 30: 20.0, 60: -3.0}


def test_multiply_divide_series(spark):
    a = _grouped(spark, [("x", 0, 10), ("x", 30, 20)])
    b = _grouped(spark, [("x", 0, 2), ("x", 30, 0)])
    out = gexp.multiply_series([a, b], ("host",))
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals == {0: 20.0, 30: 0.0}
    out = gexp.divide_series([a, b], ("host",))
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals[0] == 5.0
    assert vals[30] == float("inf")  # JEXL double semantics: 20/0 -> +Inf


def test_ieee_division_matches_jexl(spark):
    """x/0 -> +-Inf, 0/0 -> NaN, x%0 -> NaN — JEXL 2.1.1 evaluates on Java
    doubles (ExpressionIterator.java:346), unlike Spark/DuckDB NULL-on-zero."""
    import math

    df = spark.createDataFrame(
        [(8.0, 2.0), (1.0, 0.0), (-3.0, 0.0), (0.0, 0.0), (float("nan"), 0.0), (None, 0.0), (7.0, None)],
        "a double, b double",
    ).withColumnRenamed("a", "v_a").withColumnRenamed("b", "v_b")
    out = evaluate_expression(df, "a / b", ("a", "b")).select("v_a", "value").collect()
    got = {(None if r["v_a"] is None else ("nan" if r["v_a"] != r["v_a"] else r["v_a"])): r["value"] for r in out}
    assert got[8.0] == 4.0
    assert got[1.0] == float("inf")
    assert got[-3.0] == float("-inf")
    assert math.isnan(got[0.0])
    assert math.isnan(got["nan"])
    assert got[None] is None  # NULL operand propagates (missing w/o fill)
    assert got[7.0] is None

    out = evaluate_expression(df, "a % b", ("a", "b")).select("v_a", "value").collect()
    got = {(None if r["v_a"] is None else ("nan" if r["v_a"] != r["v_a"] else r["v_a"])): r["value"] for r in out}
    assert got[8.0] == 0.0
    assert math.isnan(got[1.0]) and math.isnan(got[0.0]) and math.isnan(got["nan"])
    assert got[None] is None and got[7.0] is None


def test_ieee_rewrite_preserves_grammar(spark):
    """The rewriter must not change results where no zero-division occurs:
    precedence, ternaries, unary ops, nested parens."""
    from opentsdb_spark.operators.join import _ternary_to_if, rewrite_ieee_arithmetic

    df = spark.createDataFrame([(9.0, 2.0, 4.0)], "x double, y double, z double")
    cases = [
        ("x + y * z", 17.0),
        ("(x + y) * z", 44.0),
        ("x - y - z", 3.0),
        ("x / y / z", 1.125),
        ("-x + z", -5.0),
        ("x % z % 3", 1.0),
        ("x > y ? x / z : z", 2.25),
        ("x > y && z > y ? 1 : 0", 1.0),
        ("x < y || !(z > y) ? 0 : 2", 2.0),
        ("x / (y - 2) + 5", float("inf")),
    ]
    for expr, want in cases:
        sql = rewrite_ieee_arithmetic(_ternary_to_if(expr))
        got = df.selectExpr(f"{sql} AS v").collect()[0]["v"]
        assert got == want, (expr, sql, got, want)


def test_series_join_intersection_union(spark):
    a = _grouped(spark, [("x", 0, 1), ("y", 0, 2)])
    b = _grouped(spark, [("x", 0, 10)])
    j = series_join({"a": a, "b": b}, ("host",), "intersection")
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["host"] == "x"
    j = series_join(
        {"a": a, "b": b}, ("host",), "union",
        {"a": FillPolicy("zero"), "b": FillPolicy("scalar", -1.0)},
    )
    rows = {r["host"]: (r["v_a"], r["v_b"]) for r in j.collect()}
    assert rows == {"x": (1.0, 10.0), "y": (2.0, -1.0)}


def test_evaluate_expression(spark):
    a = _grouped(spark, [("x", 0, 8)])
    b = _grouped(spark, [("x", 0, 2)])
    j = series_join({"a": a, "b": b}, ("host",), "intersection")
    out = evaluate_expression(j, "a + b / 2", ("a", "b")).collect()
    assert out[0]["value"] == 9.0
    out = evaluate_expression(j, "(a > 5) ? a * 2 : b", ("a", "b")).collect()
    assert out[0]["value"] == 16.0  # ternary via expr CASE? -- Spark supports `IF`/CASE


def test_topk(spark):
    rows = []
    for h, peak in [("a", 100), ("b", 50), ("c", 75)]:
        rows += [(h, 0, 1), (h, 30, peak), (h, 60, 2 if h != "b" else 99)]
    df = _grouped(spark, rows)
    out = highest_max(df, ("host",), 2)  # maxes: a=100, b=99, c=75
    assert set(r["host"] for r in out.collect()) == {"a", "b"}
    out = highest_current(df, ("host",), 1)  # most-recent: a=2, b=99, c=2
    assert set(r["host"] for r in out.collect()) == {"b"}


def test_exp_query_end_to_end(fixture_points):
    eq = ExpQuery(
        start=EPOCH, end=EPOCH + 100_000,
        metrics=(
            ExpMetric(id="a", metric="sys.cpu.user", aggregator="sum",
                      downsample=DownsampleSpec(600_000, "avg"),
                      filters=(TagFilter("literal_or", "host", "web01", group_by=True),)),
            ExpMetric(id="b", metric="sys.cpu.user", aggregator="sum",
                      downsample=DownsampleSpec(600_000, "avg"),
                      filters=(TagFilter("literal_or", "host", "web02", group_by=True),)),
        ),
        expressions=(
            ExpExpression(id="e", expr="a + b", join=ExpJoin("union"),
                          fill_policies={"a": FillPolicy("zero"), "b": FillPolicy("zero")}),
        ),
    )
    res = compile_exp_query(fixture_points, eq)
    # join key = common group tagks = host; web01/web02 don't intersect, so
    # union keeps both and fills the other side with zero
    rows = res["e"].orderBy("host", "ts").collect()
    hosts = set(r["host"] for r in rows)
    assert hosts == {"web01", "web02"}
    first_web01 = [r for r in rows if r["host"] == "web01"][0]
    assert first_web01["value"] == pytest.approx(10.0)  # mean(1..19) + 0


def test_exp_query_dag_chaining(fixture_points):
    """An expression may reference a previous expression's result
    (the reference's jgrapht DAG of ExpressionIterators)."""
    eq = ExpQuery(
        start=EPOCH, end=EPOCH + 100_000,
        metrics=(
            ExpMetric(id="a", metric="sys.cpu.user", aggregator="zimsum",
                      downsample=DownsampleSpec(600_000, "avg"),
                      filters=(TagFilter("literal_or", "host", "web01", group_by=True),)),
        ),
        expressions=(
            ExpExpression(id="double", expr="a * 2", join=ExpJoin("union"),
                          fill_policies={"a": FillPolicy("zero")}),
            ExpExpression(id="quad", expr="double * 2", join=ExpJoin("union")),
        ),
    )
    res = compile_exp_query(fixture_points, eq)
    rows = {int(r["ts"].timestamp()): r["value"] for r in res["quad"].collect()}
    assert rows[EPOCH] == pytest.approx(40.0)  # mean(1..19)=10 -> x4


def test_asof_join_directions_and_tolerance(spark):
    from pyspark.sql import functions as F

    from opentsdb_spark.operators.asof import asof_join

    def ts(s):
        return F.timestamp_millis(F.lit(s * 1000)).cast("timestamp")

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "b", 100), (4, "c", 100)],
        "id long, k string, sec long",
    ).select("id", "k", F.timestamp_millis(F.col("sec") * 1000).alias("ts"))
    right = spark.createDataFrame(
        [("a", 100, 10.0), ("a", 200, 20.0), ("b", 150, 30.0)],
        "k string, sec long, v double",
    ).select("k", F.timestamp_millis(F.col("sec") * 1000).alias("ts"), "v")

    back = {r["id"]: r for r in
            asof_join(left, right, on=["k"], right_cols=["v"]).collect()}
    # exact-equal timestamps match (>= semantics)
    assert back[1]["v_right"] == 10.0
    # latest at-or-before wins
    assert back[2]["v_right"] == 20.0
    # right row is AFTER the left row -> no backward match
    assert back[3]["v_right"] is None
    # key never appears on the right -> null
    assert back[4]["v_right"] is None
    assert back[2]["ts_right"] is not None

    fwd = {r["id"]: r for r in
           asof_join(left, right, on=["k"], right_cols=["v"],
                     direction="forward").collect()}
    assert fwd[1]["v_right"] == 10.0      # equality still matches
    assert fwd[2]["v_right"] is None      # nothing at-or-after 205
    assert fwd[3]["v_right"] == 30.0      # earliest at-or-after

    tol = {r["id"]: r for r in
           asof_join(left, right, on=["k"], right_cols=["v"],
                     tolerance_ms=5_000).collect()}
    # 205s left vs 200s right: within 5s tolerance
    assert tol[2]["v_right"] == 20.0
    # row count conserved: exactly one output row per left row
    assert sorted(back) == [1, 2, 3, 4]
    wide = {r["id"]: r for r in
            asof_join(left, right, on=["k"], right_cols=["v"],
                      tolerance_ms=1_000).collect()}
    assert wide[2]["v_right"] is None and wide[1]["v_right"] == 10.0


def test_interval_join(spark):
    from pyspark.sql import functions as F

    from opentsdb_spark.operators.asof import interval_join

    pts = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 3_600), (3, "a", 7_201), (4, "b", 100)],
        "id long, k string, sec long",
    ).select("id", "k", F.timestamp_millis(F.col("sec") * 1000).alias("ts"))
    ivs = spark.createDataFrame(
        [(10, "a", 0, 7_200),      # long interval spanning many buckets
         (11, "a", 3_600, 3_600),  # zero-length: matches exactly ts=3600
         (12, "b", 200, 100)],     # end < start: matches nothing
        "iid long, k string, s long, e long",
    ).select(
        "iid", "k",
        F.timestamp_millis(F.col("s") * 1000).alias("start_ts"),
        F.timestamp_millis(F.col("e") * 1000).alias("end_ts"),
    )
    got = sorted(
        (r["id"], r["iid"])
        for r in interval_join(pts, ivs, on=["k"], bucket_ms=600_000).collect()
    )
    # closed on both ends; each qualifying pair appears EXACTLY once even
    # when the interval spans multiple buckets
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_asof_join_null_right_payload(spark):
    """A matched right row whose payload is NULL must yield NULL, not
    resurrect an older row's value (DuckDB ASOF / merge_asof semantics)."""
    from pyspark.sql import functions as F

    from opentsdb_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "a", 300)], "id long, k string, sec long") \
        .select("id", "k", F.timestamp_millis(F.col("sec") * 1000).alias("ts"))
    right = spark.createDataFrame(
        [("a", 100, 5.0), ("a", 200, None)], "k string, sec long, v double"
    ).select("k", F.timestamp_millis(F.col("sec") * 1000).alias("ts"), "v")
    [r] = asof_join(left, right, on=["k"], right_cols=["v"]).collect()
    assert r["v_right"] is None
    assert r["ts_right"].timestamp() == 200.0
    # tolerance computed from the matched row, not the stale value's row
    [t] = asof_join(left, right, on=["k"], right_cols=["v"],
                    tolerance_ms=150_000).collect()
    assert t["v_right"] is None and t["ts_right"] is not None


# ---------------------------------------------------------------- funnels


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_steps_sequential_semantics(spark):
    """Each step must land at-or-after the previous step's completion;
    events before funnel entry never count; ties (equal timestamps)
    satisfy the '>=' contract; users without the entry step emit no row."""
    import datetime as dt

    import pytest

    from opentsdb_spark.operators.funnel import funnel_steps

    E = dt.datetime(2024, 1, 1)

    def t(s):
        return E + dt.timedelta(seconds=s)

    rows = [
        # user 1: click@5 precedes view@10 and must NOT count; the valid
        # chain is view@10 -> click@20 -> purchase@30 (purchase@15 is
        # before the click completion)
        (1, t(10), "view"), (1, t(5), "click"), (1, t(20), "click"),
        (1, t(15), "purchase"), (1, t(30), "purchase"),
        # user 2: only a pre-entry click -> stalls at stage 1
        (2, t(10), "view"), (2, t(5), "click"),
        # user 3: never enters (no view) -> no row
        (3, t(10), "click"),
        # user 4: simultaneous view+click+purchase -> ties satisfy >=
        (4, t(7), "view"), (4, t(7), "click"), (4, t(7), "purchase"),
    ]
    out = {r["user_id"]: r for r in
           funnel_steps(_ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 4}

    def ms(s):
        return int(t(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)

    assert (out[1]["stage"], out[1]["step_ts_1"], out[1]["step_ts_2"],
            out[1]["step_ts_3"]) == (3, ms(10), ms(20), ms(30))
    assert (out[2]["stage"], out[2]["step_ts_2"]) == (1, None)
    assert (out[4]["stage"], out[4]["step_ts_3"]) == (3, ms(7))
    with pytest.raises(ValueError):
        funnel_steps(_ev(spark, rows), ["view"])
    with pytest.raises(ValueError):
        funnel_steps(_ev(spark, rows), ["view", "view"])


def test_funnel_steps_window_deadline(spark):
    """With window_ms every completion must fall within the window of the
    ENTRY step — a late purchase drops the user back a stage."""
    import datetime as dt

    from opentsdb_spark.operators.funnel import funnel_steps

    E = dt.datetime(2024, 1, 1)

    def t(s):
        return E + dt.timedelta(seconds=s)

    rows = [
        (1, t(0), "view"), (1, t(5), "click"), (1, t(100), "purchase"),
        (2, t(0), "view"), (2, t(5), "click"), (2, t(9), "purchase"),
    ]
    out = {r["user_id"]: r for r in
           funnel_steps(_ev(spark, rows), ["view", "click", "purchase"],
                        window_ms=10_000).collect()}
    assert out[1]["stage"] == 2 and out[1]["step_ts_3"] is None
    assert out[2]["stage"] == 3
    # the plan is ONE aggregate over user -- a single shuffle, no joins
    plan = funnel_steps(_ev(spark, rows), ["view", "click", "purchase"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]


def test_retention_cohorts_triangle(spark):
    """Cohort by first-seen day; offset-0 cell equals cohort size; a user
    active on k distinct days appears in exactly k cells of their cohort
    row; no joins over the raw feed."""
    import datetime as dt

    from opentsdb_spark.operators.funnel import retention_cohorts

    def d(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = [
        # cohort Jan 1: users 1, 2. user 1 returns day 2 and 3 (twice on
        # day 3 -> still one cell); user 2 never returns.
        (1, d(1), "view"), (1, d(2), "click"), (1, d(3), "view"),
        (1, d(3, 12), "click"),
        (2, d(1, 5), "view"),
        # cohort Jan 2: user 3, returns day 4 (offset 2)
        (3, d(2), "view"), (3, d(4), "purchase"),
    ]
    out = {(str(r["cohort_date"]), r["day_offset"]): r["n_users"]
           for r in retention_cohorts(_ev(spark, rows)).collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_anomaly_zscore_flags_and_warmup(spark):
    """A clear spike is flagged, steady points are not, the first
    min_points rows stay NULL/false (warm-up), the scored point is
    excluded from its own window, and flat windows yield NULL z."""
    import pytest

    from opentsdb_spark.operators.expressions import anomaly_zscore

    vals = [10.0, 11.0, 10.5, 10.2, 10.8, 10.4, 100.0, 10.6, 10.3]
    df = spark.createDataFrame(
        [("m", i, v) for i, v in enumerate(vals)],
        "metric string, ts long, value double",
    )
    out = {r["ts"]: r for r in
           anomaly_zscore(df, ("metric",), lookback=5, threshold=2.0,
                          min_points=3).collect()}
    assert out[0]["zscore"] is None and out[0]["is_anomaly"] is False
    assert out[1]["zscore"] is None  # only 1 trailing point
    assert out[2]["zscore"] is None  # only 2 trailing points < min_points=3
    assert out[3]["zscore"] is not None
    assert out[6]["is_anomaly"] is True and out[6]["zscore"] > 2
    # the spike sits in ts=7..8's trailing window, inflating sigma — but
    # they are not anomalies themselves
    assert out[7]["is_anomaly"] is False
    assert out[8]["is_anomaly"] is False
    # normal points before the spike: not flagged
    assert all(out[i]["is_anomaly"] is False for i in (3, 4, 5))
    # flat series: zero variance -> NULL z, never flagged
    flat = spark.createDataFrame([("m", i, 5.0) for i in range(10)],
                                 "metric string, ts long, value double")
    fo = anomaly_zscore(flat, ("metric",), lookback=5).collect()
    assert all(r["zscore"] is None and r["is_anomaly"] is False for r in fo)
    with pytest.raises(ValueError):
        anomaly_zscore(df, ("metric",), lookback=1)
    with pytest.raises(ValueError):
        anomaly_zscore(df, ("metric",), min_points=1)


def test_slo_burn_rate_multiwindow_semantics(spark):
    """burn = windowed ratio-of-sums / budget; the alert needs BOTH
    windows over the factor — a one-bucket spike inside a quiet long
    window stays silent, a sustained burn pages; zero-traffic windows
    give NULL burn and no alert; parameter validation."""
    import pytest

    from opentsdb_spark.operators.expressions import slo_burn_rate

    # budget 0.1, factor 2 -> alert needs ratio >= 0.2 on BOTH windows
    rows = [
        # one spike (ratio 1.0) then quiet: short burns, long (3) doesn't
        ("a", 0, 2, 2), ("a", 1, 0, 10), ("a", 2, 0, 10), ("a", 3, 0, 10),
        # sustained burn: every bucket ratio 0.5 -> both windows burn
        ("b", 0, 5, 10), ("b", 1, 5, 10), ("b", 2, 5, 10), ("b", 3, 5, 10),
        # zero traffic bucket -> NULL short burn, no alert
        ("c", 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, bad long, total long")
    out = {(r["metric"], r["ts"]): r for r in slo_burn_rate(
        df, ("metric",), short_window=1, long_window=3,
        error_budget=0.1, factor=2.0).collect()}
    a0, a1, a3 = out[("a", 0)], out[("a", 1)], out[("a", 3)]
    assert a0["burn_short"] == 10.0          # 2/2 / 0.1
    assert a0["burn_long"] == 10.0           # only bucket in window
    assert a0["is_burning"] is True          # spike IS sustained at t=0
    assert a1["burn_short"] == 0.0
    assert a1["is_burning"] is False
    #  long window at t=3 = (0+0+0)/(30)/0.1 = 0 -> quiet
    assert a3["burn_long"] == 0.0 and a3["is_burning"] is False
    b3 = out[("b", 3)]
    assert b3["burn_short"] == 5.0 and b3["burn_long"] == 5.0
    assert b3["is_burning"] is True
    c0 = out[("c", 0)]
    assert c0["burn_short"] is None and c0["is_burning"] is False
    # ratio-of-sums, not mean-of-ratios: a huge quiet bucket dilutes a
    # tiny noisy one
    rows2 = [("d", 0, 1, 2), ("d", 1, 0, 998)]
    d = {r["ts"]: r for r in slo_burn_rate(
        spark.createDataFrame(rows2, "metric string, ts long, bad long, total long"),
        ("metric",), short_window=1, long_window=2,
        error_budget=0.1, factor=2.0).collect()}
    assert abs(d[1]["burn_long"] - (1 / 1000) / 0.1) < 1e-12
    with pytest.raises(ValueError):
        slo_burn_rate(df, ("metric",), short_window=2, long_window=2)
    with pytest.raises(ValueError):
        slo_burn_rate(df, ("metric",), error_budget=0.0)
