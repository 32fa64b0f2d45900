"""OpenTSDB JSON response serialization.

Reproduces the /api/query response shape (reference
src/tsd/HttpJsonSerializer.java:743-866): one object per result series:

    {"metric": ..., "tags": {groupKey: value, ...},
     "aggregateTags": [tagk aggregated away, ...],
     "dps": {"<epoch_sec>": value, ...}}   # chronological key order (:771)

This is the API boundary — the one place results are collected to the
driver (post-aggregation output is small by construction).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from opentsdb_spark.plans.limits import enforce_data_point_limit
from opentsdb_spark.plans.planner import CompiledSubQuery


def serialize_subquery(
    result: CompiledSubQuery,
    ms_resolution: bool = False,
    max_data_points: int = 0,
    show_tsuids: bool = False,
    query_echo: dict[str, Any] | None = None,
    stats: dict[str, Any] | None = None,
    annotations_map: dict[str, list[dict[str, Any]]] | None = None,
    global_annotations: list[dict[str, Any]] | None = None,
) -> list[dict[str, Any]]:
    """``show_tsuids`` adds the sorted TSUID list per output series
    (HttpJsonSerializer.java:766-776); ``query_echo`` is attached as the
    ``query`` field when show_query is set (:763-765); ``stats`` is attached
    as the ``stats`` field when show_stats is set (:888-901);
    ``annotations_map`` (tsuid -> notes) attaches the notes of each output
    series' source TSUIDs, and ``global_annotations`` is repeated per
    series — both matching HttpJsonSerializer.java:778-811."""
    df = result.df
    gk = list(result.group_tagks)
    if result.aggregator == "none":
        key_cols = ["series_id"]
    else:
        key_cols = ["metric", *gk]
    out_df = df.withColumn("__t", F.unix_millis("ts")).select(
        *key_cols, "metric", "__t", "value"
    )
    # fail fast BEFORE materializing (reference TsdbQuery.java:527-536 aborts
    # over-limit queries instead of OOMing the serving layer)
    enforce_data_point_limit(out_df, max_data_points)
    ordered = out_df.orderBy(*key_cols, "__t")
    if max_data_points <= 0:
        # UNLIMITED responses stream partition-by-partition instead of
        # collecting: orderBy range-partitions + sorts, and toLocalIterator
        # walks partitions in order, so global order is preserved while
        # driver memory is bounded by one partition — the analog of the
        # reference streaming its span iterator into the channel
        rows = ordered.toLocalIterator()
    else:
        rows = ordered.collect()
    # per-output-series tag partition (reference SpanGroup.computeTags,
    # src/core/SpanGroup.java:348-386): a key whose value is IDENTICAL
    # across every underlying series that has it stays in `tags`; a key
    # seen with >= 2 values moves to `aggregateTags`. One small aggregate
    # over the scanned series set, grouped by the output key.
    tag_info: dict[tuple, tuple[dict[str, str], list[str]]] = {}
    if result.aggregator != "none" and result.source_df is not None:
        ti_rows = (
            result.source_df.select(
                "metric",
                *[F.col("tags")[k].alias(k) for k in gk],
                F.explode(F.map_entries("tags")).alias("__e"),
            )
            .select(*key_cols, F.col("__e.key").alias("__k"),
                    F.col("__e.value").alias("__v"))
            .distinct()
            .groupBy(*key_cols, "__k")
            .agg(F.count_distinct("__v").alias("__n"), F.first("__v").alias("__v"))
            .collect()
        )
        for tr in ti_rows:
            t, a = tag_info.setdefault(tuple(tr[c] for c in key_cols), ({}, []))
            if tr["__n"] == 1:
                t[tr["__k"]] = tr["__v"]
            else:
                a.append(tr["__k"])
    # per-output-series TSUID lists: distinct source series ids grouped by
    # the output key — one extra small aggregate, only when requested
    tsuid_map: dict[tuple, list[str]] = {}
    need_tsuids = show_tsuids or annotations_map
    if need_tsuids and result.aggregator != "none" and result.source_df is not None:
        from opentsdb_spark.sources.points import series_id_col

        sid_rows = (
            result.source_df.select(
                "metric",
                *[F.col("tags")[k].alias(k) for k in gk],
                series_id_col("metric", "tags").alias("__sid"),
            )
            .distinct()
            .collect()
        )
        for r in sid_rows:
            tsuid_map.setdefault(tuple(r[c] for c in key_cols), []).append(r["__sid"])
    out: list[dict[str, Any]] = []
    cur_key: tuple | None = None
    cur: dict[str, Any] | None = None
    for r in rows:
        key = tuple(r[c] for c in key_cols)
        if key != cur_key:
            if result.aggregator == "none":
                # one output series == one source series: its own full tag
                # map, nothing aggregated (the group columns were never
                # selected on this path — parse the canonical series id)
                tags, atags = _tags_from_series_id(r["series_id"]), []
            else:
                t, a = tag_info.get(key, ({}, []))
                tags, atags = t, sorted(a)
            cur = {
                "metric": r["metric"],
                "tags": tags,
                "aggregateTags": atags,
                "dps": {},
            }
            if query_echo is not None:
                cur["query"] = query_echo
            series_tsuids = (
                [r["series_id"]]
                if result.aggregator == "none"
                else sorted(tsuid_map.get(key, []))
            )
            if show_tsuids:
                cur["tsuids"] = series_tsuids
            if annotations_map is not None:
                notes = [n for t in series_tsuids for n in annotations_map.get(t, [])]
                cur["annotations"] = sorted(notes, key=lambda n: n["startTime"])
            if global_annotations is not None:
                cur["globalAnnotations"] = global_annotations
            if stats is not None:
                cur["stats"] = stats
            out.append(cur)
            cur_key = key
        t = r["__t"] if ms_resolution else r["__t"] // 1000
        assert cur is not None
        cur["dps"][str(t)] = r["value"]
    return out


def _tags_from_series_id(sid: str) -> dict[str, str]:
    """Invert sources.points.series_id_col: 'metric{k=v,k=v}' -> tag map."""
    if "{" not in sid:
        return {}
    body = sid[sid.index("{") + 1 : sid.rindex("}")]
    return dict(p.split("=", 1) for p in body.split(",") if "=" in p)


def subquery_echo(q) -> dict[str, Any]:
    """Echo a SubQuery in the reference's TSSubQuery JSON field naming
    (Jackson output of src/core/TSSubQuery.java getters)."""
    return {
        "aggregator": q.aggregator,
        "metric": q.metric,
        "tsuids": list(q.tsuids) or None,
        "downsample": None if q.downsample is None else (
            f"{q.downsample.interval_ms}ms-{q.downsample.aggregator}"
            if not q.downsample.calendar
            else f"{q.downsample.calendar_n}{q.downsample.calendar_unit}c-{q.downsample.aggregator}"
        ),
        "rate": q.rate is not None,
        "explicitTags": q.explicit_tags,
        "filters": [
            {"tagk": f.tagk, "filter": f.filter, "type": f.type, "groupBy": f.group_by}
            for f in q.filters
        ],
    }


def _java_double_str(v: float) -> str:
    """Java ``Double.toString`` shape: plain decimal in [1e-3, 1e7), else
    E-notation with one leading digit (``1.234E8``). Both sides print the
    shortest decimal that round-trips, so inside the plain range Python's
    repr matches; outside we rebuild Java's exponent form."""
    a = abs(v)
    if a == 0.0 or (1e-3 <= a < 1e7):
        s = repr(v)
        if "e" in s or "E" in s:  # python switches earlier for tiny values
            return _java_e_notation(v)
        return s if "." in s else s + ".0"
    return _java_e_notation(v)


def _java_e_notation(v: float) -> str:
    mant, _, exp = f"{v:.17e}".partition("e")
    # shortest mantissa that still round-trips, Java-style (no + on exponent)
    exp_i = int(exp)
    for prec in range(17):
        cand = f"{v:.{prec}e}"
        if float(cand) == v:
            m, _, _ = cand.partition("e")
            if "." not in m:
                m += ".0"
            return f"{m}E{exp_i}"
    m = mant
    return f"{m}E{exp_i}"


def graph_ascii(results: list[dict[str, Any]]) -> str:
    """The /q?ascii payload: ONE line per data point —

        ``<metric> <epoch_sec> <value> [<tagk>=<tagv> ...]``

    (reference src/tsd/GraphHandler.java:938-1015: printMetricHeader +
    value + tag buffer). Reference semantics kept: NaN points are skipped,
    infinite values abort the whole response (GraphHandler.java:976-983
    throws IllegalStateException), integral values print without a decimal
    point when the point carried a long (here: when the double is integral —
    the engine's aggregates are double-valued), doubles print in Java
    Double.toString form. Tags print sorted (the reference iterates a
    HashMap — unspecified order; sorted is deterministic)."""
    lines: list[str] = []
    for series in results:
        if "metric" not in series:  # statsSummary trailer etc.
            continue
        tagbuf = "".join(
            f" {k}={v}" for k, v in sorted(series.get("tags", {}).items())
        )
        for ts, v in series["dps"].items():
            fv = float(v)
            if fv != fv:  # NaN
                continue
            if fv in (float("inf"), float("-inf")):
                raise ValueError(f"Infinity: {fv} at ts={ts}")
            val = str(int(fv)) if fv.is_integer() and abs(fv) < 2**63 else _java_double_str(fv)
            lines.append(f"{series['metric']} {ts} {val}{tagbuf}")
    return "\n".join(lines) + ("\n" if lines else "")


def ascii_table(results: list[dict[str, Any]], max_rows: int = 40) -> str:
    """Render query results as an ASCII table (the reference's 'ascii'
    serializer / CliQuery text output, src/tsd/GraphHandler.java:394-410)."""
    lines = []
    for series in results:
        if "metric" not in series:  # statsSummary trailer etc.
            continue
        tags = ",".join(f"{k}={v}" for k, v in sorted(series.get("tags", {}).items()))
        header = f"{series['metric']}{{{tags}}}"
        if series.get("aggregateTags"):
            header += f"  (aggregated: {','.join(series['aggregateTags'])})"
        lines.append(header)
        lines.append("-" * len(header))
        for i, (ts, v) in enumerate(series["dps"].items()):
            if i >= max_rows:
                lines.append(f"... {len(series['dps']) - max_rows} more")
                break
            lines.append(f"{ts}  {v}")
        lines.append("")
    return "\n".join(lines)
