"""Command-line interface — the reference's ``tsdb`` tool family.

Reference: the shell wrapper dispatches to CliQuery / TextImporter /
DumpSeries / UidManager (src/tools/*.java). Subcommands:

    python -m opentsdb_spark.cli query   --start ... [--end ...] m_spec...
    python -m opentsdb_spark.cli gexp    --start ... [--end ...] expression
    python -m opentsdb_spark.cli import  FILE...
    python -m opentsdb_spark.cli dump    --metric NAME [--out DIR]
    python -m opentsdb_spark.cli scan    --start ... [--end ...] [--importfmt|--delete] m_spec...
    python -m opentsdb_spark.cli suggest --type metrics|tagk|tagv [--q PREFIX]
    python -m opentsdb_spark.cli uid     [--kind ...] [list|grep RE|assign N...|rename OLD NEW]
    python -m opentsdb_spark.cli search  lookup METRIC [TAGK=TAGV...]
    python -m opentsdb_spark.cli graph   --start ... --out FILE.png m_spec...
    python -m opentsdb_spark.cli version

Points come from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
events, or --points-dir for a write_points-produced parquet layout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark_and_points(args):
    from opentsdb_spark.session import get_spark
    from opentsdb_spark.sources.points import load_points

    spark = get_spark("opentsdb-spark-cli")
    if args.points_dir:
        points = spark.read.parquet(args.points_dir)
    else:
        sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        points = load_points(spark, sf_dir)
    return spark, points


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="opentsdb-spark", description=__doc__)
    ap.add_argument("--sf-dir", default=None, help="driver testdata dir (events as points)")
    ap.add_argument("--points-dir", default=None, help="parquet point-table dir")
    sub = ap.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run m= sub-queries, print OpenTSDB JSON")
    q.add_argument("--start", required=True)
    q.add_argument("--end", default=None)
    q.add_argument("--ascii", action="store_true", help="ASCII table instead of JSON")
    q.add_argument("m", nargs="+", help="m= specs, e.g. 'sum:1h-avg:purchase{user=*}'")

    g = sub.add_parser("gexp", help="run a gexp expression")
    g.add_argument("--start", required=True)
    g.add_argument("--end", default=None)
    g.add_argument("exp")

    imp = sub.add_parser("import", help="bulk-import text files (TextImporter format)")
    imp.add_argument("--out", required=True, help="output parquet dir")
    imp.add_argument("files", nargs="+")

    d = sub.add_parser("dump", help="dump series as import-format text")
    d.add_argument("--metric", default=None)
    d.add_argument("--out", default=None, help="write lines here (else stdout, first 50)")

    sc = sub.add_parser(
        "scan", help="print raw cells matching a full query spec; --delete "
                     "removes them (reference tsdb scan, src/tools/DumpSeries.java)"
    )
    sc.add_argument("--start", required=True)
    sc.add_argument("--end", default=None)
    sc.add_argument("--importfmt", action="store_true",
                    help="emit TextImporter lines (reference --import)")
    sc.add_argument("--delete", action="store_true",
                    help="delete matched cells instead of printing")
    sc.add_argument("--out", default=None,
                    help="--delete: write the retained table here; "
                         "else write lines here (stdout first 50 otherwise)")
    sc.add_argument("m_specs", nargs="+", help="AGG:[interval-agg:]metric{tags}")

    s = sub.add_parser("suggest", help="name autocomplete")
    s.add_argument("--type", default="metrics", choices=["metrics", "tagk", "tagv"])
    s.add_argument("--q", default="")

    u = sub.add_parser(
        "uid", help="uid registry tools (reference tsdb uid / UidManager): "
                    "list (default), grep RE, assign NAME..., rename OLD NEW"
    )
    u.add_argument("--kind", default="metrics", choices=["metrics", "tagk", "tagv"])
    u.add_argument("subcmd", nargs="?", default="list",
                   choices=["list", "grep", "assign", "rename", "delete",
                            "lookup", "treesync", "treepurge"])
    u.add_argument("uid_args", nargs="*",
                   help="grep: regex; assign: names; rename: OLD NEW "
                        "(tagv rename: TAGK OLD NEW); renames print put "
                        "lines unless --out is given; delete/lookup: NAME; "
                        "treepurge: TREE_ID [true] (true also removes the "
                        "definition, UidManager.java:220-245)")
    u.add_argument("--registry", default=None,
                   help="assign/delete/lookup: registry parquet dir")
    u.add_argument("--out", default=None, help="rename: write renamed table here")
    u.add_argument("--trees", default=None,
                   help="treesync/treepurge: tree storage dir "
                        "(trees.json + tree_<id>/<family> parquet)")

    f = sub.add_parser("fsck", help="data-integrity scan (duplicates/NaN/null/future)")
    f.add_argument("--fix", action="store_true", help="write a repaired table")
    f.add_argument("--out", default=None, help="output dir for --fix")

    rb = sub.add_parser(
        "rollup-build",
        help="materialize sum/count/min/max rollup tables per interval "
             "(the external batch job the reference expects to feed its "
             "rollup tables; manifest = tsd.rollups.config analog)",
    )
    rb.add_argument("--out", required=True,
                    help="base directory: one dt-partitioned table per "
                         "interval + rollups.json manifest")
    rb.add_argument("--interval", action="append", default=None,
                    help="rollup interval label, repeatable "
                         "(default: 1h and 1d)")

    rt = sub.add_parser(
        "retention",
        help="drop dt partitions older than a TTL (reference HBase table TTL)",
    )
    rt.add_argument("path", help="write_points layout directory")
    rt.add_argument("--keep-days", type=int, required=True)
    rt.add_argument("--dry-run", action="store_true",
                    help="list expired partitions without deleting")

    mk = sub.add_parser(
        "mkmetric", help="assign UIDs to metric names (reference tsdb mkmetric)"
    )
    mk.add_argument("--registry", default=None, help="registry parquet dir (read+write)")
    mk.add_argument("--kind", default="metric", choices=["metric", "tagk", "tagv"])
    mk.add_argument("names", nargs="+")

    se = sub.add_parser(
        "search", help="series lookup (reference tsdb search lookup, "
                       "src/tools/Search.java:33-100)"
    )
    se.add_argument("subcmd", choices=["lookup"])
    se.add_argument(
        "terms", nargs="+",
        help="a metric name and/or TAGK=TAGV pairs (TAGV '*' = any)",
    )

    gr = sub.add_parser(
        "graph", help="render an m= query to a PNG file (the /q endpoint "
                      "image, graph.render_png)"
    )
    gr.add_argument("--start", required=True)
    gr.add_argument("--end", default=None)
    gr.add_argument("--out", required=True, help="output .png path")
    gr.add_argument("--wxh", default=None)
    gr.add_argument("--title", default=None)
    gr.add_argument("m", nargs="+")

    sub.add_parser("version", help="version/build info (reference tsdb version)")

    td = sub.add_parser(
        "tsd", help="run the TSD daemon: HTTP /api/* + /q and optional "
                    "telnet line protocol (reference tsdb tsd, "
                    "src/tsd/TSDMain.java)"
    )
    td.add_argument("--config", default=None,
                    help="opentsdb.conf java-properties file (reference "
                         "tsd config keys; explicit flags override it)")
    td.add_argument("--port", type=int, default=None,
                    help="HTTP(+telnet) port (tsd.network.port; default 4242)")
    td.add_argument("--telnet-port", type=int, default=None)
    td.add_argument("--static-dir", default=None,
                    help="serve /s/* files from this directory "
                         "(reference tsd.http.staticroot)")
    td.add_argument("--cache-dir", default=None,
                    help="/q graph disk-cache directory (reference "
                         "tsd.http.cachedir; unset disables caching)")
    td.add_argument("--mode", choices=("rw", "ro", "wo"), default=None,
                    help="operation mode (reference tsd.mode): ro serves "
                         "only read RPCs, wo only write RPCs; unregistered "
                         "endpoints 404")
    td.add_argument("--cors-domains", default=None,
                    help="comma list of allowed CORS origins, or '*' "
                         "(reference tsd.http.request.cors_domains; unset "
                         "disables CORS and 405s OPTIONS)")
    td.add_argument("--cors-headers", default=None,
                    help="Access-Control-Allow-Headers value "
                         "(tsd.http.request.cors_headers)")
    td.add_argument("--rollups-dir", default=None,
                    help="rollup-build directory (rollups.json + one table "
                         "per interval): /api/query downsamples matching a "
                         "built interval read the pre-aggregates "
                         "(reference tsd.rollups.config registry)")
    td.add_argument("--rollup-sla", default=None,
                    help="rollup generation lag, e.g. '2h': data newer than "
                         "now-SLA answers from raw and straddling queries "
                         "split at the boundary (SplitRollupQuery.java); "
                         "requires --rollups-dir")
    td.add_argument("--trees-dir", default=None,
                    help="disk-backed /api/tree storage dir (trees.json + "
                         "built families; shared with `uid treesync`) — "
                         "tree edits survive restarts like the reference's "
                         "UID-table tree rows")
    # The reference defaults tsd.query.limits.* to unlimited because it
    # STREAMS results into the channel; this daemon materializes responses
    # via collect(), so an unlimited default would let one un-downsampled
    # full-range query OOM the driver. Ship the ceiling ON: 8M data points
    # is far above any renderable/JSON-consumable response and well inside
    # driver memory. 0 disables (the reference default).
    td.add_argument("--max-data-points", type=int, default=None,
                    help="reject queries whose scan or output grid exceeds "
                         "this many data points (tsd.query.limits.data_points; "
                         "0 = unlimited; default 8000000 without --config)")
    td.add_argument("--max-scan-bytes", type=int, default=None,
                    help="reject queries whose pruned Parquet scan exceeds "
                         "this many bytes (tsd.query.limits.bytes; "
                         "0 = unlimited, the reference default)")
    td.add_argument("--query-limit-overrides", default=None,
                    help="JSON file of per-metric limit overrides: a list "
                         "of {regex, dataPointsLimit, byteLimit} items "
                         "(tsd.query.limits.overrides.config, reference "
                         "src/query/QueryLimitOverride.java)")

    ms = sub.add_parser(
        "metasync",
        help="reconcile UIDMeta/TSMeta registries against the point store "
             "(reference uid metasync, src/tools/MetaSync.java)",
    )
    ms.add_argument("--meta-dir", required=True,
                    help="registry root: reads/writes <dir>/uidmeta and <dir>/tsmeta")
    ms.add_argument("--purge", action="store_true",
                    help="wipe all meta rows instead (uid metapurge, MetaPurge.java)")

    args = ap.parse_args(argv)

    if args.cmd == "query":
        from opentsdb_spark import api

        spark, points = _spark_and_points(args)
        req = {"start": args.start, "m": args.m}
        if args.end:
            req["end"] = args.end
        out = api.handle_query(points, req)
        if args.ascii:
            from opentsdb_spark.serializer import ascii_table

            print(ascii_table(out))
        else:
            print(json.dumps(out, indent=2))
    elif args.cmd == "gexp":
        from opentsdb_spark import api

        spark, points = _spark_and_points(args)
        req = {"exp": args.exp, "start": args.start}
        if args.end:
            req["end"] = args.end
        print(json.dumps(api.handle_gexp(points, req), indent=2))
    elif args.cmd == "import":
        from opentsdb_spark.session import get_spark
        from opentsdb_spark.sources.points import import_text, write_points

        spark = get_spark("opentsdb-spark-cli")
        df = import_text(spark, args.files[0] if len(args.files) == 1 else args.files)
        write_points(df, args.out)
        print(f"imported {spark.read.parquet(args.out).count()} points -> {args.out}")
    elif args.cmd == "dump":
        from pyspark.sql import functions as F

        from opentsdb_spark.sources.points import dump_series

        spark, points = _spark_and_points(args)
        if args.metric:
            points = points.where(F.col("metric") == args.metric)
        lines = dump_series(points)
        if args.out:
            lines.write.mode("overwrite").text(args.out)
            print(f"dumped -> {args.out}")
        else:
            for r in lines.limit(50).collect():
                print(r["line"])
    elif args.cmd == "scan":
        from opentsdb_spark.parse import parse_query
        from opentsdb_spark.plans.planner import match_predicate
        from opentsdb_spark.sources.points import dump_series, write_points

        spark, points = _spark_and_points(args)
        params = {"start": args.start, "m": args.m_specs}
        if args.end:
            params["end"] = args.end
        tsq = parse_query(params)
        matched = match_predicate(points, tsq)
        if args.delete:
            retained = points.where(~matched)
            n = points.count() - retained.count()
            if args.out:
                write_points(retained, args.out)
                print(f"deleted {n} cells; retained table -> {args.out}")
            else:
                print(f"deleted {n} cells (dry run — pass --out to persist)")
        else:
            lines = dump_series(points.where(matched),
                                import_format=args.importfmt)
            if args.out:
                lines.write.mode("overwrite").text(args.out)
                print(f"scanned -> {args.out}")
            else:
                for r in lines.limit(50).collect():
                    print(r["line"])
    elif args.cmd == "suggest":
        from opentsdb_spark import api

        spark, points = _spark_and_points(args)
        print(json.dumps(api.handle_suggest(points, {"type": args.type, "q": args.q})))
    elif args.cmd == "uid" and args.subcmd in ("treesync", "treepurge"):
        # reference `tsdb uid treesync` / `uid treepurge <id> [true]`
        # (UidManager.java:220-245 -> TreeSync.java); tree defs + built
        # families live in the --trees directory
        from opentsdb_spark.operators.tree import (
            load_tree_defs, treepurge, treesync,
        )

        if not args.trees:
            ap.error(f"uid {args.subcmd} needs --trees DIR")
        if args.subcmd == "treesync":
            spark, points = _spark_and_points(args)
            store = load_tree_defs(args.trees)
            report = treesync(store, points, args.trees)
            print(json.dumps(report, indent=2))
        else:
            if not args.uid_args:
                ap.error("uid treepurge needs a TREE_ID argument")
            try:
                tid = int(args.uid_args[0])
            except ValueError:
                ap.error(f"tree id must be an integer, got {args.uid_args[0]!r}")
            delete_def = len(args.uid_args) > 1 and args.uid_args[1] == "true"
            treepurge(args.trees, tid, delete_definition=delete_def)
            print(f"purged tree {tid}"
                  + (" and its definition" if delete_def else ""))
    elif args.cmd == "uid" and args.subcmd in ("delete", "lookup"):
        # reference `uid delete <kind> <name>` / bare `[kind] <name>` lookup
        # against the assign registry (UidManager.java:68-75 usage)
        if not args.registry:
            ap.error(f"uid {args.subcmd} needs --registry DIR")
        if not args.uid_args:
            ap.error(f"uid {args.subcmd} needs a NAME argument")
        name = args.uid_args[0]
        kind = {"metrics": "metric"}.get(args.kind, args.kind)
        spark, _points = _spark_and_points(args)
        reg = (spark.read.parquet(args.registry)
               if os.path.exists(args.registry) else None)
        if reg is None:
            print(f"no registry at {args.registry}", file=sys.stderr)
            return 2
        rows = reg.collect()
        # exact-name matches take precedence over uid matches: when the
        # argument is one row's name AND another row's uid, the name row
        # wins deterministically (never parquet row order)
        hit = [r for r in rows if r["kind"] == kind and r["name"] == name]
        if not hit:
            hit = [r for r in rows if r["kind"] == kind and r["uid"] == name]
        if not hit:
            print(f"{kind} {name!r} not found", file=sys.stderr)
            return 2
        if args.subcmd == "lookup":
            for r in hit:
                print(f"{r['kind']}\t{r['name']}\t{r['uid']}")
        else:
            keep = [r for r in rows
                    if not (r["kind"] == kind and r["name"] == hit[0]["name"])]
            spark.createDataFrame(
                keep, "kind string, name string, uid string"
            ).write.mode("overwrite").parquet(args.registry)
            print(f"deleted {kind} {hit[0]['name']} ({hit[0]['uid']})")
    elif args.cmd == "uid":
        import re as _re

        from opentsdb_spark.operators.uid import (
            rename_metric, rename_tagk, rename_tagv, uid_assign, uid_listing,
        )

        spark, points = _spark_and_points(args)
        if args.subcmd in ("list", "grep"):
            if args.subcmd == "grep":
                if not args.uid_args:
                    ap.error("uid grep needs a regex argument")
                try:
                    pat = _re.compile(args.uid_args[0])
                except _re.error as e:
                    ap.error(f"invalid regex {args.uid_args[0]!r}: {e}")
            else:
                pat = None
            for r in uid_listing(points, args.kind).orderBy("name").collect():
                if pat is not None and not pat.search(r["name"]):
                    continue
                print(f"{r['name']}\t{r['points']}\t{r['first_seen']}\t{r['last_seen']}")
        elif args.subcmd == "assign":
            reg = (spark.read.parquet(args.registry)
                   if args.registry and os.path.exists(args.registry) else None)
            kind = {"metrics": "metric"}.get(args.kind, args.kind)
            assigned, reg = uid_assign(reg, {kind: args.uid_args}, spark=spark)
            if args.registry:
                # the updated frame may read from the same path —
                # materialize before the overwrite (same hazard as mkmetric)
                rows = reg.collect()
                spark.createDataFrame(
                    rows, "kind string, name string, uid string"
                ).write.mode("overwrite").parquet(args.registry)
            print(json.dumps(assigned, indent=2))
        elif args.subcmd == "rename":
            want = 3 if args.kind == "tagv" else 2
            if len(args.uid_args) != want:
                ap.error(
                    "uid rename needs TAGK OLD NEW for tagv" if want == 3
                    else "uid rename needs OLD NEW"
                )
            if args.kind == "metrics":
                old, new = args.uid_args
                renamed = rename_metric(points, old, new)
            elif args.kind == "tagk":
                old, new = args.uid_args
                renamed = rename_tagk(points, old, new)
            else:
                tagk, old, new = args.uid_args
                renamed = rename_tagv(points, tagk, old, new)
            if args.out:
                from opentsdb_spark.sources.points import write_points

                write_points(renamed, args.out)
                print(f"renamed -> {args.out}")
            else:
                from opentsdb_spark.sources.points import dump_series

                for r in dump_series(renamed).limit(20).collect():
                    print(r["line"])
    elif args.cmd == "rollup-build":
        from opentsdb_spark.plans.rollup import build_rollup_tables

        spark, points = _spark_and_points(args)
        intervals = args.interval or ["1h", "1d"]
        paths = build_rollup_tables(points, args.out, intervals)
        for label, p in zip(intervals, paths):
            print(f"built {label} rollup -> {p}")
    elif args.cmd == "retention":
        from opentsdb_spark.sources.points import retention_sweep

        dropped = retention_sweep(args.path, args.keep_days, dry_run=args.dry_run)
        verb = "would drop" if args.dry_run else "dropped"
        for d in dropped:
            print(f"{verb} {d}")
        print(f"{verb} {len(dropped)} partition(s)")
    elif args.cmd == "fsck":
        import time

        from opentsdb_spark.sources.points import fsck_fix, fsck_points, write_points

        spark, points = _spark_and_points(args)
        now_ms = int(time.time() * 1000)
        for r in fsck_points(points, now_ms).collect():
            print(f"{r['issue']}\t{r['count']}")
        if args.fix:
            if not args.out:
                print("--fix requires --out", file=sys.stderr)
                return 2
            write_points(fsck_fix(points, now_ms), args.out)
            print(f"repaired table -> {args.out}")
    elif args.cmd == "mkmetric":
        from opentsdb_spark import api
        from opentsdb_spark.session import get_spark

        spark = get_spark("opentsdb-spark-cli")
        registry = None
        if args.registry and os.path.isdir(args.registry):
            registry = spark.read.parquet(args.registry)
        resp, registry = api.handle_uid_assign(
            registry, {args.kind: args.names}, spark=spark
        )
        print(json.dumps(resp, indent=2))
        if args.registry:
            # registry frame may read from the same path — materialize first
            rows = registry.collect()
            spark.createDataFrame(
                rows, "kind string, name string, uid string"
            ).write.mode("overwrite").parquet(args.registry)
    elif args.cmd == "search":
        from opentsdb_spark import api

        spark, points = _spark_and_points(args)
        tags, metric = [], None
        for t in args.terms:
            if "=" in t:
                k, _, v = t.partition("=")
                tags.append({"key": k, "value": None if v in ("", "*") else v})
            else:
                metric = t
        req = {"tags": tags}
        if metric:
            req["metric"] = metric
        for r in api.handle_lookup(points, req):
            tagstr = " ".join(f"{k}={v}" for k, v in sorted(r["tags"].items()))
            print(f"{r['series_id']}\t{r['metric']}\t{tagstr}")
    elif args.cmd == "graph":
        from opentsdb_spark import api

        spark, points = _spark_and_points(args)
        req = {"start": args.start, "m": args.m, "png": ""}
        if args.end:
            req["end"] = args.end
        if args.wxh:
            req["wxh"] = args.wxh
        if args.title:
            req["title"] = args.title
        out = api.handle_graph(points, req)
        with open(args.out, "wb") as fh:
            fh.write(out["png"])
        print(f"{out['points']} points -> {args.out}")
    elif args.cmd == "version":
        from opentsdb_spark import api

        print(json.dumps(api.handle_version(), indent=2))
    elif args.cmd == "tsd":
        from opentsdb_spark import config as tsdconf
        from opentsdb_spark.plans import limits
        from opentsdb_spark.tsd import TSD, serve

        cfg = tsdconf.load_config(args.config)
        if args.config:
            # wires allow_delete / expansion limit / fix_duplicates /
            # limit defaults; explicit flags below override the limits
            tsdconf.apply_config(cfg)
        mdp = args.max_data_points
        if mdp is None:
            # config file is authoritative when given (0 = the reference's
            # unlimited default); otherwise this daemon ships the ceiling ON
            mdp = int(cfg["tsd.query.limits.data_points.default"]) if args.config else 8_000_000
        msb = args.max_scan_bytes
        if msb is None:
            msb = int(cfg["tsd.query.limits.bytes.default"]) if args.config else 0
        limits.configure(max_data_points=mdp, max_bytes=msb,
                         overrides_file=args.query_limit_overrides)
        spark, points = _spark_and_points(args)
        rdir = args.rollups_dir or (cfg["tsd.rollups.config"] or None)
        rollup_cfg = None
        if rdir:
            from opentsdb_spark.plans.rollup import load_rollup_config

            rollup_cfg = load_rollup_config(spark, rdir)
            if args.rollup_sla:
                from opentsdb_spark.timeparse import parse_duration_ms

                rollup_cfg.sla_ms = parse_duration_ms(args.rollup_sla)
        serve(
            TSD(
                spark, points,
                rollup_cfg=rollup_cfg,
                static_dir=args.static_dir or (cfg["tsd.http.staticroot"] or None),
                cache_dir=args.cache_dir or (cfg["tsd.http.cachedir"] or None),
                mode=args.mode or cfg["tsd.mode"],
                cors_domains=args.cors_domains
                or (cfg["tsd.http.request.cors_domains"] or None),
                cors_headers=args.cors_headers
                or (cfg["tsd.http.request.cors_headers"] or None),
                no_diediedie=tsdconf.as_bool(cfg["tsd.no_diediedie"]),
                trees_dir=args.trees_dir,
            ),
            port=args.port if args.port is not None else int(cfg["tsd.network.port"]),
            telnet_port=args.telnet_port,
        )
    elif args.cmd == "metasync":
        from opentsdb_spark.operators.uid import (
            TSMETA_SCHEMA, UIDMETA_SCHEMA, meta_purge, meta_sync,
        )

        spark, points = _spark_and_points(args)
        up, tp = os.path.join(args.meta_dir, "uidmeta"), os.path.join(args.meta_dir, "tsmeta")
        if args.purge:
            um, tm = meta_purge(spark)
        else:
            um = spark.read.parquet(up) if os.path.isdir(up) else None
            tm = spark.read.parquet(tp) if os.path.isdir(tp) else None
            um, tm = meta_sync(points, um, tm)
        # frames may read from the target paths — materialize before overwrite
        um_rows, tm_rows = um.collect(), tm.collect()
        spark.createDataFrame(um_rows, UIDMETA_SCHEMA).write.mode("overwrite").parquet(up)
        spark.createDataFrame(tm_rows, TSMETA_SCHEMA).write.mode("overwrite").parquet(tp)
        print(json.dumps({"uidmeta": len(um_rows), "tsmeta": len(tm_rows),
                          "purged": bool(args.purge)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
