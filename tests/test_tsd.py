"""The TSD serving layer: HTTP /api/* + /q routing and the telnet line
protocol (reference src/tsd/RpcManager.java endpoint map,
src/tsd/PipelineFactory.java protocol split)."""

import json
import socket
import urllib.error
import urllib.request

import pytest

from opentsdb_spark.tsd import TSD, TelnetServer, make_http_server
from tests.conftest import EPOCH


@pytest.fixture(scope="module")
def tsd_server(spark, fixture_points):
    tsd = TSD(spark, fixture_points)
    http = make_http_server(tsd, 0)
    tel = TelnetServer(tsd, 0)
    import threading

    threading.Thread(target=http.serve_forever, daemon=True).start()
    threading.Thread(target=tel.serve_forever, daemon=True).start()
    yield tsd, http.server_address[1], tel.server_address[1]
    http.shutdown()
    tel.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        body = r.read()
        ctype = r.headers.get("Content-Type", "")
        return r.status, ctype, body


def _post(port, path, payload, method="POST"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req) as r:
        return r.status, r.read()


def test_version_config_aggregators(tsd_server):
    _, port, _ = tsd_server
    st, _, body = _get(port, "/api/version")
    assert st == 200 and json.loads(body)["engine"] == "opentsdb-spark"
    st, _, body = _get(port, "/api/aggregators")
    assert st == 200 and "zimsum" in json.loads(body)
    st, _, body = _get(port, "/api/config")
    assert st == 200


def test_query_endpoint(tsd_server):
    _, port, _ = tsd_server
    st, _, body = _get(
        port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
        "&m=sum:10m-avg:sys.cpu.user%7Bhost=*%7D",
    )
    assert st == 200
    out = json.loads(body)
    assert len(out) == 2 and all("dps" in s for s in out)


def test_none_multi_series_per_span(tsd_server):
    """agg=none over a multi-series metric emits one output series PER SPAN
    — the reference routes NONE around group-bys (TsdbQuery.java:1006-1027)
    and never hits Aggregators.None's more-than-one-value guard; the series
    must come back separate, never interleaved. ?strict_none opts into the
    typo-proof 400 rejection instead."""
    _, port, _ = tsd_server
    st, _, body = _get(
        port, f"/api/query?start={EPOCH}&end={EPOCH + 100_000}&m=none:sys.cpu.user"
    )
    assert st == 200
    out = json.loads(body)
    assert len(out) == 2
    # ascending 1..N vs descending N..1: interleaving would mix the ramps
    ramps = {tuple(v for _, v in sorted(s["dps"].items())) for s in out}
    assert all(r == tuple(sorted(r)) or r == tuple(sorted(r, reverse=True))
               for r in ramps)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
                   "&m=none:sys.cpu.user&strict_none")
    assert ei.value.code == 400
    err = json.loads(ei.value.read())["error"]
    assert "More than one value in aggregator none" in err["message"]


def test_query_limits_413(tsd_server):
    """Over-budget queries answer the reference's 413 envelope
    (QueryException REQUEST_ENTITY_TOO_LARGE, SaltScanner.java:560-605)
    instead of OOM-collecting: data-point ceiling prices the scan up front,
    byte ceiling prices it from plan statistics alone."""
    _, port, _ = tsd_server
    base = f"/api/query?start={EPOCH}&end={EPOCH + 100_000}&m=sum:sys.cpu.user"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, base + "&max_data_points=3")
    assert ei.value.code == 413
    err = json.loads(ei.value.read())["error"]
    assert err["code"] == 413 and "limit" in err["message"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, base + "&max_bytes=16")
    assert ei.value.code == 413
    assert "bytes" in json.loads(ei.value.read())["error"]["message"]
    # within budget: both ceilings clear
    st, _, _ = _get(port, base + "&max_data_points=100000&max_bytes=1000000000")
    assert st == 200


def test_suggest_and_search(tsd_server):
    _, port, _ = tsd_server
    st, _, body = _get(port, "/api/suggest?type=metrics&q=sys")
    assert st == 200 and "sys.cpu.user" in json.loads(body)
    st, _, body = _get(port, "/api/search/lookup?metric=sys.cpu.user")
    assert st == 200


def test_http_put_roundtrip(tsd_server):
    tsd, port, _ = tsd_server
    dp = {"metric": "tsd.test.http", "timestamp": EPOCH + 1, "value": 42.5,
          "tags": {"host": "h1"}}
    st, body = _post(port, "/api/put?details=", [dp])
    assert st == 200
    resp = json.loads(body)
    assert resp["success"] == 1 and resp["failed"] == 0
    st, _, body = _get(
        port, f"/api/query?start={EPOCH}&end={EPOCH + 100}&m=sum:tsd.test.http"
    )
    [series] = json.loads(body)
    assert series["dps"] == {str(EPOCH + 1): 42.5}


def test_q_graph_png_and_ascii(tsd_server):
    _, port, _ = tsd_server
    st, ctype, body = _get(
        port,
        f"/q?start={EPOCH}&end={EPOCH + 100_000}&m=sum:sys.cpu.user&png&wxh=200x150",
    )
    assert st == 200 and ctype == "image/png"
    from opentsdb_spark.graph import decode_png_size

    assert decode_png_size(body) == (200, 150)
    st, ctype, body = _get(
        port, f"/q?start={EPOCH}&end={EPOCH + 100_000}&m=sum:sys.cpu.user&ascii"
    )
    assert st == 200 and ctype.startswith("text/plain") and b"sys.cpu.user" in body


def test_encoded_query_values(tsd_server):
    """Percent-encoded tag-filter values must decode exactly once — an
    encoded '&' or '%' inside a filter value survives intact."""
    _, port, _ = tsd_server
    # literal_or(web01|web02) with the pipe percent-encoded
    st, _, body = _get(
        port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
        "&m=sum:10m-avg:sys.cpu.user%7Bhost=literal_or(web01%7Cweb02)%7D",
    )
    # {host=...} is a GROUPING filter in m= syntax -> one series per host
    out = json.loads(body)
    assert st == 200 and {s["tags"]["host"] for s in out} == {"web01", "web02"}


def test_error_envelope(tsd_server):
    _, port, _ = tsd_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/api/nosuch")
    assert e.value.code == 404
    assert json.loads(e.value.read())["error"]["code"] == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/api/query?start=bogus-time&m=sum:x")
    assert e.value.code in (400, 500)
    assert "error" in json.loads(e.value.read())


def test_annotation_crud_http(tsd_server):
    _, port, _ = tsd_server
    ann = {"startTime": EPOCH, "description": "deploy", "tsuid": "000001"}
    st, body = _post(port, "/api/annotation", ann)
    assert st == 200 and json.loads(body)["description"] == "deploy"
    st, _, body = _get(
        port,
        f"/api/annotation?start_time={EPOCH - 10}&end_time={EPOCH + 10}"
        "&tsuids=000001",
    )
    assert any(a["description"] == "deploy" for a in json.loads(body))


def test_uidmeta_tsmeta_http(tsd_server):
    _, port, _ = tsd_server
    st, body = _post(port, "/api/uid/uidmeta",
                     {"type": "metric", "name": "sys.cpu.user",
                      "description": "cpu pct"})
    assert st == 200 and json.loads(body)["description"] == "cpu pct"
    st, body = _post(port, "/api/uid/tsmeta",
                     {"tsuid": "0123", "description": "a series"})
    assert st == 200 and json.loads(body)["description"] == "a series"


def test_dual_protocol_single_port(spark, fixture_points):
    """One port serves both curl and the line protocol (reference
    PipelineFactory.DetectHttpOrRpc)."""
    import threading

    from opentsdb_spark.tsd import TSD, serve

    tsd = TSD(spark, fixture_points)
    main, tel = serve(tsd, port=0, block=False)
    assert tel is None
    port = main.server_address[1]
    # HTTP on the shared port
    st, _, body = _get(port, "/api/version")
    assert st == 200 and json.loads(body)["engine"] == "opentsdb-spark"
    # telnet on the SAME port
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    f = s.makefile("rwb")
    f.write(f"put tsd.test.dual {EPOCH + 3} 1.5 host=x\nversion\nexit\n".encode())
    f.flush()
    assert b"opentsdb-spark" in f.readline()
    s.close()
    st, _, body = _get(
        port, f"/api/query?start={EPOCH}&end={EPOCH + 100}&m=sum:tsd.test.dual"
    )
    [series] = json.loads(body)
    assert series["dps"] == {str(EPOCH + 3): 1.5}
    main.shutdown()


def test_telnet_protocol(tsd_server):
    tsd, http_port, tel_port = tsd_server
    s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
    f = s.makefile("rwb")
    f.write(
        (
            f"put tsd.test.telnet {EPOCH + 5} 7 host=web09\n"
            f"put tsd.test.telnet {EPOCH + 65} 9 host=web09\n"
            "version\n"
        ).encode()
    )
    f.flush()
    line = f.readline().decode()
    assert "opentsdb-spark" in line
    f.write(b"help\n")
    f.flush()
    assert b"put" in f.readline()
    f.write(b"badcmd\n")
    f.flush()
    assert b"unknown command" in f.readline()
    f.write(b"exit\n")
    f.flush()
    s.close()
    # the flushed points are queryable over HTTP
    st, _, body = _get(
        http_port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100}&m=sum:tsd.test.telnet",
    )
    [series] = json.loads(body)
    assert series["dps"] == {str(EPOCH + 5): 7.0, str(EPOCH + 65): 9.0}


def test_auth_denied_over_http(tsd_server):
    """An installed auth plugin that denies HTTP_QUERY surfaces as a 403
    with the reference error envelope (AuthState -> AuthError ->
    PermissionError mapping in the TSD handler)."""
    import urllib.error

    from opentsdb_spark.auth import (
        FORBIDDEN,
        Authentication,
        Authorization,
        AuthState,
        configure_auth,
    )

    class DenyQueries(Authentication, Authorization):
        def authenticate_http(self, request):
            return AuthState("tester")

        def authenticate_telnet(self, command):
            return AuthState("tester")

        def authorization(self):
            return self

        def has_permission(self, state, permission):
            if permission == "HTTP_QUERY":
                return AuthState(state.user, FORBIDDEN, "queries disabled")
            return state

        def allow_query(self, state, tsquery):
            return state

    _, port, _ = tsd_server
    configure_auth(DenyQueries())
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, f"/api/query?start={EPOCH}&end={EPOCH + 100}&m=sum:sys.cpu.user")
        assert e.value.code == 403
        assert json.loads(e.value.read())["error"]["code"] == 403
        # non-query endpoints stay reachable
        st, _, _ = _get(port, "/api/version")
        assert st == 200
    finally:
        configure_auth(None)
    st, _, _ = _get(port, f"/api/query?start={EPOCH}&end={EPOCH + 100}&m=sum:sys.cpu.user")
    assert st == 200


def test_bare_flag_params(tsd_server):
    """A bare '?ms&show_tsuids' must behave as set (reference
    hasQueryStringParam presence semantics, QueryRpc.java:550-556)."""
    _, port, _ = tsd_server
    st, _, body = _get(
        port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100_000}&ms&show_tsuids"
        "&m=sum:10m-avg:sys.cpu.user%7Bhost=*%7D",
    )
    assert st == 200
    out = json.loads(body)
    for s in out:
        assert "tsuids" in s  # show_tsuids honored
        assert all(len(k) == 13 for k in s["dps"])  # ms-resolution keys


def test_tsuid_get_query(tsd_server):
    """GET ?tsuid=agg:[ds:]tsuid[,tsuid] sub-queries (reference
    QueryRpc.parseTsuidTypeSubQuery, QueryRpc.java:693-740)."""
    from urllib.parse import quote

    _, port, _ = tsd_server
    sid = quote("sys.cpu.user{dc=lga,host=web01}")
    st, _, body = _get(
        port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100_000}&tsuid=sum:{sid}",
    )
    assert st == 200
    [series] = json.loads(body)
    assert series["metric"] == "sys.cpu.user" and len(series["dps"]) > 0
    # downsampled two-tsuid aggregate parses and aggregates both series
    sid2 = quote("sys.cpu.user{dc=phx,host=web02}")
    st, _, body = _get(
        port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
        f"&tsuid=sum:10m-avg:{sid},{sid2}",
    )
    assert st == 200 and len(json.loads(body)) == 1


def test_config_filters(tsd_server):
    _, port, _ = tsd_server
    st, _, body = _get(port, "/api/config/filters")
    assert st == 200
    out = json.loads(body)
    assert set(out) >= {"literal_or", "iwildcard", "regexp", "not_key"}
    assert "description" in out["literal_or"] and "examples" in out["regexp"]


def test_telnet_rollup_and_dropcaches(tsd_server):
    tsd, http_port, tel_port = tsd_server
    s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
    f = s.makefile("rwb")
    f.write(
        (
            f"rollup 1h:sum tsd.test.rollup {EPOCH} 42 host=web01\n"
            "dropcaches\n"
        ).encode()
    )
    f.flush()
    assert b"Caches dropped" in f.readline()
    f.write(b"rollup bogus\ndropcaches\n")  # short line -> counted failed
    f.flush()
    assert b"invalid line" in f.readline()
    assert b"Caches dropped" in f.readline()
    f.write(b"exit\n")
    f.flush()
    s.close()
    row = tsd.rollups.where("metric = 'tsd.test.rollup'").collect()
    assert len(row) == 1
    assert row[0]["interval"] == "1h" and row[0]["aggregator"] == "sum"
    assert row[0]["value"] == 42.0 and row[0]["tags"]["host"] == "web01"


def test_telnet_histogram(tsd_server):
    """Telnet ``histogram`` round-trips into the histogram frame — both the
    bare simple-text form (lower,upper=count pairs + u=/o=, reference
    HistogramDataPointRpc.parseTelnet) and the codec-id + base64 form."""
    import base64

    tsd, http_port, tel_port = tsd_server
    b64 = base64.b64encode(b'{"b": {"5,10": 3}, "u": 0, "o": 2}').decode()
    s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
    f = s.makefile("rwb")
    f.write(
        (
            f"histogram tsd.test.hist {EPOCH + 5} 0.0,10.0=4:10.0,50.0=2:u=1:o=0 host=web01\n"
            f"histogram tsd.test.hist {EPOCH + 65} 0 {b64} host=web01\n"
            "histogram bogus\n"
            "version\n"
        ).encode()
    )
    f.flush()
    assert b"invalid line" in f.readline()
    assert b"opentsdb-spark" in f.readline()
    f.write(b"exit\n")
    f.flush()
    s.close()
    rows = {int(r["ts"].timestamp()): r
            for r in tsd.histograms.where("metric = 'tsd.test.hist'").collect()}
    simple = rows[EPOCH + 5]
    assert [(b["lower"], b["upper"], b["count"]) for b in simple["buckets"]] == \
        [(0.0, 10.0, 4), (10.0, 50.0, 2)]
    assert simple["underflow"] == 1 and simple["overflow"] == 0
    coded = rows[EPOCH + 65]
    assert [(b["lower"], b["upper"], b["count"]) for b in coded["buckets"]] == \
        [(5.0, 10.0, 3)]
    assert coded["overflow"] == 2 and coded["tags"]["host"] == "web01"
    # the ingested histograms serve percentile queries over HTTP
    st, _, body = _get(
        http_port,
        f"/api/query?start={EPOCH}&end={EPOCH + 100}"
        "&m=sum:percentiles%5B50%5D:tsd.test.hist",
    )
    assert st == 200
    [series] = json.loads(body)
    # p50 per point: {[0,10):4,[10,50):2,u=1} -> midpoint 5.0;
    # {[5,10):3,o=2} -> midpoint 7.5
    assert list(series["dps"].values()) == [5.0, 7.5]


def test_stats_subendpoints(tsd_server):
    """/api/stats/{threads,jvm,query,region_clients} (StatsRpc.java:80-96)."""
    _, port, _ = tsd_server
    st, _, body = _get(port, "/api/stats/threads")
    threads = json.loads(body)
    assert st == 200 and any(t["name"] == "MainThread" for t in threads)
    assert all("state" in t and "threadID" in t for t in threads)
    st, _, body = _get(port, "/api/stats/jvm")
    jvm = json.loads(body)
    assert jvm["memory"]["totalMemory"] > 0 and jvm["runtime"]["uptime"] > 0
    # run a query, then it must appear in the completed-query stats
    _get(port, f"/api/query?start={EPOCH}&end={EPOCH + 100_000}&m=sum:sys.cpu.user")
    st, _, body = _get(port, "/api/stats/query")
    qs = json.loads(body)
    assert st == 200 and qs["completed"]
    assert any("sum:sys.cpu.user" in str(q["query"].get("m")) for q in qs["completed"])
    st, _, body = _get(port, "/api/stats/region_clients")
    assert st == 200 and isinstance(json.loads(body), list)


def test_cors_and_gzip(spark, fixture_points):
    """CORS per RpcHandler.java:200-245: OPTIONS without config is 405;
    matched Origin gets the Access-Control headers (OPTIONS -> bare 200);
    unmatched Origin gets the 200-with-error-body quirk and NO allow-origin
    header. Plus gzip response compression on Accept-Encoding."""
    import gzip
    import threading

    tsd = TSD(spark, fixture_points, cors_domains="example.com,other.ORG")
    http = make_http_server(tsd, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    port = http.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        # matched origin: headers present, OPTIONS is a bare 200
        req = urllib.request.Request(base + "/api/version", method="OPTIONS",
                                     headers={"Origin": "Example.COM"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert r.headers["Access-Control-Allow-Origin"] == "Example.COM"
            assert "GET, POST" in r.headers["Access-Control-Allow-Methods"]
        # matched origin on a real GET rides the allow-origin header
        req = urllib.request.Request(base + "/api/version",
                                     headers={"Origin": "other.org"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Access-Control-Allow-Origin"] == "other.org"
            assert json.loads(r.read())["engine"] == "opentsdb-spark"
        # unmatched origin: 200 + error body, NO allow-origin (the
        # reference's documented quirk)
        req = urllib.request.Request(base + "/api/version",
                                     headers={"Origin": "evil.example"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert r.headers.get("Access-Control-Allow-Origin") is None
            assert "CORS domain not allowed" in json.loads(r.read())["error"]["message"]
        # gzip: big responses compress when accepted
        req = urllib.request.Request(
            base + f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
                   "&m=none:sys.cpu.user",
            headers={"Accept-Encoding": "gzip"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Encoding"] == "gzip"
            out = json.loads(gzip.decompress(r.read()))
            assert len(out) == 2
    finally:
        http.shutdown()

    # no CORS config: OPTIONS is a 405 (RpcHandler.java:206-209)
    tsd2 = TSD(spark, fixture_points)
    http2 = make_http_server(tsd2, 0)
    threading.Thread(target=http2.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{http2.server_address[1]}/api/version",
            method="OPTIONS")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 405
    finally:
        http2.shutdown()
    # '*' plus other domains is a config error (RpcHandler.java:104-109)
    with pytest.raises(ValueError):
        TSD(spark, fixture_points, cors_domains="*,example.com")


def test_config_file_and_fix_duplicates(spark, fixture_points, tmp_path):
    """opentsdb.conf loading (reference src/utils/Config.java): properties
    parse, defaults merge, /api/config serves the loaded map, and
    tsd.storage.fix_duplicates=true makes the planner resolve duplicate
    (series, ts) rows to one winner per fix_duplicates semantics."""
    from opentsdb_spark import api
    from opentsdb_spark import config as tsdconf
    from opentsdb_spark.functions import filters
    from opentsdb_spark.plans import limits, planner

    conf = tmp_path / "opentsdb.conf"
    conf.write_text(
        "# comment\n"
        "tsd.mode = ro\n"
        "tsd.query.limits.data_points.default = 1234\n"
        "tsd.query.filter.expansion_limit: 99\n"
        "tsd.storage.fix_duplicates = true\n"
        "tsd.some.plugin.key = kept-verbatim\n"
    )
    cfg = tsdconf.load_config(str(conf))
    assert cfg["tsd.mode"] == "ro"
    assert cfg["tsd.network.port"] == "4242"  # default survives
    assert cfg["tsd.some.plugin.key"] == "kept-verbatim"
    # java-properties splits at the FIRST separator: a ':'-keyed line whose
    # value contains '=' must keep the full value, and 'k = v' strips the
    # optional '=' after the whitespace cut
    p = tsdconf.parse_properties("a.key: X-Token=abc\nb.key = v\nc.key:v2")
    assert p == {"a.key": "X-Token=abc", "b.key": "v", "c.key": "v2"}
    try:
        tsdconf.apply_config(cfg)
        assert limits.DEFAULT_MAX_DATA_POINTS == 1234
        assert filters.EXPANSION_LIMIT == 99
        assert planner.FIX_DUPLICATES
        # /api/config now serves the loaded map (reference ShowConfig)
        assert api.handle_config(spark)["tsd.mode"] == "ro"

        # duplicate (series, ts) rows: with fix ON, max-(value,value_long)
        # struct wins — sum over the dup'd timestamp sees ONE point
        from pyspark.sql import functions as F

        dup = fixture_points.unionByName(
            fixture_points.limit(0)  # schema anchor
        ).unionByName(
            spark.createDataFrame(
                [("sys.cpu.user", (EPOCH + 30) * 1000, 999.0,
                  {"host": "web01", "dc": "lga"})],
                "metric string, ts_ms long, value double, tags map<string,string>",
            ).select("metric", F.timestamp_millis("ts_ms").alias("ts"),
                     "value", F.lit(None).cast("long").alias("value_long"),
                     "tags")
        )
        out = api.handle_query(
            dup, {"start": EPOCH, "end": EPOCH + 50,
                  "m": "sum:sys.cpu.user{host=literal_or(web01)}"})
        [series] = out
        # winner is max(value)=999, not 1+999
        assert series["dps"][str(EPOCH + 30)] == 999.0
    finally:
        tsdconf.apply_config(tsdconf.load_config(None))  # reset defaults
        tsdconf.LOADED.clear()
    assert not planner.FIX_DUPLICATES and limits.DEFAULT_MAX_DATA_POINTS == 0


def test_operation_modes(spark, fixture_points):
    """tsd.mode parity (RpcManager.java:295-366): ro never registers the
    write RPCs (404 / telnet 'unknown command'), wo never registers the
    read/UI RPCs; uid rejects cross-mode sub-operations itself with a 400
    (UniqueIdRpc.java:96-199); introspection works in every mode."""
    import threading

    ro = TSD(spark, fixture_points, mode="ro")
    http = make_http_server(ro, 0)
    tel = TelnetServer(ro, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    threading.Thread(target=tel.serve_forever, daemon=True).start()
    port, tport = http.server_address[1], tel.server_address[1]
    try:
        # reads + introspection live
        st, _, _ = _get(port, f"/api/query?start={EPOCH}&end={EPOCH + 100_000}"
                              "&m=sum:sys.cpu.user")
        assert st == 200
        assert _get(port, "/api/version")[0] == 200
        # writes are unregistered -> 404
        for p, payload in (("/api/put", [{"metric": "m", "timestamp": EPOCH,
                                          "value": 1, "tags": {"h": "a"}}]),
                           ("/api/rollup", []), ("/api/histogram", []),
                           ("/api/annotation", {"startTime": EPOCH})):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(port, p, payload)
            assert ei.value.code == 404, p
        # uid write sub-op 400s with the reference's message
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/api/uid/assign", {"metric": ["x"]})
        assert ei.value.code == 400
        assert "not allowed in ro mode" in ei.value.read().decode()
        # telnet put = unknown command
        s = socket.create_connection(("127.0.0.1", tport), timeout=30)
        f = s.makefile("rwb")
        f.write(f"put m {EPOCH} 1 h=a\nexit\n".encode())
        f.flush()
        assert b"unknown command: put" in f.readline()
        s.close()
    finally:
        http.shutdown()
        tel.shutdown()

    wo = TSD(spark, fixture_points, mode="wo")
    http = make_http_server(wo, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    port = http.server_address[1]
    try:
        # writes live
        st, body = _post(port, "/api/put?details=",
                         [{"metric": "m", "timestamp": EPOCH, "value": 1,
                           "tags": {"h": "a"}}])
        assert st == 200 and json.loads(body)["success"] == 1
        # reads/UI unregistered -> 404
        for p in (f"/api/query?start={EPOCH}&m=sum:sys.cpu.user",
                  "/api/suggest?type=metrics", "/q?png", "/"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(port, p)
            assert ei.value.code == 404, p
        assert _get(port, "/api/stats")[0] == 200  # introspection stays
    finally:
        http.shutdown()

    with pytest.raises(ValueError):
        TSD(spark, fixture_points, mode="bogus")


def test_logs_and_http_plugin(tsd_server):
    import logging

    tsd, http_port, _ = tsd_server
    # first hit installs the (empty) ring buffer — an empty text/plain body
    # is an empty 200 like the reference LogsRpc, NOT a 204 (no-content is
    # an explicit sentinel, never inferred from payload == "")
    st0, ctype0, body0 = _get(http_port, "/logs")
    assert st0 == 200 and "text/plain" in ctype0 and body0 == b""
    logging.getLogger("opentsdb_spark.test").warning("ringbuffer probe %d", 7)
    st, ctype, body = _get(http_port, "/logs")
    assert st == 200 and "text/plain" in ctype
    assert b"ringbuffer probe 7" in body
    st, _, body = _get(http_port, "/logs?json")
    assert any("ringbuffer probe 7" in x for x in json.loads(body))
    # level switch mirrors LogsRpc POST
    st, _, body = _get(http_port, "/logs?level=WARN")
    assert json.loads(body)["message"] == "level set to WARN"
    assert logging.getLogger("opentsdb_spark").level == logging.WARNING
    logging.getLogger("opentsdb_spark").setLevel(logging.NOTSET)

    # HttpRpcPlugin mount under /plugin/<path>, longest-prefix dispatch
    from opentsdb_spark import api as _api

    _api.register_http_plugin("myplug", lambda m, req, b: {"m": m, "echo": req.get("x")})
    st, _, body = _get(http_port, "/plugin/myplug/sub/leaf?x=1")
    assert st == 200 and json.loads(body) == {"m": "GET", "echo": "1"}
    try:
        _get(http_port, "/plugin/unmounted")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_static_files(spark, fixture_points, tmp_path_factory):
    root = tmp_path_factory.mktemp("static")
    (root / "ui.css").write_text("body { color: red }")
    sub = root / "img"
    sub.mkdir()
    (sub / "logo.gif").write_bytes(b"GIF89a")
    tsd = TSD(spark, fixture_points, static_dir=str(root))
    http = make_http_server(tsd, 0)
    import threading

    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        port = http.server_address[1]
        st, ctype, body = _get(port, "/s/ui.css")
        assert st == 200 and "text/css" in ctype and b"color: red" in body
        st, ctype, body = _get(port, "/s/img/logo.gif")
        assert st == 200 and "image/gif" in ctype and body == b"GIF89a"
        for bad in ("/s/missing.js", "/s/../secret", "/s/img/../../etc"):
            try:
                _get(port, bad)
                assert False, f"expected 404 for {bad}"
            except urllib.error.HTTPError as e:
                assert e.code == 404
    finally:
        http.shutdown()


def test_tree_endpoints_over_http(tsd_server):
    """Stored-tree lifecycle THROUGH the daemon: create -> rebuild ->
    collisions/notmatched -> list -> delete (reference TreeRpc routing;
    rebuild must not be swallowed by the edit handler)."""
    from opentsdb_spark import api as _api
    from opentsdb_spark.operators.tree import TreeStore

    old = _api.TREES
    _api.TREES = TreeStore()
    try:
        st, body = _post(http_port := tsd_server[1], "/api/tree", {
            "name": "by metric", "storeFailures": True,
            "rules": [{"type": "METRIC"}],
        })
        tid = json.loads(body)["treeId"]
        st, body = _post(http_port, "/api/tree/rebuild", {"treeId": tid})
        assert st == 200 and json.loads(body)["stored"] == [
            "collisions", "leaves", "not_matched"]
        # both fixture series collapse onto one metric leaf -> 1 collision
        st, _, body = _get(http_port, f"/api/tree/collisions?treeId={tid}")
        assert st == 200 and len(json.loads(body)) == 1
        st, _, body = _get(http_port, f"/api/tree/notmatched?treeId={tid}")
        assert st == 200 and json.loads(body) == []
        # bare GET lists stored definitions
        st, _, body = _get(http_port, "/api/tree")
        assert [t["treeId"] for t in json.loads(body)] == [tid]
        # ad-hoc rule evaluation still works on the same path
        st, body = _post(http_port, "/api/tree", {
            "rules": [{"type": "TAGK", "field": "host"}]})
        assert st == 200 and json.loads(body)
    finally:
        _api.TREES = old


def test_telnet_put_auth_gate(tsd_server):
    """Telnet put/rollup honor the auth plugin like HTTP put does."""
    from opentsdb_spark.auth import (
        FORBIDDEN, Authentication, Authorization, AuthState, configure_auth,
    )

    class DenyTelnet(Authentication, Authorization):
        def authenticate_telnet(self, command):
            return AuthState("tester")

        def authenticate_http(self, request):
            return AuthState("tester")

        def authorization(self):
            return self

        def has_permission(self, state, permission):
            if permission == "TELNET_PUT":
                return AuthState(state.user, FORBIDDEN, "writes disabled")
            return state

        def allow_query(self, state, tsquery):
            return state

    tsd, _, tel_port = tsd_server
    configure_auth(DenyTelnet())
    try:
        s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
        f = s.makefile("rwb")
        f.write(f"put tsd.test.denied {EPOCH} 1 host=a\nexit\n".encode())
        f.flush()
        assert b"auth denied" in f.readline()
        s.close()
    finally:
        configure_auth(None)
    assert tsd.points.where("metric = 'tsd.test.denied'").count() == 0


def test_graph_etags_and_redirect_lists(tsd_server):
    _, http_port, _ = tsd_server
    # empty sub-query still holds its etags slot (one entry per query)
    st, _, body = _get(
        http_port,
        f"/q?json&start={EPOCH}&end={EPOCH + 100}"
        "&m=sum:sys.cpu.user&m=sum:no.such.metric",
    )
    out = json.loads(body)
    assert len(out["etags"]) == 2 and out["etags"][1] == []
    # redirect keeps list params as repeated pairs, not a Python repr
    st, _, body = _get(http_port, f"/q?start={EPOCH}&m=sum:sys.cpu.user")
    frag = json.loads(body)["redirect"]
    assert "m=sum%3Asys.cpu.user" in frag and "%5B" not in frag


def test_annotation_bulk_update(tsd_server):
    tsd, http_port, _ = tsd_server
    notes = [
        {"startTime": EPOCH + 1, "description": "d1", "tsuid": "000001"},
        {"startTime": EPOCH + 2, "description": "d2"},  # global
    ]
    st, body = _post(http_port, "/api/annotation/bulk", notes)
    out = json.loads(body)
    assert st == 200 and len(out) == 2
    assert {o["description"] for o in out} == {"d1", "d2"}
    # both records are queryable afterwards
    st, _, body = _get(
        http_port,
        f"/api/annotation?start_time={EPOCH}&end_time={EPOCH + 100}"
        "&tsuids=000001",
    )
    descs = {a["description"] for a in json.loads(body)}
    assert {"d1", "d2"} <= descs  # tsuid-scoped + global


def test_concurrent_queries(tsd_server):
    """The daemon serves parallel queries correctly (thread-per-request,
    shared SparkSession, per-thread scratch release)."""
    import concurrent.futures

    _, http_port, _ = tsd_server

    def one(i):
        path = (f"/api/query?start={EPOCH}&end={EPOCH + 100}"
                f"&m={'sum' if i % 2 else 'max'}:sys.cpu.user")
        st, _, body = _get(http_port, path)
        assert st == 200
        [series] = json.loads(body)
        return series["dps"][str(EPOCH + 30)]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(16)))
    # max:(300.0) alternating with sum:(1+300)
    assert set(results) == {301.0, 300.0}


def test_http_204_no_body_keepalive(tsd_server):
    """A bare put returns a true 204 (no body) and the keep-alive
    connection stays usable for the next request (RFC 7230)."""
    import http.client

    _, http_port, _ = tsd_server
    conn = http.client.HTTPConnection("127.0.0.1", http_port, timeout=30)
    try:
        conn.request("POST", "/api/put", json.dumps({
            "metric": "tsd.test.keepalive", "timestamp": EPOCH,
            "value": 1, "tags": {"h": "a"},
        }), {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 204
        assert r.read() == b""  # NO body after 204
        # same connection, next request must parse cleanly
        conn.request("GET", "/api/version")
        r2 = conn.getresponse()
        assert r2.status == 200 and b"version" in r2.read()
    finally:
        conn.close()


def test_auth_401_vs_403(tsd_server):
    """Unauthenticated -> 401; authenticated-but-denied -> 403."""
    from opentsdb_spark.auth import (
        FORBIDDEN, UNAUTHORIZED, Authentication, Authorization, AuthState,
        configure_auth,
    )

    class TokenAuth(Authentication, Authorization):
        def authenticate_http(self, request):
            hdrs = request.get("_headers") or {}
            if hdrs.get("authorization") == "Bearer ok":
                return AuthState("user")
            return AuthState("anon", UNAUTHORIZED, "missing token")

        def authenticate_telnet(self, command):
            return AuthState("user")

        def authorization(self):
            return self

        def has_permission(self, state, permission):
            if permission == "HTTP_QUERY" and state.user == "user":
                return AuthState(state.user, FORBIDDEN, "queries disabled")
            return state

        def allow_query(self, state, tsquery):
            return state

    _, http_port, _ = tsd_server
    configure_auth(TokenAuth())
    try:
        url = (f"http://127.0.0.1:{http_port}/api/query?start={EPOCH}"
               f"&end={EPOCH + 100}&m=sum:sys.cpu.user")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(url)
        assert e.value.code == 401  # no credentials
        req = urllib.request.Request(url, headers={"Authorization": "Bearer ok"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 403  # authenticated, permission denied
    finally:
        configure_auth(None)


def test_post_body_delete_flag(spark, fixture_points):
    """POST /api/query with \"delete\": true behaves like HTTP DELETE
    (reference TSQuery POJO setDelete), still gated by allow_delete."""
    from opentsdb_spark import api as _api
    from opentsdb_spark.tsd import TSD, make_http_server

    tsd = TSD(spark, fixture_points)
    http = make_http_server(tsd, 0)
    import threading

    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        port = http.server_address[1]
        payload = {
            "start": EPOCH, "end": EPOCH + 100, "delete": True,
            "queries": [{"metric": "sys.cpu.user", "aggregator": "sum"}],
        }
        # gate closed -> 403
        try:
            _post(port, "/api/query", payload)
            assert False, "expected 403"
        except urllib.error.HTTPError as e:
            assert e.code == 403
        _api.ALLOW_DELETE = True
        try:
            st, body = _post(port, "/api/query", payload)
            assert st == 200
        finally:
            _api.ALLOW_DELETE = False
        assert tsd.points.where(
            f"metric = 'sys.cpu.user' and ts <= timestamp_seconds({EPOCH + 100})"
        ).count() == 0
        assert tsd.points.count() > 0  # later points retained
    finally:
        http.shutdown()


def test_status_homepage_and_bare_aliases(tsd_server):
    tsd, http_port, tel_port = tsd_server
    st, ctype, body = _get(http_port, "/api/status")
    assert st == 200 and body == b"ok"
    st, ctype, body = _get(http_port, "/")
    assert st == 200 and "text/html" in ctype and b"opentsdb-spark" in body
    for alias in ("/aggregators", "/version", "/stats"):
        st, _, _ = _get(http_port, alias)
        assert st == 200, alias
    st, _, body = _get(http_port, "/suggest?type=metrics")
    assert st == 200 and json.loads(body)
    s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
    f = s.makefile("rwb")
    f.write(b"status\nexit\n")
    f.flush()
    assert f.readline().strip() == b"ok"
    s.close()


def test_rpc_counters(tsd_server):
    tsd, http_port, tel_port = tsd_server
    before = tsd.counters["rpc.received.http"]
    _get(http_port, "/api/version")
    try:
        _get(http_port, "/api/nope")
    except urllib.error.HTTPError:
        pass
    st, _, body = _get(http_port, "/api/stats")
    stats = json.loads(body)
    assert stats["rpc.received.http"] >= before + 3
    assert stats["exceptions_caught"] >= 1
    s = socket.create_connection(("127.0.0.1", tel_port), timeout=30)
    f = s.makefile("rwb")
    f.write(b"stats\nexit\n")
    f.flush()
    lines = b""
    for _ in range(20):
        ln = f.readline()
        if not ln:
            break
        lines += ln
    s.close()
    assert b"rpc.received.telnet" in lines


def test_q_graph_disk_cache(spark, fixture_points, tmp_path):
    """/q disk cache (reference tsd.http.cachedir, GraphHandler
    isDiskCacheHit/RunGnuplot): second identical request serves the cached
    bytes, ?nocache bypasses the read, ?json hits carry cachehit=disk."""
    import threading

    from opentsdb_spark.tsd import make_http_server

    tsd = TSD(spark, fixture_points, cache_dir=str(tmp_path))
    http = make_http_server(tsd, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    port = http.server_address[1]
    try:
        url = (f"/q?start={EPOCH}&end={EPOCH + 100_000}"
               "&m=sum:sys.cpu.user&png&wxh=200x150")
        st, ct, b1 = _get(port, url)
        assert st == 200 and ct.startswith("image/png")
        assert tsd.counters["http.graphs.generated"] == 1
        st, ct, b2 = _get(port, url)
        assert st == 200 and b2 == b1
        assert tsd.counters["http.graphs.diskcache_hit"] == 1
        assert tsd.counters["http.graphs.generated"] == 1
        # nocache skips the cache read (and hashes to its own basepath,
        # exactly like the reference, which never strips it from the key)
        _get(port, url + "&nocache")
        assert tsd.counters["http.graphs.generated"] == 2
        assert tsd.counters["http.graphs.diskcache_hit"] == 1
        # json: first render plain, second marked as a disk hit
        jurl = (f"/q?start={EPOCH}&end={EPOCH + 100_000}"
                "&m=sum:sys.cpu.user&json")
        _, _, jb = _get(port, jurl)
        assert "cachehit" not in json.loads(jb)
        _, _, jb2 = _get(port, jurl)
        j2 = json.loads(jb2)
        assert j2["cachehit"] == "disk"
        assert j2["points"] == json.loads(jb)["points"]
        # cache files landed under the configured dir
        exts = {p.suffix for p in tmp_path.iterdir()}
        assert ".png" in exts and ".json" in exts
    finally:
        http.shutdown()


def test_http_diediedie_shuts_down_all_listeners(spark, fixture_points):
    """HTTP /diediedie (RpcManager.java:362-366 registers DieDieDie on the
    http map too): replies the exit page, then stops EVERY listener — the
    reference's doShutdown kills the whole daemon, not one channel."""
    import threading
    import time

    tsd = TSD(spark, fixture_points)
    http = make_http_server(tsd, 0)
    tel = TelnetServer(tsd, 0)
    t1 = threading.Thread(target=http.serve_forever, daemon=True)
    t2 = threading.Thread(target=tel.serve_forever, daemon=True)
    t1.start()
    t2.start()
    st, ct, body = _get(http.server_address[1], "/diediedie")
    assert st == 200 and ct.startswith("text/html")
    assert b"You killed me" in body
    assert tsd.probe_status() == "shutting-down"
    t1.join(timeout=10)
    t2.join(timeout=10)
    assert not t1.is_alive() and not t2.is_alive()


def test_tree_edits_survive_daemon_restart(spark, fixture_points, tmp_path):
    """/api/tree with --trees-dir: definitions persist across a daemon
    restart (the reference stores tree rows in the UID table, so its trees
    equally survive), and the dir is shared with `uid treesync`."""
    import threading

    d = str(tmp_path / "trees")
    tsd = TSD(spark, fixture_points, trees_dir=d)
    http = make_http_server(tsd, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        st, body = _post(http.server_address[1], "/api/tree", {
            "name": "by dc", "rules": [{"type": "TAGK", "field": "dc"}],
        })
        assert st == 200 and json.loads(body)["treeId"] == 1
    finally:
        http.shutdown()
    # fresh daemon on the same dir sees the stored definition
    tsd2 = TSD(spark, fixture_points, trees_dir=d)
    http2 = make_http_server(tsd2, 0)
    threading.Thread(target=http2.serve_forever, daemon=True).start()
    try:
        st, ct, body = _get(http2.server_address[1], "/api/tree")
        [t] = json.loads(body)
        assert t["name"] == "by dc" and t["rules"][0]["field"] == "dc"
    finally:
        http2.shutdown()
    # and `uid treesync` builds from the SAME definitions
    from opentsdb_spark.operators.tree import load_tree_defs, treesync

    report = treesync(load_tree_defs(d), fixture_points, d)
    assert report[1]["leaves"] == 2


def test_telnet_diediedie_gated_in_ro_mode(spark, fixture_points):
    """A read-only TSD must refuse diediedie on BOTH listeners — the
    reference's registration block only runs in rw/wo and covers the
    telnet and http maps together (RpcManager.java:261,362-366)."""
    import threading

    tsd = TSD(spark, fixture_points, mode="ro")
    tel = TelnetServer(tsd, 0)
    threading.Thread(target=tel.serve_forever, daemon=True).start()
    try:
        s = socket.create_connection(
            ("127.0.0.1", tel.server_address[1]), timeout=30)
        f = s.makefile("rwb")
        f.write(b"diediedie\n")
        f.flush()
        assert b"unknown command" in f.readline()
        assert tsd.probe_status() != "shutting-down"
        s.close()
    finally:
        tel.shutdown()


def test_http_diediedie_not_registered_when_disabled(spark, fixture_points):
    """tsd.no_diediedie=true: the command is simply absent from the RPC
    map — a plain 404, exactly like an unknown endpoint."""
    import threading

    tsd = TSD(spark, fixture_points, no_diediedie=True)
    http = make_http_server(tsd, 0)
    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(http.server_address[1], "/diediedie")
        assert e.value.code == 404
    finally:
        http.shutdown()


def test_q_graph_cache_key_injective(spark, fixture_points, tmp_path):
    """The cache key must be injective over the decoded parameter map:
    a literal '&'/'=' inside a value, or a ',' inside one m= entry, must
    never collide with a parameter boundary (distinct queries served each
    other's cached graph otherwise)."""
    tsd = TSD(spark, fixture_points, cache_dir=str(tmp_path))
    paths = {
        tsd._graph_cache_basepath(req)
        for req in (
            {"title": "a&ylabel=b"},
            {"title": "a", "ylabel": "b"},
            {"m": ["sum:x", "sum:y"]},
            {"m": ["sum:x,sum:y"]},
        )
    }
    assert len(paths) == 4
