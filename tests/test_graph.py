"""PNG rendering for /q — reference src/tsd/GraphHandler.java:394-410 +
src/graph/Plot.java (gnuplot surface re-implemented in pure stdlib)."""

import pytest

from opentsdb_spark import api
from opentsdb_spark.graph import (
    DEFAULT_H,
    DEFAULT_W,
    PALETTE,
    decode_png_pixels,
    decode_png_size,
    parse_wxh,
    parse_yrange,
    render_png,
)

SERIES = [
    {
        "metric": "sys.cpu.user",
        "tags": {"host": "web01"},
        "aggregateTags": [],
        "dps": {"1356998400": 10.0, "1356998460": 20.0, "1356998520": 15.0},
    },
    {
        "metric": "sys.cpu.user",
        "tags": {"host": "web02"},
        "aggregateTags": [],
        "dps": {"1356998400": 5.0, "1356998460": 2.0, "1356998520": 30.0},
    },
]


def test_png_signature_and_default_dims():
    png = render_png(SERIES)
    w, h = decode_png_size(png)
    assert (w, h) == (DEFAULT_W, DEFAULT_H)  # Plot.java:72-75


def test_wxh_param_and_validation():
    png = render_png(SERIES, {"wxh": "300x200"})
    assert decode_png_size(png) == (300, 200)
    with pytest.raises(ValueError):
        parse_wxh("99x99")  # below 100x100 minimum (GraphHandler.java:687)
    with pytest.raises(ValueError):
        parse_wxh("banana")


def test_yrange_parse():
    assert parse_yrange("[0:100]") == (0.0, 100.0)
    assert parse_yrange("[0:]") == (0.0, None)
    assert parse_yrange("[:50.5]") == (None, 50.5)
    assert parse_yrange(None) == (None, None)


def test_deterministic():
    assert render_png(SERIES, {"title": "t"}) == render_png(SERIES, {"title": "t"})


def test_pixels_contain_series_colors_and_bg():
    png = render_png(SERIES, {"wxh": "400x300", "nokey": ""})
    w, h, px = decode_png_pixels(png)
    seen = {tuple(px[i : i + 3]) for i in range(0, len(px), 3)}
    assert (255, 255, 255) in seen  # background
    assert PALETTE[0] in seen  # first series line
    assert PALETTE[1] in seen  # second series line
    # corner pixel is background (margins)
    assert tuple(px[:3]) == (255, 255, 255)


def test_bgcolor_param():
    png = render_png(SERIES, {"wxh": "200x150", "bgcolor": "x000040", "nokey": ""})
    _, _, px = decode_png_pixels(png)
    assert tuple(px[:3]) == (0, 0, 0x40)


def test_smooth_kinds():
    """Every reference SMOOTH_VALIDATOR token renders (GraphHandler.java:86,
    852-858); transform kinds change the drawn values, curve kinds change
    the drawn line; an unknown kind 400s at the handler."""
    from opentsdb_spark.graph import (
        SMOOTH_KINDS, _curve_points, _smooth_transform,
    )

    for kind in SMOOTH_KINDS:
        png = render_png(SERIES, {"smooth": kind, "wxh": "200x150"})
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # value-space transforms
    pts = [(0.0, 1.0), (0.0, 3.0), (1.0, 2.0)]
    assert _smooth_transform(pts, "unique") == [(0.0, 2.0), (1.0, 2.0)]
    assert _smooth_transform(pts, "frequency") == [(0.0, 4.0), (1.0, 2.0)]
    assert _smooth_transform(pts, "cumulative") == [
        (0.0, 1.0), (0.0, 4.0), (1.0, 6.0)]
    cn = _smooth_transform(pts, "cnormal")
    assert cn[-1][1] == 1.0
    # curve kinds: csplines passes THROUGH the data points; bezier starts
    # and ends on them
    xy = [(0, 0), (10, 20), (20, 0)]
    cs = _curve_points(xy, "csplines")
    for p in xy:
        assert p in cs
    bz = _curve_points(xy, "bezier")
    assert bz[0] == xy[0] and bz[-1] == xy[-1]
    # a smoothed line is denser than the straight polyline
    assert len(cs) > len(xy) and len(bz) > len(xy)


def test_graph_param_validation(fixture_points):
    """bgcolor/fgcolor must be xRRGGBB, smooth must be a known kind —
    the reference 400s otherwise (GraphHandler.java:836-858)."""
    req = {"start": 1356998400, "end": 1356998800, "m": ["sum:sys.cpu.user"],
           "png": ""}
    for bad in ({"bgcolor": "red"}, {"fgcolor": "FFFFFF"},
                {"smooth": "wavy"}):
        with pytest.raises(ValueError):
            api.handle_graph(fixture_points, {**req, **bad})
    # valid values pass end-to-end
    out = api.handle_graph(
        fixture_points,
        {**req, "bgcolor": "x102030", "fgcolor": "xFFFFFF",
         "smooth": "csplines"},
    )
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"


def test_annotations_drawn(fixture_points, spark):
    """Annotations render as a blue vertical marker + bottom label
    (Plot.java:345-370 'set arrow ... nohead ls 3' + front label): the
    annotated render contains pure-blue pixels the plain one lacks."""
    from opentsdb_spark.graph import decode_png_pixels

    ann_series = [dict(SERIES[0])]
    ann_series[0]["annotations"] = [
        {"startTime": 1356998460, "description": "deploy"}]
    png = render_png(ann_series, {"wxh": "300x200", "nokey": ""})
    base = render_png([SERIES[0]], {"wxh": "300x200", "nokey": ""})
    def count_blue(p):
        w, h, px = decode_png_pixels(p)
        return sum(
            1 for i in range(0, len(px), 3)
            if px[i] == 0 and px[i + 1] == 0 and px[i + 2] == 0xFF
        )

    assert count_blue(png) > count_blue(base) + 50  # near-full-height vline

    # end-to-end: /q png with an annotation frame
    from opentsdb_spark.operators.annotations import ANNOTATION_SCHEMA

    anns = spark.createDataFrame(
        [(None, 1356998460000, None, "maint", None, None)],
        "tsuid string, s long, e long, description string, notes string, "
        "custom map<string,string>",
    ).selectExpr("tsuid", "timestamp_millis(s) AS start_time",
                 "timestamp_millis(e) AS end_time", "description", "notes",
                 "custom")
    out = api.handle_graph(
        fixture_points,
        {"start": 1356998400, "end": 1357100000, "png": "",
         "m": ["sum:sys.cpu.user"], "global_annotations": "1",
         "wxh": "300x200"},
        annotations=anns,
    )
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"


def test_per_series_axis_option(fixture_points):
    """o= plot options: one per m= (mismatch is a 400,
    GraphHandler.java:224-232); 'axis x1y2' scales that sub-query's series
    on a right-hand y2 axis (Plot.java:338-341, 380-389)."""
    req = {"start": 1356998400, "end": 1357100000, "png": "",
           "m": ["sum:sys.cpu.user{host=literal_or(web01)}",
                 "sum:sys.cpu.user{host=literal_or(web02)}"]}
    with pytest.raises(ValueError, match="`o' parameters"):
        api.handle_graph(fixture_points, {**req, "o": ["axis x1y2"]})
    out = api.handle_graph(fixture_points,
                           {**req, "o": ["", "axis x1y2"], "wxh": "400x300"})
    png = out["png"]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # the y2 variant reserves a wider right margin for the y2 tics, so the
    # rendered image differs from the plain two-series render
    plain = api.handle_graph(fixture_points, {**req, "wxh": "400x300"})
    assert png != plain["png"]


def test_ylog_and_empty_series():
    png = render_png(
        [{"metric": "m", "tags": {}, "dps": {"1000": 1.0, "2000": 1000.0}}],
        {"ylog": "", "wxh": "200x150"},
    )
    assert decode_png_size(png) == (200, 150)
    png = render_png([], {"wxh": "150x120"})  # NO DATA path
    assert decode_png_size(png) == (150, 120)


Y2_SERIES = [SERIES[0], {**SERIES[1], "__opts": "axis x1y2"}]


def test_y2_axis_params():
    """y2range / y2log / y2label each change the rendered y2 axis
    (GraphHandler.java:766-773, 782-789, 817-819): every variant renders
    and differs pixel-wise from the plain dual-axis image."""
    base = render_png(Y2_SERIES, {"wxh": "400x300", "nokey": ""})
    for extra in ({"y2range": "[0:100]"}, {"y2log": ""},
                  {"y2label": "reqs"}):
        png = render_png(Y2_SERIES, {"wxh": "400x300", "nokey": "", **extra})
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert png != base, extra


def test_tick_format_params():
    """yformat / y2format / xformat rewrite tick labels (printf-style for
    the value axes, strftime for time) — visibly different pixels."""
    base = render_png(Y2_SERIES, {"wxh": "400x300", "nokey": ""})
    for extra in ({"yformat": "%.3f ms"}, {"y2format": "%d qps"},
                  {"xformat": "%Hh%M"}):
        png = render_png(Y2_SERIES, {"wxh": "400x300", "nokey": "", **extra})
        assert png != base, extra
    from opentsdb_spark.graph import _gp_num_format

    assert _gp_num_format("%.2f ms", 1.5) == "1.50 ms"
    assert _gp_num_format("%d%%", 42.0) == "42%"
    assert _gp_num_format("%g", 1000.0) == "1000"


def test_style_circles_and_dots(fixture_points):
    """circles/dots render distinct pixels (STYLE_VALIDATOR tokens,
    GraphHandler.java:84); bad styles 400 with the reference's loose
    alternation semantics."""
    seen = set()
    for style in ("linespoint", "points", "circles", "dots", "lines"):
        png = render_png(SERIES, {"wxh": "300x200", "nokey": "",
                                  "style": style})
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert png not in seen, style
        seen.add(png)
    req = {"start": 1356998400, "end": 1356998800,
           "m": ["sum:sys.cpu.user"], "png": ""}
    with pytest.raises(ValueError, match="style"):
        api.handle_graph(fixture_points, {**req, "style": "stars"})
    out = api.handle_graph(fixture_points, {**req, "style": "circles"})
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"
    # 'lines' is a documented engine extension and must keep working
    out = api.handle_graph(fixture_points, {**req, "style": "lines"})
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"
    # strict-parity mode (tsd.http.graph.strict_style) rejects 'lines'
    # verbatim like the reference's STYLE_VALIDATOR
    api.STRICT_STYLE = True
    try:
        with pytest.raises(ValueError, match="style"):
            api.handle_graph(fixture_points, {**req, "style": "lines"})
        out = api.handle_graph(fixture_points, {**req, "style": "dots"})
        assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        api.STRICT_STYLE = False
    # quoted / exponent-only range components the reference validator
    # admits must not crash the renderer (autoscale fallback)
    out = api.handle_graph(fixture_points,
                           {**req, "yrange": '["1":"2"]', "y2range": "[e5:]"})
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"
    from opentsdb_spark.graph import parse_yrange
    assert parse_yrange('["1":"2"]') == (1.0, 2.0)
    assert parse_yrange("[e5:10]") == (None, 10.0)


def test_key_position_param():
    """key= repositions the legend (KEY_VALIDATOR tokens,
    GraphHandler.java:820-826): each placement renders differently from
    the default right-box legend, and bad tokens 400."""
    base = render_png(SERIES, {"wxh": "400x300"})
    seen = {base}
    for key in ("left top box", "bottom right box", "out horiz", "center",
                "left horiz"):
        png = render_png(SERIES, {"wxh": "400x300", "key": key})
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert png not in seen, key
        seen.add(png)


def test_graph_param_validation_round7(fixture_points):
    """y2range / formats / key validate like the reference
    (GraphHandler.java:758-826) — bad values 400, good ones render."""
    req = {"start": 1356998400, "end": 1356998800, "m": ["sum:sys.cpu.user"],
           "png": ""}
    for bad in ({"y2range": "0:100"}, {"yrange": "[1:2:3]"},
                {"yformat": "%.2f;rm"}, {"xformat": "a`b"},
                {"key": "upper left"}):
        with pytest.raises(ValueError):
            api.handle_graph(fixture_points, {**req, **bad})
    # NB the reference's FORMAT_VALIDATOR ([%0-9.a-zA-Z \-]) excludes ':' —
    # "%H %M" is the valid spelling of an hour-minute x format
    out = api.handle_graph(fixture_points, {
        **req, "y2range": "[0:100]", "yformat": "%.1f", "xformat": "%H %M",
        "key": "left top box", "y2label": "rate", "y2log": "",
    })
    assert out["png"][:8] == b"\x89PNG\r\n\x1a\n"


def test_handle_graph_png(fixture_points):
    out = api.handle_graph(
        fixture_points,
        {
            "start": 1356998400,
            "end": 1356998400 + 100_000,
            "m": "sum:10m-avg:sys.cpu.user{host=*}",
            "png": "",
            "wxh": "320x240",
            "title": "cpu",
        },
    )
    assert isinstance(out["png"], (bytes, bytearray))
    assert decode_png_size(out["png"]) == (320, 240)
    assert out["points"] == out["plotted"] > 0
