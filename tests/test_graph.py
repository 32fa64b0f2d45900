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


def test_ylog_and_empty_series():
    png = render_png(
        [{"metric": "m", "tags": {}, "dps": {"1000": 1.0, "2000": 1000.0}}],
        {"ylog": "", "wxh": "200x150"},
    )
    assert decode_png_size(png) == (200, 150)
    png = render_png([], {"wxh": "150x120"})  # NO DATA path
    assert decode_png_size(png) == (150, 120)


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
