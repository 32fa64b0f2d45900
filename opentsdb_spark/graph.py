"""PNG graph rendering for the legacy /q endpoint.

The reference shells out to gnuplot (src/tsd/GraphHandler.java:394-410,
src/graph/Plot.java:239-330, src/mygnuplot.sh); this module re-implements
the drawing surface in pure stdlib (zlib + struct — no PIL/matplotlib in
the engine environment) so /q?png serves a real image.

Parameter parity with GraphHandler.parseHttpGraph / Plot.java:
  wxh        "WIDTHxHEIGHT", min 100x100 (GraphHandler.java:676-706;
             Plot.java:72-75 defaults 1024x768)
  title      graph title (GraphHandler.java:828-835)
  ylabel     y-axis label (GraphHandler.java:774-781)
  ylog       log-scale y axis (GraphHandler.java:814-816)
  y2log      log-scale right y2 axis (GraphHandler.java:817-819)
  yrange     "[min:max]" with either side empty (GraphHandler.java:758-765)
  y2range    "[min:max]" for the right y2 axis (GraphHandler.java:766-773)
  y2label    right-axis label (GraphHandler.java:782-789)
  yformat    printf-style y tick format (GraphHandler.java:790-797)
  y2format   printf-style y2 tick format (GraphHandler.java:798-805)
  xformat    strftime x tick format (GraphHandler.java:806-813; xdata is
             time, so the codes are time specifiers)
  key        legend position tokens out|left|top|center|right|horiz|box|
             bottom (GraphHandler.java:820-826 KEY_VALIDATOR)
  nokey      suppress the legend; default is gnuplot "set key right box"
             (Plot.java:316-318)
  bgcolor    "xRRGGBB" background (GraphHandler.java:836-843)
  fgcolor    "xRRGGBB" foreground (GraphHandler.java:844-851)
  style      data style; "points", "circles", "dots" or the default
             "linespoint" (Plot.java:312-314; STYLE_VALIDATOR
             GraphHandler.java:84 — "lines" kept as an engine extension)
  smooth     gnuplot "smooth <kind>" (GraphHandler.java:852-858 validator,
             Plot.java:376-378 forwards to the plot command). Data-transform
             kinds (unique/frequency/fnormal/cumulative/cnormal/bins/unwrap)
             rewrite the series values exactly as gnuplot documents them;
             curve kinds (csplines/acsplines/mcsplines = interpolating
             spline, bezier/sbezier = approximating curve) draw a smoothed
             polyline through/along the points; zsort has no geometric
             effect on 2-D lines and passes through.

The drawing itself follows gnuplot's defaults the reference relies on:
grid lines at the tics, rotated time labels on x (Plot.java:298-310,
xFormat by span), classic line-type color cycle, legend swatches.
"""

from __future__ import annotations

import math
import struct
import time as _time
import zlib
from typing import Any

MIN_PIXELS = 100  # Plot.java:68-70
DEFAULT_W, DEFAULT_H = 1024, 768  # Plot.java:72-75

# gnuplot classic line-type cycle (lt 1..8)
PALETTE = [
    (0xFF, 0x00, 0x00),  # red
    (0x00, 0xA0, 0x00),  # green
    (0x00, 0x00, 0xFF),  # blue
    (0xC0, 0x00, 0xC0),  # magenta
    (0x00, 0xA0, 0xA0),  # cyan
    (0xA0, 0x60, 0x00),  # brown
    (0xFF, 0x80, 0x00),  # orange
    (0x60, 0x60, 0x60),  # grey
]

# ---------------------------------------------------------------- 5x7 font
# bits: 5 columns per row, MSB = leftmost column; 7 rows per glyph.
_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x11, 0x0A, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ",": (0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    "%": (0x19, 0x19, 0x02, 0x04, 0x08, 0x13, 0x13),
    "=": (0x00, 0x00, 0x1F, 0x00, 0x1F, 0x00, 0x00),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    "*": (0x00, 0x0A, 0x04, 0x1F, 0x04, 0x0A, 0x00),
    "|": (0x04, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "{": (0x06, 0x04, 0x04, 0x08, 0x04, 0x04, 0x06),
    "}": (0x0C, 0x04, 0x04, 0x02, 0x04, 0x04, 0x0C),
    "<": (0x02, 0x04, 0x08, 0x10, 0x08, 0x04, 0x02),
    ">": (0x08, 0x04, 0x02, 0x01, 0x02, 0x04, 0x08),
    "#": (0x0A, 0x0A, 0x1F, 0x0A, 0x1F, 0x0A, 0x0A),
    "!": (0x04, 0x04, 0x04, 0x04, 0x04, 0x00, 0x04),
    "?": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x00, 0x04),
    "'": (0x04, 0x04, 0x08, 0x00, 0x00, 0x00, 0x00),
    '"': (0x0A, 0x0A, 0x00, 0x00, 0x00, 0x00, 0x00),
    "[": (0x0E, 0x08, 0x08, 0x08, 0x08, 0x08, 0x0E),
    "]": (0x0E, 0x02, 0x02, 0x02, 0x02, 0x02, 0x0E),
    " ": (0, 0, 0, 0, 0, 0, 0),
}
GLYPH_W, GLYPH_H = 6, 7  # 5px glyph + 1px spacing


class Canvas:
    """Minimal RGB raster with a stdlib PNG encoder."""

    def __init__(self, width: int, height: int, bg=(0xFF, 0xFF, 0xFF)):
        self.w, self.h = width, height
        self.buf = bytearray(bytes(bg) * (width * height))

    def put(self, x: int, y: int, color) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.buf[i : i + 3] = bytes(color)

    def get(self, x: int, y: int) -> tuple[int, int, int]:
        i = (y * self.w + x) * 3
        return tuple(self.buf[i : i + 3])

    def hline(self, x0: int, x1: int, y: int, color) -> None:
        for x in range(min(x0, x1), max(x0, x1) + 1):
            self.put(x, y, color)

    def vline(self, x: int, y0: int, y1: int, color) -> None:
        for y in range(min(y0, y1), max(y0, y1) + 1):
            self.put(x, y, color)

    def rect(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        self.hline(x0, x1, y0, color)
        self.hline(x0, x1, y1, color)
        self.vline(x0, y0, y1, color)
        self.vline(x1, y0, y1, color)

    def line(self, x0: int, y0: int, x1: int, y1: int, color) -> None:
        # Bresenham
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.put(x0, y0, color)
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def marker(self, x: int, y: int, color) -> None:
        """gnuplot 'linespoint' plus-sign point marker."""
        for d in (-2, -1, 1, 2):
            self.put(x + d, y, color)
            self.put(x, y + d, color)
        self.put(x, y, color)

    def circle(self, x: int, y: int, color) -> None:
        """gnuplot 'circles' hollow ring, radius 3."""
        for dx, dy in ((0, 3), (1, 3), (2, 2), (3, 1), (3, 0)):
            for sx in (1, -1):
                for sy in (1, -1):
                    self.put(x + sx * dx, y + sy * dy, color)

    def text(self, x: int, y: int, s: str, color) -> None:
        """5x7 bitmap text; lowercase folds to uppercase glyphs."""
        for ch in s:
            rows = _FONT.get(ch) or _FONT.get(ch.upper()) or _FONT["?"]
            for ry, bits in enumerate(rows):
                for rx in range(5):
                    if bits & (1 << (4 - rx)):
                        self.put(x + rx, y + ry, color)
            x += GLYPH_W

    def text_right(self, x: int, y: int, s: str, color) -> None:
        self.text(x - len(s) * GLYPH_W, y, s, color)

    def to_png(self) -> bytes:
        stride = self.w * 3
        raw = b"".join(
            b"\x00" + bytes(self.buf[y * stride : (y + 1) * stride])
            for y in range(self.h)
        )

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


# ------------------------------------------------------------- axis math
def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n tick positions at 1/2/5x10^k steps covering [lo, hi]."""
    if hi <= lo:
        hi = lo + (abs(lo) or 1.0)
    span = hi - lo
    step = 10 ** math.floor(math.log10(span / max(n, 1)))
    for mult in (1, 2, 5, 10):
        if span / (step * mult) <= n:
            step *= mult
            break
    first = math.ceil(lo / step) * step
    out = []
    t = first
    while t <= hi + step * 1e-9:
        out.append(0.0 if abs(t) < step * 1e-9 else t)
        t += step
    return out


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        a = abs(v)
        if a >= 1e9 and a % 1e9 == 0:
            return f"{int(v / 1e9)}G"
        if a >= 1e6 and a % 1e6 == 0:
            return f"{int(v / 1e6)}M"
        if a >= 1e4 and a % 1e3 == 0:
            return f"{int(v / 1e3)}K"
        return str(int(v))
    return f"{v:.6g}"


def _x_format(span_sec: float):
    """Label format by range span — Plot.xFormat() (Plot.java:334-357)."""
    if span_sec < 2 * 60:  # < 2 minutes: second resolution
        return "%H:%M:%S"
    if span_sec < 2 * 86400:  # < 2 days: minute resolution
        return "%H:%M"
    if span_sec < 2 * 7 * 86400:  # < 2 weeks: day + hour
        return "%a %H:%M"
    if span_sec < 400 * 86400:  # < ~13 months
        return "%m/%d"
    return "%Y/%m/%d"


def _parse_color(s: str | None, default):
    if not s:
        return default
    s = s.lstrip("#")
    if s.startswith("x"):  # gnuplot xRRGGBB (GraphHandler.java:836-851)
        s = s[1:]
    return tuple(int(s[i : i + 2], 16) for i in (0, 2, 4))


def parse_wxh(wxh: str | None) -> tuple[int, int]:
    """GraphHandler.java:676-706 — "WxH", both >= 100."""
    if not wxh:
        return DEFAULT_W, DEFAULT_H
    w, _, h = wxh.partition("x")
    try:
        width, height = int(w), int(h)
    except ValueError:
        raise ValueError(f"Invalid wxh parameter: {wxh}")
    if width < MIN_PIXELS or height < MIN_PIXELS:
        raise ValueError(f"Parameter wxh too small: {wxh}")
    return width, height


def parse_yrange(yrange: str | None) -> tuple[float | None, float | None]:
    """gnuplot "[min:max]" with either side optional (GraphHandler.java:758).

    The reference's RANGE_VALIDATOR also admits quoted components and
    degenerate exponent-only strings ('"1"', 'e5') which it forwards to
    gnuplot; here quotes strip and anything float() cannot parse falls
    back to autoscale for that side rather than failing a request the
    validator already accepted."""
    if not yrange:
        return None, None
    s = yrange.strip().lstrip("[").rstrip("]")
    lo, _, hi = s.partition(":")

    def side(v: str) -> float | None:
        v = v.strip().strip('"')
        if not v:
            return None
        try:
            return float(v)
        except ValueError:
            return None

    return side(lo), side(hi)


def _gp_num_format(fmt: str, v: float) -> str:
    """Apply a gnuplot 'set format y' printf-style string to a tick value
    (GraphHandler.java:790-814 forwards yformat/y2format verbatim into the
    gnuplot script). Literal text is preserved; %f/%e/%g families format
    the value, %d casts it, %% is a literal percent."""
    import re

    def sub(m):
        spec = m.group(0)
        if spec == "%%":
            return "%"
        conv = spec[-1]
        if conv in "diouxX":
            return ("%" + spec[1:-1] + conv) % int(v)
        if conv in "feEgG":
            return spec % v
        if conv == "s":
            return _fmt_num(v)
        return spec  # unknown conversion: left verbatim, like gnuplot

    return re.sub(r"%%|%[#0\- +]*\d*(?:\.\d+)?[a-zA-Z]", sub, fmt)


# legend-position token set (GraphHandler.java:82-83 KEY_VALIDATOR; the
# default with no key param is gnuplot "set key right box", Plot.java:316)
KEY_TOKENS = frozenset({
    "out", "left", "top", "center", "right", "horiz", "box", "bottom",
})


# the reference's SMOOTH_VALIDATOR token set (GraphHandler.java:86)
SMOOTH_KINDS = frozenset({
    "unique", "frequency", "fnormal", "cumulative", "cnormal", "bins",
    "csplines", "acsplines", "mcsplines", "bezier", "sbezier", "unwrap",
    "zsort",
})


def _smooth_transform(pts: list[tuple[float, float]], kind: str | None):
    """Value-space smooth kinds (gnuplot data transforms) — applied BEFORE
    axis scaling so y-range follows the transformed values, as gnuplot's
    autoscale does."""
    if not kind or not pts:
        return pts
    if kind in ("unique", "frequency", "fnormal"):
        agg: dict[float, list[float]] = {}
        for t, v in pts:
            agg.setdefault(t, []).append(v)
        if kind == "unique":  # mean of duplicate x
            return [(t, sum(vs) / len(vs)) for t, vs in sorted(agg.items())]
        out = [(t, sum(vs)) for t, vs in sorted(agg.items())]
        if kind == "fnormal":
            tot = sum(abs(v) for _, v in out) or 1.0
            out = [(t, v / tot) for t, v in out]
        return out
    if kind in ("cumulative", "cnormal"):
        out, acc = [], 0.0
        for t, v in pts:
            acc += v
            out.append((t, acc))
        if kind == "cnormal" and acc:
            out = [(t, v / acc) for t, v in out]
        return out
    if kind == "bins":  # histogram of x into ~sqrt(n) bins, summed y
        n = max(1, int(math.sqrt(len(pts))))
        t0, t1 = pts[0][0], pts[-1][0]
        w = (t1 - t0) / n or 1.0
        agg2: dict[int, float] = {}
        for t, v in pts:
            b = min(n - 1, int((t - t0) / w))
            agg2[b] = agg2.get(b, 0.0) + v
        return [(t0 + (b + 0.5) * w, v) for b, v in sorted(agg2.items())]
    if kind == "unwrap":  # remove 2*pi phase jumps
        out, off, prev = [], 0.0, None
        for t, v in pts:
            if prev is not None:
                d = v - prev
                if d > math.pi:
                    off -= 2 * math.pi
                elif d < -math.pi:
                    off += 2 * math.pi
            out.append((t, v + off))
            prev = v
        return out
    return pts  # zsort + the curve kinds: no value-space change


def _curve_points(xy: list[tuple[int, int]], kind: str | None):
    """Pixel-space curve kinds: densified smooth polyline to draw instead
    of straight segments. csplines family = Catmull-Rom interpolation
    (passes through every point, like gnuplot's cubic splines);
    bezier/sbezier = one approximating Bezier with the data as control
    polygon (de Casteljau, capped control count)."""
    if not kind or kind not in ("csplines", "acsplines", "mcsplines",
                                "bezier", "sbezier") or len(xy) < 3:
        return xy
    if kind in ("bezier", "sbezier"):
        ctrl = xy if len(xy) <= 64 else xy[:: max(1, len(xy) // 64)]
        if ctrl[-1] != xy[-1]:
            ctrl = [*ctrl, xy[-1]]
        samples = max(64, 4 * len(xy))
        out = []
        for s in range(samples + 1):
            u = s / samples
            pts = [(float(x), float(y)) for x, y in ctrl]
            while len(pts) > 1:  # de Casteljau
                pts = [
                    (a[0] + (b[0] - a[0]) * u, a[1] + (b[1] - a[1]) * u)
                    for a, b in zip(pts, pts[1:])
                ]
            out.append((int(round(pts[0][0])), int(round(pts[0][1]))))
        return out
    out = [xy[0]]
    ext = [xy[0], *xy, xy[-1]]
    for i in range(1, len(ext) - 2):
        p0, p1, p2, p3 = ext[i - 1], ext[i], ext[i + 1], ext[i + 2]
        for s in range(1, 9):  # 8 samples per segment
            u = s / 8.0
            u2, u3 = u * u, u * u * u
            x = 0.5 * ((2 * p1[0]) + (-p0[0] + p2[0]) * u
                       + (2 * p0[0] - 5 * p1[0] + 4 * p2[0] - p3[0]) * u2
                       + (-p0[0] + 3 * p1[0] - 3 * p2[0] + p3[0]) * u3)
            y = 0.5 * ((2 * p1[1]) + (-p0[1] + p2[1]) * u
                       + (2 * p0[1] - 5 * p1[1] + 4 * p2[1] - p3[1]) * u2
                       + (-p0[1] + 3 * p1[1] - 3 * p2[1] + p3[1]) * u3)
            out.append((int(round(x)), int(round(y))))
    return out


def _series_label(s: dict[str, Any]) -> str:
    tags = s.get("tags") or {}
    inner = ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
    return f"{s.get('metric', '?')}{{{inner}}}" if inner else str(s.get("metric", "?"))


# ------------------------------------------------------------- renderer
def render_png(series: list[dict[str, Any]], params: dict[str, Any] | None = None) -> bytes:
    """Render query results (serialize_subquery dicts: metric/tags/dps) to a
    PNG, honoring the reference's graph parameters (module docstring)."""
    params = params or {}
    width, height = parse_wxh(params.get("wxh"))
    bg = _parse_color(params.get("bgcolor"), (0xFF, 0xFF, 0xFF))
    fg = _parse_color(params.get("fgcolor"), (0x00, 0x00, 0x00))
    grid_c = tuple(min(255, c + 200) if c < 128 else max(0, c - 40) for c in bg)
    ylog = "ylog" in params
    y2log = "y2log" in params
    style = params.get("style", "linespoint")
    smooth = params.get("smooth") or None
    y_lo_req, y_hi_req = parse_yrange(params.get("yrange"))
    y2_lo_req, y2_hi_req = parse_yrange(params.get("y2range"))
    yformat = params.get("yformat") or None
    y2format = params.get("y2format") or None
    xformat = params.get("xformat") or None
    key_tokens = set()
    if params.get("key"):
        key_tokens = {t for t in str(params["key"]).split() if t in KEY_TOKENS}

    cv = Canvas(width, height, bg)

    # gather points; a series whose per-sub-query "__opts" plot option
    # contains x1y2 scales against the RIGHT y2 axis (Plot.java:338-341,
    # 380-389 append the o= option to the plot spec)
    data: list[tuple[str, list[tuple[float, float]], bool]] = []
    for s in series:
        dps = s.get("dps")
        if not dps:
            continue
        # skip NaN AND +/-Inf: an infinite point (rate over a counter
        # reset, gexp divide-by-zero) would overflow the tick math
        pts = sorted(
            (float(t), float(v))
            for t, v in dps.items()
            if v is not None and v == v and abs(float(v)) != float("inf")
        )
        pts = _smooth_transform(pts, smooth)
        if pts:
            data.append((_series_label(s), pts,
                         "x1y2" in str(s.get("__opts", ""))))

    has_y2 = any(y2 for _, _, y2 in data)
    ml, mr, mt, mb = 64, 64 if has_y2 else 16, 28, 40  # margins
    # "set key out": reserve a strip above the plot for the legend
    # (gnuplot shrinks the plot area to fit an outside key)
    if "out" in key_tokens and "nokey" not in params and data:
        labels_h = (
            GLYPH_H + 8 if "horiz" in key_tokens
            else len(data) * (GLYPH_H + 3) + 10
        )
        mt += labels_h
    px0, px1 = ml, width - 1 - mr
    py0, py1 = mt, height - 1 - mb

    title = params.get("title")
    if title:
        cv.text((width - len(title) * GLYPH_W) // 2, 8, title, fg)

    if not data:
        cv.rect(px0, py0, px1, py1, fg)
        cv.text((width - 7 * GLYPH_W) // 2, (py0 + py1) // 2, "NO DATA", fg)
        return cv.to_png()

    tmin = min(p[0][0] for _, p, _y in data)
    tmax = max(p[-1][0] for _, p, _y in data)
    y1_vals = [v for _, p, y2 in data if not y2 for _, v in p]
    y2_vals = [v for _, p, y2 in data if y2 for _, v in p]
    # all-series-on-y2 still needs a left scale — mirror y2's
    vmin = min(y1_vals or y2_vals)
    vmax = max(y1_vals or y2_vals)
    v2min = min(y2_vals) if y2_vals else 0.0
    v2max = max(y2_vals) if y2_vals else 1.0
    if y_lo_req is not None:
        vmin = y_lo_req
    if y_hi_req is not None:
        vmax = y_hi_req
    if y2_lo_req is not None:
        v2min = y2_lo_req
    if y2_hi_req is not None:
        v2max = y2_hi_req
    if ylog:
        vmin = max(vmin, 1e-300)
        vmax = max(vmax, vmin * 10)
    if y2log:
        v2min = max(v2min, 1e-300)
        v2max = max(v2max, v2min * 10)
    if vmax <= vmin:
        vmax = vmin + (abs(vmin) or 1.0)
    if tmax <= tmin:
        tmax = tmin + 1

    def sx(t: float) -> int:
        return px0 + int(round((t - tmin) / (tmax - tmin) * (px1 - px0)))

    def sy(v: float) -> int:
        if ylog:
            v = max(v, vmin)
            f = (math.log10(v) - math.log10(vmin)) / (
                math.log10(vmax) - math.log10(vmin)
            )
        else:
            f = (v - vmin) / (vmax - vmin)
        return py1 - int(round(max(0.0, min(1.0, f)) * (py1 - py0)))

    if v2max <= v2min:
        v2max = v2min + (abs(v2min) or 1.0)

    def sy2(v: float) -> int:
        # right-hand scale; "y2log" gives it its own log mapping
        # ("set logscale y2", GraphHandler.java:817-819)
        if y2log:
            v = max(v, v2min)
            f = (math.log10(v) - math.log10(v2min)) / (
                math.log10(v2max) - math.log10(v2min)
            )
        else:
            f = (v - v2min) / (v2max - v2min)
        return py1 - int(round(max(0.0, min(1.0, f)) * (py1 - py0)))

    # grid + tics ("set grid", Plot.java:312)
    if ylog:
        d0, d1 = math.floor(math.log10(vmin)), math.ceil(math.log10(vmax))
        yticks = [10.0 ** d for d in range(int(d0), int(d1) + 1)]
    else:
        yticks = _nice_ticks(vmin, vmax)
    ylab = (lambda v: _gp_num_format(yformat, v)) if yformat else _fmt_num
    for v in yticks:
        if not (vmin <= v <= vmax):
            continue
        y = sy(v)
        cv.hline(px0 + 1, px1 - 1, y, grid_c)
        cv.hline(px0 - 3, px0, y, fg)
        cv.text_right(px0 - 5, y - GLYPH_H // 2, ylab(v), fg)

    if has_y2:  # "set y2tics border" (Plot.java:338-341)
        if y2log:
            e0 = math.floor(math.log10(v2min))
            e1 = math.ceil(math.log10(v2max))
            y2ticks = [10.0 ** d for d in range(int(e0), int(e1) + 1)]
        else:
            y2ticks = _nice_ticks(v2min, v2max)
        y2lab = (lambda v: _gp_num_format(y2format, v)) if y2format else _fmt_num
        for v in y2ticks:
            if not (v2min <= v <= v2max):
                continue
            y = sy2(v)
            cv.hline(px1, px1 + 3, y, fg)
            cv.text(px1 + 5, y - GLYPH_H // 2, y2lab(v), fg)

    # xformat overrides the span-chosen strftime pattern ("set format x",
    # GraphHandler.java:806-814 — time specifiers, since xdata is time)
    fmt = xformat or _x_format(tmax - tmin)
    for t in _nice_ticks(tmin, tmax, 6):
        if not (tmin <= t <= tmax):
            continue
        x = sx(t)
        cv.vline(x, py0 + 1, py1 - 1, grid_c)
        cv.vline(x, py1, py1 + 3, fg)
        label = _time.strftime(fmt, _time.gmtime(t))
        cv.text(x - len(label) * GLYPH_W // 2, py1 + 6, label, fg)

    ylabel = params.get("ylabel")
    if ylabel:  # horizontal at top-left of the axis (no rotation in 5x7 raster)
        cv.text(4, py0 - GLYPH_H - 4, ylabel, fg)
    y2label = params.get("y2label")
    if y2label and has_y2:  # right-axis label (Plot.java "set y2label")
        cv.text_right(width - 4, py0 - GLYPH_H - 4, y2label, fg)

    cv.rect(px0, py0, px1, py1, fg)

    # series ("set style data linespoint", Plot.java:312-314; "smooth"
    # curve kinds densify the drawn polyline, Plot.java:376-378)
    for i, (_, pts, on_y2) in enumerate(data):
        color = PALETTE[i % len(PALETTE)]
        ymap = sy2 if on_y2 else sy
        xy = [(sx(t), ymap(v)) for t, v in pts]
        if style in ("lines", "linespoint"):
            prev = None
            for x, y in _curve_points(xy, smooth):
                if prev is not None:
                    cv.line(prev[0], prev[1], x, y, color)
                prev = (x, y)
        if style in ("points", "linespoint"):
            for x, y in xy:  # markers stay on the DATA points
                cv.marker(x, y, color)
        if style == "circles":  # STYLE_VALIDATOR token (GraphHandler.java:84)
            for x, y in xy:
                cv.circle(x, y, color)
        if style == "dots":  # single-pixel points, as gnuplot draws them
            for x, y in xy:
                cv.put(x, y, color)

    # annotations: a vertical marker at each note's startTime plus a
    # white-backed label along the bottom of the plot (Plot.java:345-370:
    # "set arrow from <ts>, graph 0 to <ts>, graph 1 nohead ls 3" + a
    # FRONT label over a white rectangle; ls 3 is classic-gnuplot blue —
    # drawn after the series so the labels sit on top, as "front" does)
    notes: list[dict[str, Any]] = []
    seen_notes: set[tuple] = set()
    for s in series:
        for n in (s.get("annotations") or []) + (s.get("globalAnnotations") or []):
            key = (n.get("startTime"), n.get("description"))
            if key not in seen_notes:
                seen_notes.add(key)
                notes.append(n)
    for n in sorted(notes, key=lambda n: n.get("startTime") or 0):
        nt = n.get("startTime")
        if nt is None or not (tmin <= float(nt) <= tmax):
            continue
        x = sx(float(nt))
        cv.vline(x, py0 + 1, py1 - 1, (0x00, 0x00, 0xFF))
        desc = str(n.get("description") or "")[:24]
        if desc:
            w = len(desc) * GLYPH_W
            lx = max(px0 + 1, min(x - w // 2, px1 - w - 1))
            for yy in range(py1 - GLYPH_H - 4, py1 - 1):
                cv.hline(lx - 2, min(lx + w + 2, px1 - 1), yy, bg)
            cv.text(lx, py1 - GLYPH_H - 3, desc, fg)

    # legend — default "set key right box" (Plot.java:316-318); a key=
    # param repositions it with gnuplot's tokens (GraphHandler.java:820-826;
    # out|left|top|center|right|horiz|box|bottom). 'box' draws the border —
    # implied by the default, opt-in once any key= is given, as in gnuplot.
    if "nokey" not in params:
        labels = [lbl for lbl, _, _y in data]
        horiz = "horiz" in key_tokens
        if horiz:
            items_w = [len(x) * GLYPH_W + 26 for x in labels]
            kw = sum(items_w) + 8
            kh = GLYPH_H + 8
        else:
            kw = max(len(x) for x in labels) * GLYPH_W + 30
            kh = len(labels) * (GLYPH_H + 3) + 6
        # horizontal anchor: left | center | right (default right)
        if "left" in key_tokens:
            kx0 = px0 + 6
        elif "center" in key_tokens:
            kx0 = (px0 + px1 - kw) // 2
        else:
            kx0 = px1 - 6 - kw
        # vertical anchor: top | center | bottom (default top); "out" uses
        # the strip reserved above the plot
        if "out" in key_tokens:
            ky0 = py0 - kh - 4
        elif "bottom" in key_tokens:
            ky0 = py1 - 6 - kh
        elif "center" in key_tokens and not ("top" in key_tokens or
                                             "bottom" in key_tokens):
            ky0 = (py0 + py1 - kh) // 2
        else:
            ky0 = py0 + 6
        kx1, ky1 = kx0 + kw, ky0 + kh
        for y in range(ky0, ky1 + 1):  # opaque backing so lines don't bleed through
            cv.hline(kx0, kx1, y, bg)
        if "box" in key_tokens or not key_tokens:
            cv.rect(kx0, ky0, kx1, ky1, fg)
        if horiz:
            x = kx0 + 4
            for i, lbl in enumerate(labels):
                color = PALETTE[i % len(PALETTE)]
                y = ky0 + 4
                cv.hline(x, x + 16, y + GLYPH_H // 2, color)
                cv.text(x + 20, y, lbl, fg)
                x += items_w[i]
        else:
            for i, lbl in enumerate(labels):
                color = PALETTE[i % len(PALETTE)]
                y = ky0 + 5 + i * (GLYPH_H + 3)
                cv.hline(kx0 + 4, kx0 + 20, y + GLYPH_H // 2, color)
                cv.text(kx0 + 24, y, lbl, fg)

    return cv.to_png()


def decode_png_size(png: bytes) -> tuple[int, int]:
    """Parse width/height out of the IHDR chunk (test helper)."""
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", png[16:24])
    return w, h


def decode_png_pixels(png: bytes) -> tuple[int, int, bytes]:
    """Decode an RGB8/filter-0 PNG produced by Canvas.to_png (test helper)."""
    w, h = decode_png_size(png)
    # walk chunks, concatenate IDAT
    i, idat = 8, b""
    while i < len(png):
        (ln,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        if tag == b"IDAT":
            idat += png[i + 8 : i + 8 + ln]
        i += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = bytearray()
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise ValueError("unexpected PNG filter type")
        out += row[1:]
    return w, h, bytes(out)
