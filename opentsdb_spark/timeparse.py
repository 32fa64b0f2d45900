"""OpenTSDB date/time & interval syntax parsing.

Reference semantics: src/utils/DateTime.java:57-121 (parseDateTimeString)
and src/utils/DateTime.java:imports (parseDuration). Supported forms:

  relative:  "5m-ago", "2h-ago", "30d-ago" ... units ms,s,m,h,d,w,n(month),y
  now:       "now" / "" / None (end defaults to now)
  epoch:     10-digit seconds, 13-digit milliseconds (magnitude-detected,
             reference src/core/Const.java:88-92), optional fractional secs
  absolute:  yyyy/MM/dd-HH:mm:ss | yyyy/MM/dd HH:mm:ss | yyyy/MM/dd-HH:mm
             | yyyy/MM/dd (midnight), interpreted in a given timezone.

All results are epoch MILLISECONDS (int) — the engine's canonical unit.
"""

from __future__ import annotations

import re
import time as _time
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

# duration units -> milliseconds (reference src/utils/DateTime.java parseDuration)
_UNIT_MS: dict[str, int] = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "n": 30 * 86_400_000,  # month ~= 30d for relative offsets (reference behavior)
    "y": 365 * 86_400_000,
}

_DURATION_RE = re.compile(r"^(\d+)(ms|[smhdwny])$")
_RELATIVE_RE = re.compile(r"^(\d+)(ms|[smhdwny])-ago$")


def parse_duration_ms(s: str) -> int:
    """'5m' -> 300000. Raises ValueError on bad syntax."""
    m = _DURATION_RE.match(s.strip())
    if not m:
        raise ValueError(f"invalid duration: {s!r}")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]


def parse_datetime_ms(
    value: str | int | float | None,
    tz: str = "UTC",
    now_ms: int | None = None,
) -> int:
    """Parse an OpenTSDB date spec to epoch ms. None/''/'now' -> now."""
    if now_ms is None:
        now_ms = int(_time.time() * 1000)
    if value is None:
        return now_ms
    if isinstance(value, (int, float)):
        v = float(value)
        # magnitude detection: >= 1e12 means ms (reference Const.SECOND_MASK idea)
        return int(v if v >= 1e12 else v * 1000)
    s = value.strip()
    if s == "" or s.lower() == "now":
        return now_ms
    m = _RELATIVE_RE.match(s)
    if m:
        return now_ms - int(m.group(1)) * _UNIT_MS[m.group(2)]
    if re.fullmatch(r"\d+(\.\d+)?", s):
        v = float(s)
        if "." in s:  # fractional seconds
            return int(v * 1000)
        return int(v if v >= 1e12 else v * 1000)
    tzinfo = timezone.utc if tz.upper() == "UTC" else ZoneInfo(tz)
    for fmt in ("%Y/%m/%d-%H:%M:%S", "%Y/%m/%d %H:%M:%S", "%Y/%m/%d-%H:%M", "%Y/%m/%d"):
        try:
            dt = datetime.strptime(s, fmt).replace(tzinfo=tzinfo)
            return int(dt.timestamp() * 1000)
        except ValueError:
            continue
    raise ValueError(f"unparseable date: {value!r}")


def parse_downsample_interval(spec: str) -> tuple[int, bool, str | None, int]:
    """Parse the interval part of 'interval-agg[-fill]'.

    Returns (interval_ms, calendar, calendar_unit, n).
    '0all' -> (0, False, None, 0) meaning one bucket over the whole range
    (reference src/core/DownsamplingSpecification.java:107-133; 'c' suffix ->
    calendar alignment :135-147).
    """
    s = spec.strip()
    if s in ("0all", "all"):
        return 0, False, None, 0
    calendar = False
    if s.endswith("c"):
        calendar = True
        s = s[:-1]
    m = _DURATION_RE.match(s)
    if not m:
        raise ValueError(f"invalid downsample interval: {spec!r}")
    n, unit = int(m.group(1)), m.group(2)
    return n * _UNIT_MS[unit], calendar, unit, n
