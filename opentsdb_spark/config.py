"""opentsdb.conf-style configuration (reference src/utils/Config.java).

The reference reads a java-properties file (``key = value`` lines, ``#``/
``!`` comments) and exposes the merged default+file map to every component
plus the ShowConfig RPC. Here the same file format drives the engine's
knobs: parse with :func:`load_config`, wire with :func:`apply_config`
(query limits, delete gate, filter expansion cap, duplicate policy, CORS /
mode / ports for the daemon are read back by ``cli tsd``).

Unknown keys are kept verbatim — the reference carries the full map and
plugins read arbitrary keys (Config.java:overrideConfig), and /api/config
serves whatever was loaded.
"""

from __future__ import annotations

# reference defaults this engine acts on (src/utils/Config.java:565-640);
# keys the engine has no analog for (HBase/Netty internals) are accepted
# from the file but only echoed by /api/config
DEFAULTS: dict[str, str] = {
    "tsd.mode": "rw",
    "tsd.network.port": "4242",
    "tsd.http.staticroot": "",
    "tsd.http.cachedir": "",
    "tsd.http.query.allow_delete": "false",
    "tsd.http.request.cors_domains": "",
    "tsd.http.request.cors_headers": "",
    "tsd.no_diediedie": "false",
    "tsd.query.filter.expansion_limit": "4096",
    "tsd.query.limits.data_points.default": "0",
    "tsd.query.limits.bytes.default": "0",
    # JSON file of per-metric {regex, dataPointsLimit, byteLimit} overrides
    # (src/query/QueryLimitOverride.java, tsd.query.limits.overrides.config)
    "tsd.query.limits.overrides.config": "",
    "tsd.storage.fix_duplicates": "false",
    # strict reference parity for /q style validation: the reference's
    # STYLE_VALIDATOR (src/tsd/GraphHandler.java:84) rejects style=lines;
    # this engine accepts it as a documented extension. Set true to reject
    # it verbatim like the reference (for parity harnesses).
    "tsd.http.graph.strict_style": "false",
    # rollup-build directory to attach at boot (the reference's
    # tsd.rollups.config names a JSON registry file; ours IS the manifest
    # dir written by `tsdb rollup-build`)
    "tsd.rollups.config": "",
}

# the map most recently applied via apply_config (served by /api/config)
LOADED: dict[str, str] = {}


def parse_properties(text: str) -> dict[str, str]:
    """Minimal java-properties subset: ``k = v`` / ``k: v`` / ``k v``,
    ``#`` and ``!`` comment lines, surrounding whitespace trimmed."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in "#!":
            continue
        # java-properties splits at the FIRST of '='/':'/whitespace — a
        # fixed '=' preference would mis-split 'k: v=x' at the '=' inside
        # the value
        cut = min((i for i in (line.find("="), line.find(":"),
                               line.find(" "), line.find("\t")) if i >= 0),
                  default=-1)
        if cut < 0:
            k, v = line, ""
        else:
            k, v = line[:cut], line[cut + 1:].lstrip()
            # 'k = v': the cut lands on the whitespace BEFORE the '=' —
            # java-properties then skips one optional '='/':' after the key
            if line[cut] in " \t" and v[:1] in "=:":
                v = v[1:].lstrip()
        k, v = k.strip(), v.strip()
        if k:
            out[k] = v
    return out


def load_config(path: str | None = None) -> dict[str, str]:
    """DEFAULTS overlaid with the file at ``path`` (if given)."""
    cfg = dict(DEFAULTS)
    if path:
        with open(path) as fh:
            cfg.update(parse_properties(fh.read()))
    return cfg


def as_bool(v: str) -> bool:
    return str(v).strip().lower() in ("true", "1", "yes")


def apply_config(cfg: dict[str, str]) -> None:
    """Push the recognized keys into the engine's module knobs. The
    daemon-shape keys (mode/port/staticroot/cors) are not pushed anywhere —
    ``cli tsd`` reads them out of the returned map itself."""
    from opentsdb_spark import api
    from opentsdb_spark.functions import filters
    from opentsdb_spark.plans import limits, planner

    limits.configure(
        max_data_points=int(cfg.get("tsd.query.limits.data_points.default", 0)),
        max_bytes=int(cfg.get("tsd.query.limits.bytes.default", 0)),
        overrides_file=cfg.get("tsd.query.limits.overrides.config") or None,
    )
    api.ALLOW_DELETE = as_bool(cfg.get("tsd.http.query.allow_delete", "false"))
    filters.EXPANSION_LIMIT = int(
        cfg.get("tsd.query.filter.expansion_limit", 4096)
    )
    planner.FIX_DUPLICATES = as_bool(
        cfg.get("tsd.storage.fix_duplicates", "false")
    )
    api.STRICT_STYLE = as_bool(
        cfg.get("tsd.http.graph.strict_style", "false")
    )
    LOADED.clear()
    LOADED.update(cfg)
