"""DuckDB-SQL replica of Spark's xxhash64 (XXH64, seed 42).

Spark's ``F.xxhash64`` is the engine's production string/array hash (the
dedup/fingerprint pipelines key candidates on it). DuckDB has no XXH64
builtin, so the oracle side re-derives it in pure SQL: 64-bit wrapping
arithmetic via HUGEINT mod 2**64, byte access via hex(encode(s)) slicing,
and the stripe/tail loops as recursive CTEs. XXH64 is a public algorithm
(Collet's xxHash); the layout below follows the public spec:

  len >= 32: four lanes seeded from the seed, one round per 8 bytes of each
             32-byte stripe, then rotate-merge + mergeRound per lane
  tail:      8-byte rounds, then one 4-byte, then per-byte, then avalanche

Spark specifics replicated here (spark/sql/catalyst XxHash64 + the unsafe
XXH64 impl): seed 42; STRING hashes its UTF-8 bytes; ARRAY<LONG> folds
hashLong(element, seed=running hash) over elements, where hashLong is the
fixed-8-byte XXH64 specialization.

``py_xxh64`` is the bit-exact Python reference the tests pin both engines
against.
"""

from __future__ import annotations

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64
SEED = 42  # Spark's fixed xxhash64 seed


# ------------------------------------------------------------ reference ----

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & (M64 - 1)


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * P2) % M64, 31) * P1) % M64


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) % M64
    h ^= h >> 29
    h = (h * P3) % M64
    h ^= h >> 32
    return h


def py_xxh64(data: bytes, seed: int = SEED) -> int:
    """Bit-exact XXH64; returns Spark's signed BIGINT value."""
    n = len(data)
    if n >= 32:
        v1, v2, v3, v4 = (
            (seed + P1 + P2) % M64, (seed + P2) % M64, seed % M64, (seed - P1) % M64,
        )
        p = 0
        while p + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[p:p + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[p + 8:p + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[p + 16:p + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[p + 24:p + 32], "little"))
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) % M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) % M64
    else:
        h = (seed + P5) % M64
        p = 0
    h = (h + n) % M64
    while p + 8 <= n:
        h ^= _round(0, int.from_bytes(data[p:p + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) % M64
        p += 8
    if p + 4 <= n:
        h ^= (int.from_bytes(data[p:p + 4], "little") * P1) % M64
        h = (_rotl(h, 23) * P2 + P3) % M64
        p += 4
    while p < n:
        h ^= (data[p] * P5) % M64
        h = (_rotl(h, 11) * P1) % M64
        p += 1
    h = _avalanche(h)
    return h - M64 if h >= 1 << 63 else h


def py_hash_long(value: int, seed: int) -> int:
    """Spark XxHash64.hashLong: XXH64 of the 8-byte LE long, unsigned seed."""
    seed &= M64 - 1
    h = (seed + P5 + 8) % M64
    h ^= _round(0, value & (M64 - 1))
    h = (_rotl(h, 27) * P1 + P4) % M64
    h = _avalanche(h)
    return h - M64 if h >= 1 << 63 else h


def py_xxh64_longs(values: list[int], seed: int = SEED) -> int:
    """Spark xxhash64 over ARRAY<LONG>: fold hashLong with the running hash
    as seed (catalyst HashExpression: result = hashLong(elem, result))."""
    h = seed
    for v in values:
        h = py_hash_long(v, h)
    return h


# ------------------------------------------------------- SQL generation ----
# Every helper emits a self-contained SQL expression over UBIGINT operands.
# Wrapping arithmetic goes through HUGEINT mod 2**64; left shift is a
# wrapping multiply by 2**r; rotl's two halves are disjoint so plain + joins
# them without overflow.

_M = "18446744073709551616"  # 2**64


def _wm(a: str, b: int) -> str:
    """Wrapping multiply by the CONSTANT b. HUGEINT is signed 128-bit, so
    (2**63-ish)*(2**63-ish) overflows it; split b into 32-bit halves —
    every intermediate then stays under 2**96."""
    b &= M64 - 1
    b_hi, b_lo = b >> 32, b & 0xFFFFFFFF
    if b_hi == 0:
        # fits: a * b_lo < 2**96
        return f"CAST((CAST({a} AS HUGEINT) * {b_lo}) % {_M} AS UBIGINT)"
    return (
        f"CAST(((((CAST({a} AS HUGEINT) % 4294967296) * {b_hi}"
        f" + (CAST({a} AS HUGEINT) >> 32) * {b_lo}) % 4294967296) * 4294967296"
        f" + (CAST({a} AS HUGEINT) % 4294967296) * {b_lo}) % {_M} AS UBIGINT)"
    )


def _wa(a: str, b) -> str:
    return f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {_M} AS UBIGINT)"


def _rl(x: str, r: int) -> str:
    return f"({_wm(x, 1 << r)} + ({x} >> {64 - r}))"


def _rd(acc: str, inp: str) -> str:
    return _wm(_rl(_wa(acc, _wm(inp, P2)), 31), P1)


def _rd0(inp: str) -> str:
    # round(0, inp) = rotl(inp*P2, 31)*P1
    return _wm(_rl(_wm(inp, P2), 31), P1)


def _u64le(hx: str, off: str) -> str:
    """Little-endian u64 read at byte offset ``off`` (0-based SQL expr) of
    the hex-encoded bytes ``hx``."""
    parts = " || ".join(
        f"substring({hx}, 2*({off}) + {2 * b + 1}, 2)" for b in range(7, -1, -1)
    )
    return f"CAST(('0x' || {parts}) AS UBIGINT)"


def _u32le(hx: str, off: str) -> str:
    parts = " || ".join(
        f"substring({hx}, 2*({off}) + {2 * b + 1}, 2)" for b in range(3, -1, -1)
    )
    return f"CAST(('0x' || {parts}) AS UBIGINT)"


def _byte(hx: str, off: str) -> str:
    return f"CAST(('0x' || substring({hx}, 2*({off}) + 1, 2)) AS UBIGINT)"


def _signed(u: str) -> str:
    return (
        f"CAST(CAST({u} AS HUGEINT) - CASE WHEN {u} >= 9223372036854775808 "
        f"THEN CAST({_M} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )


_AV1 = "xor({h}, {h} >> 33)"
_AV3 = "xor({h}, {h} >> 29)"
_AV5 = "xor({h}, {h} >> 32)"


def xxh64_str_ctes(src: str, id_cols: tuple[str, ...], s_col: str,
                   out: str = "xxh", pfx: str = "__x") -> str:
    """CTE chain hashing ``src``(``id_cols``, ``s_col``) to
    ``out``(``id_cols``, h BIGINT) — one row per input row (``src`` must be
    unique on id_cols). The enclosing query must open WITH RECURSIVE."""
    ids = ", ".join(id_cols)
    seed = SEED
    init_v = {
        "v1": (seed + P1 + P2) % M64, "v2": (seed + P2) % M64,
        "v3": seed % M64, "v4": (seed - P1) % M64,
    }
    stripe_step = ", ".join(
        f"{_rd(v, _u64le('hx', f'k + {8 * i}'))} AS {v}"
        for i, v in enumerate(("v1", "v2", "v3", "v4"))
    )
    merge_rounds = "\n".join(
        f", {pfx}m{i} AS (SELECT {ids}, hx, n, v1, v2, v3, v4, "
        + _wa(_wm(f"xor(h, {_rd0(v)})", P1), P4)
        + f" AS h FROM {pfx}m{i - 1})"
        for i, v in enumerate(("v1", "v2", "v3", "v4"), start=1)
    )
    return f"""
        {pfx}b AS (
          SELECT {ids}, upper(hex(encode({s_col}))) AS hx,
                 octet_length(encode({s_col})) AS n
          FROM {src}
        ),
        {pfx}stripes AS (
          SELECT {ids}, hx, n, 0 AS k,
                 CAST({init_v['v1']} AS UBIGINT) AS v1,
                 CAST({init_v['v2']} AS UBIGINT) AS v2,
                 CAST({init_v['v3']} AS UBIGINT) AS v3,
                 CAST({init_v['v4']} AS UBIGINT) AS v4
          FROM {pfx}b WHERE n >= 32
          UNION ALL
          SELECT {ids}, hx, n, k + 32, {stripe_step}
          FROM {pfx}stripes WHERE k + 32 <= n
        ),
        {pfx}sl AS (
          SELECT {ids}, hx, n, v1, v2, v3, v4
          FROM {pfx}stripes QUALIFY row_number() OVER (PARTITION BY {ids} ORDER BY k DESC) = 1
        ),
        {pfx}m0 AS (
          SELECT {ids}, hx, n,
                 {_wa(_wa(_rl('v1', 1), _rl('v2', 7)), _wa(_rl('v3', 12), _rl('v4', 18)))} AS h,
                 v1, v2, v3, v4
          FROM {pfx}sl
        ){merge_rounds},
        {pfx}acc0 AS (
          SELECT {ids}, hx, n, {_wa('h', 'n')} AS h, n // 32 * 32 AS p FROM {pfx}m4
          UNION ALL
          SELECT {ids}, hx, n, {_wa(f'CAST({(SEED + P5) % M64} AS UBIGINT)', 'n')} AS h,
                 0 AS p
          FROM {pfx}b WHERE n < 32
        ),
        {pfx}r8 AS (
          SELECT {ids}, hx, n, h, p FROM {pfx}acc0
          UNION ALL
          SELECT {ids}, hx, n,
                 {_wa(_wm(_rl(f"xor(h, {_rd0(_u64le('hx', 'p'))})", 27), P1), P4)} AS h,
                 p + 8
          FROM {pfx}r8 WHERE p + 8 <= n
        ),
        {pfx}r8l AS (
          SELECT {ids}, hx, n, h, p FROM {pfx}r8
          QUALIFY row_number() OVER (PARTITION BY {ids} ORDER BY p DESC) = 1
        ),
        {pfx}t4 AS (
          SELECT {ids}, hx, n,
                 CASE WHEN p + 4 <= n
                      THEN {_wa(_wm(_rl(f"xor(h, {_wm(_u32le('hx', 'p'), P1)})", 23), P2), P3)}
                      ELSE h END AS h,
                 CASE WHEN p + 4 <= n THEN p + 4 ELSE p END AS p
          FROM {pfx}r8l
        ),
        {pfx}r1 AS (
          SELECT {ids}, hx, n, h, p FROM {pfx}t4
          UNION ALL
          SELECT {ids}, hx, n,
                 {_wm(_rl(f"xor(h, {_wm(_byte('hx', 'p'), P5)})", 11), P1)} AS h,
                 p + 1
          FROM {pfx}r1 WHERE p < n
        ),
        {pfx}r1l AS (
          SELECT {ids}, n, h FROM {pfx}r1
          QUALIFY row_number() OVER (PARTITION BY {ids} ORDER BY p DESC) = 1
        ),
        {pfx}a1 AS (SELECT {ids}, {_AV1.format(h='h')} AS h FROM {pfx}r1l),
        {pfx}a2 AS (SELECT {ids}, {_wm('h', P2)} AS h FROM {pfx}a1),
        {pfx}a3 AS (SELECT {ids}, {_AV3.format(h='h')} AS h FROM {pfx}a2),
        {pfx}a4 AS (SELECT {ids}, {_wm('h', P3)} AS h FROM {pfx}a3),
        {out} AS (
          SELECT {ids}, {_signed(_AV5.format(h='h'))} AS h FROM {pfx}a4
        )"""


def hash_long_ctes(src: str, id_cols: tuple[str, ...], val_col: str,
                   seed_col: str, out: str, pfx: str) -> str:
    """CTE chain: out(id_cols, h UBIGINT) = hashLong(val_col, seed_col).
    ``val_col`` is a BIGINT expr (two's-complement reinterpreted),
    ``seed_col`` a UBIGINT expr."""
    ids = ", ".join(id_cols)
    uval = (f"CAST(CAST({val_col} AS HUGEINT) + CASE WHEN {val_col} < 0 "
            f"THEN CAST({_M} AS HUGEINT) ELSE 0 END AS UBIGINT)")
    h0 = _wa(_wa(seed_col, (P5 + 8) % M64), "0")
    return f"""
        {pfx}h0 AS (
          SELECT {ids},
                 {_wa(_wm(_rl(f"xor({h0}, {_rd0(uval)})", 27), P1), P4)} AS h
          FROM {src}
        ),
        {pfx}ha1 AS (SELECT {ids}, {_AV1.format(h='h')} AS h FROM {pfx}h0),
        {pfx}ha2 AS (SELECT {ids}, {_wm('h', P2)} AS h FROM {pfx}ha1),
        {pfx}ha3 AS (SELECT {ids}, {_AV3.format(h='h')} AS h FROM {pfx}ha2),
        {pfx}ha4 AS (SELECT {ids}, {_wm('h', P3)} AS h FROM {pfx}ha3),
        {out} AS (SELECT {ids}, {_AV5.format(h='h')} AS h FROM {pfx}ha4)"""
