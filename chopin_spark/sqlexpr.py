"""Shared SQL expression templates — single source of truth for the
deterministic math that both the Spark engine and the DuckDB oracle
evaluate.

Every oracle-checked spatial query derives planar coordinates from an
integer id column with pure 64-bit LCG arithmetic, then assigns cells
with floor math.  Because the *same SQL text* runs in Spark SQL (via
``F.expr``) and in DuckDB, the doubles are bit-identical and the
driver's value-hash comparison holds without tolerance.

Cell membership is half-open by construction (``floor``), so assignment
is a function — this fixes the reference's known boundary-drop case
(/root/reference/tests/testthat/test-scale_process.R:320-322 — "omits
2 points which are exactly on the boundary").
"""

from __future__ import annotations

import math

from chopin_spark import EXTENT

# LCG multipliers (Knuth / glibc); id * MULT stays far below 2^63 for any
# realistic key range after the first mod.
_MX, _MY = 2654435761, 1103515245
_MOD = 1_000_003  # prime → coordinates never land exactly on xmax/ymax


def x_expr(id_col: str, extent=EXTENT) -> str:
    """Deterministic x coordinate in [xmin, xmax) from an integer id."""
    xmin, _, xmax, _ = extent
    return (
        f"({xmin!r} + ({xmax - xmin!r}) * "
        f"(CAST((({id_col} * {_MX}) % {_MOD}) AS DOUBLE) / {_MOD}.0))"
    )


def y_expr(id_col: str, extent=EXTENT) -> str:
    _, ymin, _, ymax = extent
    return (
        f"({ymin!r} + ({ymax - ymin!r}) * "
        f"(CAST((({id_col} * {_MY} + 12345) % {_MOD}) AS DOUBLE) / {_MOD}.0))"
    )


def grid_ix_expr(x: str, nx: int, extent=EXTENT) -> str:
    """Regular-grid column index: half-open floor membership.

    Mirrors chopin's par_make_grid cell assignment
    (/root/reference/R/gridding.R:337-367) as pure column math — no
    geometry objects, no UDF, fully codegen'd and pushdown-friendly.
    """
    xmin, _, xmax, _ = extent
    w = (xmax - xmin) / nx
    return f"CAST(FLOOR(({x} - {xmin!r}) / {w!r}) AS BIGINT)"


def grid_iy_expr(y: str, ny: int, extent=EXTENT) -> str:
    _, ymin, _, ymax = extent
    h = (ymax - ymin) / ny
    return f"CAST(FLOOR(({y} - {ymin!r}) / {h!r}) AS BIGINT)"


def grid_cell_expr(x: str, y: str, nx: int, ny: int, extent=EXTENT) -> str:
    """cgridid = iy * nx + ix (row-major, 0-based)."""
    return f"({grid_iy_expr(y, ny, extent)} * {nx} + {grid_ix_expr(x, nx, extent)})"


def quad_cell_expr(x: str, y: str, level: int, extent=EXTENT) -> str:
    """Hierarchical quadtree cell id at `level` (2^level × 2^level grid).

    Parent cell at level L-1 = (ix>>1, iy>>1): the S2/quadkey-style
    prefix hierarchy used for multi-resolution pruning (role of
    par_make_dggrid, /root/reference/R/gridding.R:1020-1049).
    """
    n = 1 << level
    return grid_cell_expr(x, y, n, n, extent)


def hex_qr_exprs(x: str, y: str, size: float) -> tuple[str, str]:
    """Pointy-top axial hex coordinates (q, r) for hex cell of `size`.

    Cube-rounding uses FLOOR(v + 0.5) (half-up) — identical semantics in
    Spark SQL and DuckDB, unlike ROUND.  This is the planar stand-in for
    H3 hexagon partitioning (par_make_h3,
    /root/reference/R/gridding.R:910-982): per-*point* cell assignment
    replaces polygon coverage entirely.
    """
    fq = f"((0.5773502691896258 * {x} - 0.3333333333333333 * {y}) / {size!r})"
    fr = f"((0.6666666666666666 * {y}) / {size!r})"
    return fq, fr


def _hex_round_pack(fq: str, fr: str) -> str:
    """Cube-round fractional axial coords (fq, fr) and pack to one id.

    rx = round(q), rz = round(r), ry = round(-q-r); the axis with the
    largest rounding error is recomputed from the other two so
    rx+ry+rz == 0 exactly.  Packed id = (rq + 2^20) * 2^21 + (rr + 2^20).
    FLOOR(v + 0.5) (half-up) — identical semantics in Spark and DuckDB.
    """
    fs = f"(-({fq}) - ({fr}))"
    rq, rr, rs = (f"FLOOR({e} + 0.5)" for e in (fq, fr, fs))
    dq, dr, ds = (
        f"ABS({r} - ({e}))" for r, e in ((rq, fq), (rr, fr), (rs, fs))
    )
    # canonical cube-round chain: IF dq largest -> fix q; ELIF dr > ds
    # -> fix r; ELSE fix s (which leaves q, r).  The ELIF must be the
    # exact complement of the first branch: a dq == dr > ds tie
    # previously fixed NEITHER axis, breaking rx+ry+rz == 0 and
    # assigning a non-nearest hex.
    q_cond = f"({dq} > {dr} AND {dq} > {ds})"
    q_fixed = (
        f"(CASE WHEN {q_cond} THEN -({rr}) - ({rs}) ELSE {rq} END)"
    )
    r_fixed = (
        f"(CASE WHEN NOT {q_cond} AND {dr} > {ds}"
        f" THEN -({rq}) - ({rs}) ELSE {rr} END)"
    )
    return (
        f"(CAST({q_fixed} + 1048576 AS BIGINT) * 2097152 "
        f"+ CAST({r_fixed} + 1048576 AS BIGINT))"
    )


def hex_cell_expr(x: str, y: str, size: float) -> str:
    """Single-expression hex cell id: cube-round (q, r) then pack."""
    fq, fr = hex_qr_exprs(x, y, size)
    return _hex_round_pack(fq, fr)


def hex_parent_expr(cell: str) -> str:
    """Aperture-7 hexagonal parent of a packed hex cell id — the
    hierarchy verb of H3's h3_to_parent (par_make_h3 exposes `h3index`
    hierarchies, /root/reference/R/gridding.R:970).

    The child lattice is the image of the parent lattice under the
    aperture-7 matrix M = [[2, -1], [1, 3]] (det 7, the ~19.1° rotated
    √7-scaled sublattice H3 uses between resolutions); the parent of a
    child is the hex whose center is nearest in parent coordinates:
    cube-round of M⁻¹·(q, r) = ((3q + r)/7, (-q + 2r)/7).  Every parent
    hex covers exactly 7 child centers (center + 6 ring), asserted in
    test_sqlexpr.  Parent ids live in the SAME packed axial space, so
    the expression composes with itself for grandparents and with
    hex_disk_expr for parent-level neighbor expansion.  Planar analog:
    ids do not interoperate with the H3 library's icosahedral indexes
    (documented in COVERAGE.md P6)."""
    q = f"(CAST(FLOOR(({cell}) / 2097152.0) AS BIGINT) - 1048576)"
    r = f"((({cell}) % 2097152) - 1048576)"
    pq = f"((3.0 * {q} + {r}) / 7.0)"
    pr = f"((-1.0 * {q} + 2.0 * {r}) / 7.0)"
    return _hex_round_pack(pq, pr)


def hex_disk_expr(cell: str, k: int = 1, ctor: str = "ARRAY") -> str:
    """Array of packed hex cell ids within hex-distance k of `cell` —
    the planar analogue of H3's gridDisk neighbor expansion
    (/root/reference/R/gridding.R:861-866, the coverage-gap workaround).
    Unpacks (q, r) from the 2^21 packing, enumerates axial offsets with
    |dq|≤k, |dr|≤k, |dq+dr|≤k, repacks. `ctor` is the array constructor
    spelling — 'ARRAY' in Spark SQL, 'LIST_VALUE' in DuckDB (the one
    divergence between the dialects)."""
    q = f"(CAST(FLOOR(({cell}) / 2097152.0) AS BIGINT) - 1048576)"
    r = f"((({cell}) % 2097152) - 1048576)"
    ids = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if abs(dq + dr) <= k:
                ids.append(
                    f"(CAST({q} + {dq} + 1048576 AS BIGINT) * 2097152 "
                    f"+ CAST({r} + {dr} + 1048576 AS BIGINT))"
                )
    return f"{ctor}({', '.join(ids)})"


def cents_expr(col: str = "value") -> str:
    """Exact integer cents of a 2-decimal-granular double column —
    integer sums are reduction-order independent, unlike SUM(double)
    whose 4th decimal can flip with partitioning (the
    summarize_st_hourly sf0.1 lesson).  Identical text both engines."""
    return f"CAST(FLOOR(({col}) * 100 + 0.5) AS BIGINT)"


def round4(expr: str) -> str:
    """Defensive rounding applied to every double aggregate in BOTH the
    Spark query and the oracle SQL, so partial-sum ordering differences
    (non-associative fp addition across partitions) cannot flip the
    driver's value hash."""
    return f"ROUND({expr}, 4)"


# --- geohash (base32 DGGS tokens — interop-grade) ----------------------------
#
# Standard public geohash (Niemeyer 2008): binary subdivision of
# lon/lat, bits interleaved lon-first, 5-bit groups mapped to the
# base32 alphabet.  Unlike the planar hex analog (see COVERAGE's H3
# note), geohash needs NO library constants — the algorithm is fully
# specified — so the emitted tokens are bit-compatible with every
# geohash implementation (Elasticsearch, Redis, PostGIS); pinned
# against published test vectors in tests/test_sqlexpr.py.

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_py(lon: float, lat: float, precision: int = 8) -> str:
    """Reference Python encoder (tests + driver-side use)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lonb = min(int((lon + 180.0) / 360.0 * (1 << nlon)), (1 << nlon) - 1)
    latb = min(int((lat + 90.0) / 180.0 * (1 << nlat)), (1 << nlat) - 1)
    acc = 0
    for i in range(nbits):
        if i % 2 == 0:  # even positions: lon, MSB first
            bit = (lonb >> (nlon - 1 - i // 2)) & 1
        else:
            bit = (latb >> (nlat - 1 - i // 2)) & 1
        acc = (acc << 1) | bit
    return "".join(
        GEOHASH_B32[(acc >> (5 * (precision - 1 - c))) & 31]
        for c in range(precision)
    )


def geohash_lonbits_expr(lon: str, precision: int = 8) -> str:
    nlon = (5 * precision + 1) // 2
    return (
        f"LEAST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {1 << nlon}) AS"
        f" BIGINT), {(1 << nlon) - 1})"
    )


def geohash_latbits_expr(lat: str, precision: int = 8) -> str:
    nlat = 5 * precision // 2
    return (
        f"LEAST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {1 << nlat}) AS"
        f" BIGINT), {(1 << nlat) - 1})"
    )


def geohash_expr(lonb: str, latb: str, precision: int = 8) -> str:
    """Geohash token from PRE-QUANTIZED bit columns (see
    geohash_lonbits_expr / geohash_latbits_expr — compute those once in
    a CTE; the float quantization must evaluate exactly once, while
    this expression re-derives the integer interleave per character,
    which is exact int64 math at any evaluation count).  One shared SQL
    text for Spark and DuckDB; the base32 lookup is SUBSTR over the
    alphabet literal."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    terms = []
    for i in range(nbits):
        if i % 2 == 0:
            src, shift = f"({lonb})", nlon - 1 - i // 2
        else:
            src, shift = f"({latb})", nlat - 1 - i // 2
        w = nbits - 1 - i
        terms.append(
            f"(CAST(FLOOR({src} / {1 << shift}.0) AS BIGINT) % 2)"
            + (f" * CAST({1 << w} AS BIGINT)" if w else "")
        )
    acc = "(" + " + ".join(terms) + ")"
    # char c = (acc mod 2^(k+5)) div 2^k, k = 5·(p−1−c) — pure BIGINT
    # mod + an exact double division of a small multiple of 2^k (a bare
    # FLOOR(acc / 2^k) would round acc through double first, which
    # corrupts the low bits once 5·p > 53)
    chars = []
    for c in range(precision):
        k = 5 * (precision - 1 - c)
        m = f"({acc} % CAST({1 << (k + 5)} AS BIGINT))"
        chars.append(
            f"SUBSTR('{GEOHASH_B32}', CAST(({m} - ({m} % {1 << k}))"
            f" / {1 << k}.0 AS INT) + 1, 1)"
        )
    return "(" + " || ".join(chars) + ")"


# --- web-mercator slippy tiles (XYZ / Bing quadkey — interop-grade) ----------
#
# The OSM/Google/Bing tile scheme: tx = floor((lon+180)/360 * 2^z);
# ty = floor((1 - asinh(tan lat)/pi)/2 * 2^z).  Like geohash (and the
# DGGS role of par_make_dggrid, /root/reference/R/gridding.R:1023-1100)
# the scheme is fully specified by a public formula — no library
# constants — so emitted (z, x, y) ids and quadkey tokens name the same
# tiles every slippy-map stack serves.
#
# Cross-engine exactness: tx is plain arithmetic (safe), but ty's
# asinh/tan are NOT bit-identical between the JVM and C libm (see
# chopin_spark/crs.py module note: ln/tan differ by <=2 ulp, enough to
# flip a FLOOR at a tile boundary).  So ty is computed WITHOUT
# transcendentals at query time: the 2^z - 1 boundary latitudes are
# precomputed driver-side with Python math and baked into the SQL text
# as double literals of their SINES; ty = #{k : sin(lat) < sin(phi_k)}.
# sin() is bit-identical across engines and literal comparisons are
# exact, so the shared SQL text hashes identically in Spark and DuckDB
# at full double precision — no rounding tolerance needed.

WEBMERC_MAX_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees


def xyz_tile_py(lon: float, lat: float, z: int) -> tuple[int, int]:
    """Reference Python encoder (tests + driver-side use)."""
    n = 1 << z
    tx = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    lat = min(max(lat, -WEBMERC_MAX_LAT), WEBMERC_MAX_LAT)
    y = (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n
    ty = min(max(int(y), 0), n - 1)
    return tx, ty


def xyz_tx_expr(lon: str, z: int) -> str:
    """Tile column — pure arithmetic, exact cross-engine."""
    n = 1 << z
    return (
        f"LEAST(GREATEST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {n}.0)"
        f" AS BIGINT), 0), {n - 1})"
    )


def _xyz_row_boundary_lat(k: int, z: int) -> float:
    """Latitude of the boundary between tile rows k-1 and k (row edge
    where the fractional mercator y equals k)."""
    return math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * k / (1 << z)))))


def xyz_ty_expr(lat: str, z: int) -> str:
    """Tile row via the literal sine-boundary ladder (see module note).

    O(2^z) comparison terms: intended for the coarse rollup levels
    (z <= 8) where the ladder is small; at finer zooms derive the fine
    row inside a coarse tile by splitting the parent ladder, or use the
    numpy encoder mirror of xyz_tile_py.
    """
    # TRANSCENDENTAL-FREE (ADVICE r03): the row boundaries are
    # precomputed LATITUDE literals (degrees(atan(sinh(pi*(1-2k/2^z))))
    # — the exact lat where fractional mercator y equals k), so the
    # per-row comparison is raw-lat-vs-literal with zero query-time
    # trig.  The earlier form compared SIN(lat·pi/180) against tanh
    # literals, which leaned on Math.sin (≤1 ulp, not correctly
    # rounded) agreeing with DuckDB's libm exactly at ladder literals —
    # a weaker guarantee than the repo's IEEE-exact-ops discipline.
    # sin is monotone on [-90°, 90°], so the two ladders classify
    # identically except for points within ~1 ulp of a boundary, where
    # the literal compare is DETERMINISTIC and engine-independent.
    # <= not <: a point exactly ON boundary k has fractional y == k and
    # FLOOR puts it in row k (e.g. lat 0 -> row 2^z/2), so the k-th
    # ladder term must count equality.
    terms = [
        f"(CASE WHEN ({lat}) <= {_xyz_row_boundary_lat(k, z)!r}"
        f" THEN 1 ELSE 0 END)"
        for k in range(1, 1 << z)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def xyz_quadkey_expr(tx: str, ty: str, z: int) -> str:
    """Bing quadkey token: one base-4 char per zoom level, digit =
    2*ybit + xbit, MSB first — prefix truncation IS the parent tile
    (pinned against the published (x=3, y=5, z=3) -> '213' example)."""
    chars = [
        f"CAST((CAST(FLOOR(({ty}) / {1 << b}.0) AS BIGINT) % 2) * 2"
        f" + (CAST(FLOOR(({tx}) / {1 << b}.0) AS BIGINT) % 2) AS STRING)"
        for b in range(z - 1, -1, -1)
    ]
    return "(" + " || ".join(chars) + ")"


def xyz_quadkey_py(tx: int, ty: int, z: int) -> str:
    return "".join(
        str(2 * ((ty >> b) & 1) + ((tx >> b) & 1))
        for b in range(z - 1, -1, -1)
    )


def hilbert_chain_sql(order: int, keep: str, src: str) -> str:
    """CTE chain computing the planar Hilbert index d of integer cell
    coords over a 2^order × 2^order grid — the classic xy2d loop
    (Wikipedia "Hilbert curve", public-domain C) unrolled one CTE per
    level, ARITHMETIC-ONLY so both engines agree exactly:

    - the bitwise tests (x & s) become range tests on mod-normalized
      coords (xm = ((x mod 2s) + 2s) mod 2s, rx = xm >= s),
    - the quadrant XOR (3*rx) ^ ry becomes 3*rx + ry - 2*rx*ry
      (identical on the {0,1}² domain),
    - the rotate/reflect step is a CASE on (rx, ry).

    `src` must expose columns ({keep}, hx, hy); the chain ends in CTE
    ``hfin`` exposing ({keep}, hd).  Validated against the bitwise
    reference (bijection + unit-step adjacency) in tests/test_sqlexpr
    and pinned by the cross-engine oracle.  Unlike the Z-order quadkey
    (quad_cell_expr), consecutive Hilbert d never jump cells — the
    property that makes it the better file-clustering key."""
    n = 1 << order
    lines = [f"h0 AS (SELECT {keep}, hx, hy, CAST(0 AS BIGINT) AS hd FROM {src})"]
    prev = "h0"
    lvl = 0
    s = n // 2
    while s > 0:
        m = 2 * s
        xm = f"(((hx % {m}) + {m}) % {m})"
        ym = f"(((hy % {m}) + {m}) % {m})"
        rx = f"(CASE WHEN {xm} >= {s} THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN {ym} >= {s} THEN 1 ELSE 0 END)"
        lvl += 1
        cur = f"h{lvl}" if s > 1 else "hfin"
        lines.append(
            f"{cur} AS (SELECT {keep},\n"
            f"  CASE WHEN {ry} = 1 THEN {xm}\n"
            f"       WHEN {rx} = 1 THEN {s - 1} - {ym} ELSE {ym} END AS hx,\n"
            f"  CASE WHEN {ry} = 1 THEN {ym}\n"
            f"       WHEN {rx} = 1 THEN {s - 1} - {xm} ELSE {xm} END AS hy,\n"
            f"  hd + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}) AS hd\n"
            f"  FROM {prev})"
        )
        prev = cur
        s //= 2
    return ",\n".join(lines)


def hilbert_d_py(order: int, x: int, y: int) -> int:
    """Bitwise reference twin of hilbert_chain_sql (test pin)."""
    d, s = 0, (1 << order) // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d
