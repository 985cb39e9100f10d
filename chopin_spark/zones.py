"""Admin-hierarchy zones (chopin's `regions`) as arithmetic + polygons.

The zone universe is a deterministic quadtree partition of the working
extent (FIXTURES.md §2): 4 states (2×2) → 16 counties per state (4×4)
→ 4 tracts per county (2×2) = 256 exhaustive, non-overlapping tracts.
Zone ids are 11-char strings ``SSCCCTTTTTT`` whose **left prefix encodes
the parent level** — chopin's FIPS/NUTS hierarchy-code contract
(/root/reference/R/scale_process.R:460-481: `substr(vec_regions_id, 1,
length_left)`).

Because the partition is rectangular and exhaustive, point→zone
assignment is pure floor arithmetic (JVM-side, codegen, pushdown-able)
— the Spark-first replacement for chopin's per-task `st_join`. The same
SQL text evaluates identically in DuckDB, which is what makes zone
queries oracle-checkable. General (non-rectangular) polygon zones go
through the WKB + pandas-UDF path in `chopin_spark.runners` instead.
"""

from __future__ import annotations

import pandas as pd

from chopin_spark import EXTENT

# the zone-id arithmetic below divides raw coordinates (no origin
# shift), so it is only valid for a zero-origin extent — assert the
# invariant rather than silently mis-assign if EXTENT ever moves
assert EXTENT[0] == 0.0 and EXTENT[1] == 0.0, (
    "zones.py zone-id expressions assume a (0, 0) extent origin; "
    "subtract the origin in every *_num_expr before changing EXTENT"
)

# tract grid: 16×16 half-open cells over the extent
TRACT_NX = TRACT_NY = 16
TRACT_W = (EXTENT[2] - EXTENT[0]) / TRACT_NX  # 50_000 m
TRACT_H = (EXTENT[3] - EXTENT[1]) / TRACT_NY  # 37_500 m

STATE_LEN, COUNTY_LEN = 2, 5  # prefix lengths within the 11-char code


def _istr(expr: str, width: int) -> str:
    return f"LPAD(CAST({expr} AS STRING), {width}, '0')"


def state_num_expr(x: str, y: str) -> str:
    """State index 0..3 over a 2×2 split of the extent."""
    sx = f"CAST(FLOOR(({x}) / {EXTENT[2] / 2!r}) AS BIGINT)"
    sy = f"CAST(FLOOR(({y}) / {EXTENT[3] / 2!r}) AS BIGINT)"
    return f"({sy} * 2 + {sx})"


def county_num_expr(x: str, y: str) -> str:
    """County index 0..15 within its state (4×4 split of the state)."""
    cx = f"(CAST(FLOOR(({x}) / {EXTENT[2] / 8!r}) AS BIGINT) % 4)"
    cy = f"(CAST(FLOOR(({y}) / {EXTENT[3] / 8!r}) AS BIGINT) % 4)"
    return f"({cy} * 4 + {cx})"


def tract_num_expr(x: str, y: str) -> str:
    """Tract index 0..3 within its county (2×2 split of the county)."""
    tx = f"(CAST(FLOOR(({x}) / {TRACT_W!r}) AS BIGINT) % 2)"
    ty = f"(CAST(FLOOR(({y}) / {TRACT_H!r}) AS BIGINT) % 2)"
    return f"({ty} * 2 + {tx})"


def zone_id_expr(x: str, y: str) -> str:
    """11-char hierarchical zone code ``SSCCCTTTTTT`` from planar coords.

    Point-in-polygon against the exhaustive rectangular tract partition
    reduced to string-formatted floor math; half-open membership means a
    boundary point lands in exactly one zone (the engine's fix for the
    reference's boundary-drop caveat,
    /root/reference/tests/testthat/test-scale_process.R:320-322).
    """
    return (
        f"({_istr(state_num_expr(x, y), 2)} || "
        f"{_istr(county_num_expr(x, y), 3)} || "
        f"{_istr(tract_num_expr(x, y), 6)})"
    )


def zidx_expr(x: str, y: str) -> str:
    """Global tract index gy*16 + gx (row-major over the 16×16 tract grid)."""
    gx = f"CAST(FLOOR(({x}) / {TRACT_W!r}) AS BIGINT)"
    gy = f"CAST(FLOOR(({y}) / {TRACT_H!r}) AS BIGINT)"
    return f"({gy} * {TRACT_NX} + {gx})"


# Zone attributes are LCG functions of the tract index, so oracle SQL can
# recompute them without a zones view in DuckDB (the same SQL text
# evaluates bit-identically in both engines).
_AMX, _AMY, _AMOD = 2654435761, 1103515245, 1_000_003


def pop_expr(zidx: str) -> str:
    """Deterministic tract population in [1000, 10000)."""
    return (
        f"ROUND(1000.0 + 9000.0 * "
        f"(CAST((({zidx}) * {_AMX}) % {_AMOD} AS DOUBLE) / {_AMOD}.0), 4)"
    )


def area_val_expr(zidx: str) -> str:
    """Deterministic tract attribute value in [5, 50)."""
    return (
        f"ROUND(5.0 + 45.0 * "
        f"(CAST((({zidx}) * {_AMY} + 12345) % {_AMOD} AS DOUBLE) / {_AMOD}.0), 4)"
    )


def _pop_value(zidx: int) -> float:
    return round(1000.0 + 9000.0 * ((zidx * _AMX) % _AMOD) / _AMOD, 4)


def _area_value(zidx: int) -> float:
    return round(5.0 + 45.0 * ((zidx * _AMY + 12345) % _AMOD) / _AMOD, 4)


def zones_pdf() -> pd.DataFrame:
    """Materialize the 256-tract zone dimension table (driver-side; it is
    tiny and broadcastable — chopin replicates `regions` to every worker,
    /root/reference/R/scale_process.R:168-196).

    Columns: zone_id, state (2-char prefix), county (5-char prefix),
    xmin/ymin/xmax/ymax, pop, area_val, geom_wkb. Attributes are LCG
    functions of the tract index so DuckDB oracles can recompute them.
    """
    from chopin_spark.geom.wkb import rect_wkb

    rows = []
    for gy in range(TRACT_NY):
        for gx in range(TRACT_NX):
            xmin, ymin = gx * TRACT_W, gy * TRACT_H
            state = (gy // 8) * 2 + (gx // 8)
            county = ((gy // 2) % 4) * 4 + ((gx // 2) % 4)
            tract = (gy % 2) * 2 + (gx % 2)
            zidx = gy * TRACT_NX + gx
            zone_id = f"{state:02d}{county:03d}{tract:06d}"
            rows.append(
                {
                    "zone_id": zone_id,
                    "state": zone_id[:STATE_LEN],
                    "county": zone_id[:COUNTY_LEN],
                    "xmin": xmin,
                    "ymin": ymin,
                    "xmax": xmin + TRACT_W,
                    "ymax": ymin + TRACT_H,
                    "pop": _pop_value(zidx),
                    "area_val": _area_value(zidx),
                    "geom_wkb": rect_wkb(
                        xmin, ymin, xmin + TRACT_W, ymin + TRACT_H
                    ),
                }
            )
    return pd.DataFrame(rows)


def zones_df(spark):
    """Zone dimension as a Spark DataFrame (broadcast-sized: 256 rows)."""
    return spark.createDataFrame(zones_pdf())


def county_rects_pdf() -> pd.DataFrame:
    """The 64 county rectangles (level above tracts): code 'SSCCC'."""
    rows = []
    cw, ch = (EXTENT[2] - EXTENT[0]) / 8, (EXTENT[3] - EXTENT[1]) / 8
    for cyi in range(8):
        for cxi in range(8):
            state = (cyi // 4) * 2 + (cxi // 4)
            county = (cyi % 4) * 4 + (cxi % 4)
            rows.append(
                {
                    "county": f"{state:02d}{county:03d}",
                    "xmin": cxi * cw,
                    "ymin": cyi * ch,
                    "xmax": (cxi + 1) * cw,
                    "ymax": (cyi + 1) * ch,
                }
            )
    return pd.DataFrame(rows)
