"""Storage-layout claims of docs/SCALE.md, proven in-plan: sorting
files by ``s2_prefix`` makes a covering's contiguous id range prune at
the scan via parquet min/max stats, and a cell's descendants really are
one contiguous range."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from chopin_spark import s2


def _scan_metrics(df):
    """(files read, rows output) from the executed FileSourceScan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # walk to the leaf scan node and read its SQL metrics
    node = plan
    while node.children().length() > 0:
        node = node.children().apply(0)
    m = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        m[kv._1()] = kv._2().value()
    return m


@pytest.fixture(scope="module")
def s2_sorted_table(spark, tmp_path_factory):
    """80k points range-partitioned into 16 files by s2_prefix."""
    path = str(tmp_path_factory.mktemp("s2sorted") / "pts")
    rng = np.random.RandomState(11)
    import pandas as pd

    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 80000), "lat": rng.uniform(-85, 85, 80000)}
    )
    cid = s2.cell_id_from_lonlat(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12)
    pdf["s2_prefix"] = s2.prefix_from_cell_id(cid, 12)
    (
        spark.createDataFrame(pdf)
        .repartitionByRange(16, "s2_prefix")
        .sortWithinPartitions("s2_prefix")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_descendant_range_is_contiguous():
    lon = np.random.RandomState(3).uniform(-50, 50, 5000)
    lat = np.random.RandomState(4).uniform(-50, 50, 5000)
    leaf12 = s2.cell_id_from_lonlat(lon, lat, 12)
    anc = s2.parent(leaf12, 5)
    # descendants of the level-5 ancestor == leaf prefixes inside
    # [range_min, range_max] — one BETWEEN per covering cell
    inside = (s2.range_min(anc) <= leaf12) & (leaf12 <= s2.range_max(anc))
    assert inside.all()
    # prefix form: the level-12 prefix is ancestor_prefix * 4^7 + offset
    p5 = s2.prefix_from_cell_id(anc, 5)
    p12 = s2.prefix_from_cell_id(leaf12, 12)
    assert ((p12 >> 14) == p5).all()


def test_prefix_range_filter_prunes_sorted_files(spark, s2_sorted_table):
    full = spark.read.parquet(s2_sorted_table)
    lo, hi = 2 * 4**12, 3 * 4**12 - 1  # all of face 2 at level 12
    pruned = full.filter(
        (F.col("s2_prefix") >= lo) & (F.col("s2_prefix") <= hi)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(mode="formatted")
    assert "PushedFilters" in buf.getvalue()
    m_full = _scan_metrics(full.select("s2_prefix"))
    m_pruned = _scan_metrics(pruned.select("s2_prefix"))
    # vanilla Spark skips at ROW-GROUP granularity via parquet min/max
    # (file-level skipping is the Iceberg manifest's job — SCALE.md):
    # the scan must emit far fewer rows than the table holds because
    # row groups outside the face-2 prefix range never decode.  Face 2
    # is ~1/6 of rows; row-group boundaries round that up.
    assert m_pruned["numOutputRows"] < m_full["numOutputRows"] / 2
