"""Input-hint pipeline tests: schema exactness, determinism, payload
byte identity through enrichment, and zone/grid consistency."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from chopin_spark.pages import enrich, synth_pages
from tests.conftest import SF_CORRECT


def test_schema_matches_input_hint(spark):
    df = synth_pages(spark, 100, partitions=4)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]
    assert df.count() == 100
    assert df.select("url").distinct().count() == 100


def test_generation_is_deterministic_and_partition_independent(spark):
    a = synth_pages(spark, 500, partitions=2).collect()
    b = synth_pages(spark, 500, partitions=16).collect()
    ka = sorted((r["url"], r["text"], bytes(r["html"])) for r in a)
    kb = sorted((r["url"], r["text"], bytes(r["html"])) for r in b)
    assert ka == kb


def test_payload_byte_identity_through_enrich(spark):
    """north-rule invariant: html and text are byte-identical per url
    after the full enrichment pipeline."""
    src = synth_pages(spark, 400, partitions=4)
    before = {
        r["url"]: (
            hashlib.sha256(bytes(r["html"])).hexdigest(),
            hashlib.sha256(r["text"].encode()).hexdigest(),
        )
        for r in src.collect()
    }
    out = enrich(src).collect()
    assert len(out) == 400
    for r in out:
        hh = hashlib.sha256(bytes(r["html"])).hexdigest()
        th = hashlib.sha256(r["text"].encode()).hexdigest()
        assert (hh, th) == before[r["url"]], r["url"]


def test_enrich_columns_consistent(spark):
    out = enrich(synth_pages(spark, 1000, partitions=8))
    rows = out.collect()
    # geocode lands inside the extent; zone matches the tract the
    # coordinates fall in (floor arithmetic cross-check)
    for r in rows[:100]:
        assert 0 <= r["lon"] < 800_000 and 0 <= r["lat"] < 600_000
        gx, gy = int(r["lon"] // 50_000), int(r["lat"] // 37_500)
        state = (gy // 8) * 2 + (gx // 8)
        county = ((gy // 2) % 4) * 4 + ((gx // 2) % 4)
        tract = (gy % 2) * 2 + (gx % 2)
        assert r["zone_id"] == f"{state:02d}{county:03d}{tract:06d}"
    # every page in exactly one grid cell, cells within range
    assert out.filter(
        (F.col("cgridid") < 0) | (F.col("cgridid") >= 16 * 12)
    ).count() == 0


def test_bloom_dedup_no_false_negatives(spark):
    """Bloom membership can FP (deterministically) but never FN: every
    exact cross-snapshot dup must be bloom-flagged, and the sketch must
    actually fire at gate scale (non-vacuity)."""
    from chopin_spark.queries.webtext import bloom_incremental_dedup

    rows = bloom_incremental_dedup(spark, SF_CORRECT).collect()
    assert rows and all(
        r.bloom_seen >= r.exact_seen for r in rows
    )
    assert sum(r.exact_seen for r in rows) >= 1
