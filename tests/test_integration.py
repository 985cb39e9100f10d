"""System test: the full flagship pipeline end-to-end — synthesize
pages (input_hint schema), enrich (geocode + cells + zones), run the
checkpointed per-cell zonal aggregation, kill + resume, and verify
(a) the result equals the direct declarative computation and (b) the
payload bytes survive untouched."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from chopin_spark.checkpoint import CheckpointedRun, cell_batches
from chopin_spark.pages import enrich, synth_pages


@pytest.fixture(scope="module")
def enriched(spark):
    return enrich(synth_pages(spark, 3000, partitions=8)).cache()


def test_flagship_pipeline_with_kill_resume(spark, enriched, tmp_path):
    def job(s, cells):
        return (
            enriched.filter(F.col("cgridid").isin(cells))
            .groupBy("cgridid", "zone_id")
            .agg(
                F.count(F.lit(1)).alias("n_pages"),
                F.countDistinct("lang").alias("n_langs"),
            )
        )

    all_cells = list(range(16 * 12))
    batches = cell_batches(job, all_cells, n_batches=6)

    # sabotage batch 3 on its first attempt (simulated executor loss)
    flaky = dict(batches)
    orig, state = flaky["b0003"], {"failed": False}

    def sabotaged(s):
        if not state["failed"]:
            state["failed"] = True
            raise RuntimeError("simulated kill")
        return orig(s)

    flaky["b0003"] = sabotaged
    run = CheckpointedRun(spark, str(tmp_path / "flagship"))
    with pytest.raises(RuntimeError):
        run.run(flaky)
    resumed = run.run(flaky)
    assert resumed and resumed[0] == "b0003"

    got = {
        (r["cgridid"], r["zone_id"]): (r["n_pages"], r["n_langs"])
        for r in run.result().collect()
    }
    want = {
        (r["cgridid"], r["zone_id"]): (r["n_pages"], r["n_langs"])
        for r in enriched.groupBy("cgridid", "zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == 3000


def test_payload_bytes_survive_the_pipeline(spark, enriched):
    src = {
        r["url"]: hashlib.sha256(bytes(r["html"])).hexdigest()
        for r in synth_pages(spark, 3000, partitions=8).collect()
    }
    out = enriched.select("url", "html", "text").collect()
    assert len(out) == 3000
    for r in out:
        assert hashlib.sha256(bytes(r["html"])).hexdigest() == src[r["url"]]
        assert r["text"] in str(bytes(r["html"]))  # payload embeds text
