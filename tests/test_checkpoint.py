"""Kill-and-resume test (north rule): a job killed mid-run resumes from
the last completed batch; the resumed result equals the single-shot
run; lineage and metrics rows are recorded per batch/cell."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.checkpoint import CheckpointedRun, cell_batches
from chopin_spark.grid import make_regular_grid


@pytest.fixture()
def points_df(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "id": range(2000),
            "x": rng.uniform(0, 8e5, 2000),
            "y": rng.uniform(0, 6e5, 2000),
        }
    )
    return spark.createDataFrame(pdf)


def _job(points_df, grid):
    def job(spark, cells):
        return (
            grid.assign_core(points_df)
            .filter(F.col("cgridid").isin(cells))
            .groupBy("cgridid")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("x"), 4).alias("sx"))
        )

    return job


def test_kill_and_resume_equals_single_shot(spark, points_df, tmp_path):
    grid = make_regular_grid(8, 6)
    job = _job(points_df, grid)
    batches = cell_batches(job, list(range(48)), n_batches=4)

    # single-shot reference
    ref = CheckpointedRun(spark, str(tmp_path / "ref"))
    assert len(ref.run(batches)) == 4
    want = {
        (r["cgridid"], r["n"], r["sx"]) for r in ref.result().collect()
    }

    # killed run: batch b0002 fails on first attempt
    calls = {"n": 0}
    sab_batches = dict(batches)
    orig = sab_batches["b0002"]

    def sabotaged(s):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated kill")
        return orig(s)

    sab_batches["b0002"] = sabotaged
    run = CheckpointedRun(spark, str(tmp_path / "run"))
    with pytest.raises(RuntimeError):
        run.run(sab_batches)
    assert run.completed() == {"b0000", "b0001"}

    # resume: only the remaining batches execute
    executed = run.run(sab_batches)
    assert executed == ["b0002", "b0003"]
    got = {(r["cgridid"], r["n"], r["sx"]) for r in run.result().collect()}
    assert got == want

    # metrics: 4 done rows + 1 failed; lineage covers all 48 cells
    m = run.metrics().collect()
    assert sum(r["status"] == "done" for r in m) == 4
    assert sum(r["status"] == "failed" for r in m) == 1
    assert all(r["wall_ms"] > 0 for r in m)
    lin = run.lineage().collect()
    assert {r["cgridid"] for r in lin} == set(range(48))
    assert sum(r["n_rows"] for r in lin) == 48  # one agg row per cell
    # and the per-cell input counts in the data sum to the full table
    assert sum(r["n"] for r in run.result().collect()) == 2000


def test_rerun_is_noop(spark, points_df, tmp_path):
    grid = make_regular_grid(4, 3)
    job = _job(points_df, grid)
    batches = cell_batches(job, list(range(12)), n_batches=3)
    run = CheckpointedRun(spark, str(tmp_path / "run2"))
    assert len(run.run(batches)) == 3
    assert run.run(batches) == []  # everything checkpointed
    assert run.result().count() == 12


def test_lineage_is_idempotent_across_reruns(spark, tmp_path):
    """Kill-and-resume must not double-count lineage: re-executing a
    batch REPLACES its per-cell rows (overwrite dir), never appends a
    second copy."""
    import shutil

    from chopin_spark.checkpoint import CheckpointedRun

    ckpt = str(tmp_path / "ck")

    def mk(spark):
        return spark.range(0, 100).selectExpr(
            "id", "id % 4 AS cgridid"
        )

    run = CheckpointedRun(spark, ckpt)
    run.run({"b0": mk})
    first = sorted(
        (r["batch_id"], r["cgridid"], r["n_rows"])
        for r in run.lineage().collect()
    )
    # simulate a kill AFTER the lineage write but BEFORE the 'done'
    # row: drop the completion table so the batch re-executes
    shutil.rmtree(str(tmp_path / "ck" / "checkpoint"))
    run2 = CheckpointedRun(spark, ckpt)
    assert run2.run({"b0": mk}) == ["b0"]  # really re-ran
    second = sorted(
        (r["batch_id"], r["cgridid"], r["n_rows"])
        for r in run2.lineage().collect()
    )
    assert second == first  # replaced, not doubled


def test_completed_surfaces_corrupt_checkpoint(spark, tmp_path):
    import pytest as _pytest

    from chopin_spark.checkpoint import CheckpointedRun

    ckpt = tmp_path / "ck2"
    (ckpt / "checkpoint").mkdir(parents=True)
    (ckpt / "checkpoint" / "part-0.parquet").write_bytes(b"not parquet")
    with _pytest.raises(Exception):
        CheckpointedRun(spark, str(ckpt)).completed()
