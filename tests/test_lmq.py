"""Bigram-LM perplexity filter invariants (value parity vs DuckDB is
covered by the oracle gate; these pin the semantics that a hash match
alone would not explain)."""

from __future__ import annotations

from chopin_spark.queries.lmq import lm_perplexity_bigram
from tests.conftest import SF_SMOKE


def test_lm_perplexity_semantics(spark):
    rows = lm_perplexity_bigram(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # train slice never scored
        assert r.doc_id % 10 != 0
        # add-1 smoothing keeps every bigram finite and the NLL
        # non-negative (c2 <= c1 and V >= 1 imply c2+1 <= c1+V)
        assert r.nll_per_tok is not None and r.nll_per_tok >= 0
        assert 0 <= r.n_oov <= r.n_bigrams
    # OOV path exercised somewhere in the corpus
    assert any(r.n_oov > 0 for r in rows)


def test_quality_classifier_train_separates(spark):
    """Two quantized GD rounds must beat chance on their own training
    set (the en-vs-rest bigram distributions differ strongly); also
    pins that weights carry both signs — a degenerate all-one-sign
    model would mean the gradient step collapsed."""
    import pyspark.sql.functions as F

    from chopin_spark.queries.lmq import quality_classifier_train
    from chopin_spark.queries.lmq import _LR_B  # noqa: F401
    from chopin_spark.tables import load
    from chopin_spark.textops import (
        shingles_from_uh_spark, token_hashes_spark,
    )

    sf = "/root/testdata/sf0.001"
    w = quality_classifier_train(spark, sf)
    signs = w.selectExpr(
        "SUM(CASE WHEN w_micro > 0 THEN 1 ELSE 0 END) AS pos",
        "SUM(CASE WHEN w_micro < 0 THEN 1 ELSE 0 END) AS neg",
    ).first()
    assert signs["pos"] > 0 and signs["neg"] > 0

    docs = load(spark, sf, "documents").selectExpr(
        "doc_id", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        f"{token_hashes_spark()} AS _uh",
    )
    feats = docs.select(
        "doc_id", "y",
        F.explode(F.expr(shingles_from_uh_spark(2))).alias("g"),
    ).select("doc_id", "y", (F.col("g") % _LR_B).alias("b"))
    scored = (
        feats.join(F.broadcast(w), feats["b"] == w["b"], "left")
        .groupBy("doc_id")
        .agg(
            F.min("y").alias("y"),
            F.sum(F.coalesce(F.col("w_micro"), F.lit(0))).alias("zn"),
        )
        .selectExpr(
            "CASE WHEN (CASE WHEN zn > 0 THEN 1 ELSE 0 END) = y"
            " THEN 1 ELSE 0 END AS hit"
        )
    )
    acc = scored.agg(F.avg("hit")).first()[0]
    assert acc > 0.6, f"training accuracy {acc} not better than chance"
