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
