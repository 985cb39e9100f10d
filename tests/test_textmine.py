"""Winnowing guarantee + RAKE semantics on crafted documents.

The Schleimer/Wilkerson/Aiken theorem: with k-gram fingerprints and
window w, any shared token run of length >= w + k - 1 produces at
least one SHARED selected fingerprint.  The engine's SQL is exercised
through a temp view over crafted docs, so the test pins the query
text itself (not a Python re-derivation).
"""

from __future__ import annotations

from chopin_spark.queries.textmine import _RAKE_SPARK, _WINNOW_SPARK


def _winnow_sets(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    # re-run the registered SQL but keep the per-doc fingerprint SETS
    # (swap the summary tail for a plain projection of `sel`)
    sql = _WINNOW_SPARK[: _WINNOW_SPARK.index("per_doc AS (")].rstrip()
    sql = sql.rstrip(",") + "\nSELECT doc_id, fp FROM sel"
    rows = spark.sql(sql).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_winnowing_shared_run_guarantee(spark):
    # 30 shared tokens (>= w + k - 1 = 8) inside different contexts
    shared = " ".join(f"s{i}" for i in range(30))
    docs = [
        (1, "alpha beta gamma " + shared + " delta epsilon zeta"),
        (2, "one two three four five " + shared + " six seven"),
    ]
    sets = _winnow_sets(spark, docs)
    assert sets[1] & sets[2], "shared 30-token run must share a fingerprint"


def test_winnowing_disjoint_docs_share_nothing(spark):
    docs = [
        (1, " ".join(f"a{i}" for i in range(40))),
        (2, " ".join(f"b{i}" for i in range(40))),
    ]
    sets = _winnow_sets(spark, docs)
    assert not (sets[1] & sets[2])


def test_rake_degree_and_freq(spark):
    # "x y" phrase twice, "z" alone once: freq(x)=2, deg(x)=4 (two
    # 2-token phrases), score(x)=2.0; freq(z)=1, deg(z)=1, score 1.0
    docs = [(1, "x y the x y the z the z the z the z the z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    sql = _RAKE_SPARK.replace("WHERE freq >= 5", "WHERE freq >= 1")
    rows = {r["word"]: r for r in spark.sql(sql).collect()}
    assert rows["x"]["freq"] == 2 and rows["x"]["degree"] == 4
    assert rows["x"]["rake_score"] == 2.0
    assert rows["z"]["freq"] == 5 and rows["z"]["degree"] == 5
    assert rows["z"]["rake_score"] == 1.0
