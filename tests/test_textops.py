"""Text-op property tests: MinHash-LSH recall against the exact-Jaccard
oracle, SimHash hamming behavior on planted near-dups, payload byte
identity through the multimodal pipeline."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.textops import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


@pytest.fixture(scope="module")
def planted(spark):
    """Docs with planted near-duplicates: pairs (i, i+1000) differ by
    one token in 40."""
    base = [
        " ".join(f"w{(i * 17 + k * 7) % 200}" for k in range(40))
        for i in range(60)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows += [
        {"doc_id": 1000 + i, "text": t.replace("w", "x", 1)}
        for i, t in enumerate(base[:30])
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_lsh_recall_on_real_near_dups(spark, docs):
    """Every exact-Jaccard ≥0.9 pair must appear in the LSH candidates
    (at J≈0.9+ the 8×4 banding miss probability is ~2e-4 and the data
    is fixed, so this is deterministic)."""
    exact = {
        (r["d1"], r["d2"])
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    cand = {
        (r["d1"], r["d2"]) for r in minhash_lsh_pairs(docs).collect()
    }
    assert exact <= cand
    # and LSH prunes: candidates far fewer than all pairs
    n = docs.count()
    assert len(cand) < n * (n - 1) / 20


def test_lsh_finds_planted_dups(spark, planted):
    cand = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(planted).collect()}
    planted_pairs = {(i, 1000 + i) for i in range(30)}
    assert planted_pairs <= cand


def test_simhash_near_dups_have_small_hamming(spark, planted):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(planted).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [ham(fp[i], fp[1000 + i]) for i in range(30)]
    far = [ham(fp[i], fp[j]) for i in range(20) for j in range(30, 50)]
    assert max(near) < 16  # one token changed out of 40
    assert sum(far) / len(far) > sum(near) / len(near) + 8


def test_payload_byte_identity(spark, docs):
    """north-rule invariant: payload bytes pass through the multimodal
    pipeline untouched — sha256 per doc equals sha256 of the source
    text bytes."""
    from chopin_spark.multimodal import attach_payload, extract_meta

    out = extract_meta(attach_payload(docs)).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == len(src)
    for r in out:
        want = hashlib.sha256(src[r["doc_id"]].encode()).hexdigest()
        assert r["sha256"] == want
        assert r["n_bytes"] == len(src[r["doc_id"]].encode())


def test_compressed_decode_raises(spark):
    """decode_image is REAL for uncompressed BMP; compressed formats
    (no codec in this container) must refuse loudly, not fake dims."""
    from chopin_spark.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG...")


def test_simhash_is_deterministic(spark, docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs.limit(50)).collect()}
    b = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs.limit(50).repartition(7)).collect()
    }
    assert a == b


def test_boilerplate_removal_actually_drops_lines(spark):
    """The boilerplate threshold must FIRE on the fixture corpus (a
    threshold that never triggers would make the oracle parity check
    vacuous): some documents lose lines, none gains, and the kept
    fingerprint differs from the all-lines fingerprint exactly for the
    documents that lost something."""
    from chopin_spark.queries.trainprep import boilerplate_line_removal
    from tests.conftest import SF_CORRECT

    out = boilerplate_line_removal(spark, SF_CORRECT).collect()
    assert len(out) > 0
    dropped = [r for r in out if r["n_kept"] < r["n_lines"]]
    assert dropped, "no boilerplate line fired — threshold vacuous"
    kept_all = [r for r in out if r["n_kept"] == r["n_lines"]]
    assert kept_all, "every line dropped — threshold degenerate"
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_lines"]
        assert abs(r["kept_frac"] - round(r["n_kept"] / r["n_lines"], 4)) < 1e-9


def test_prefix_filter_agrees_with_inverted_index(spark):
    """Two independent exact-Jaccard algorithms (prefix filter vs
    full inverted-index join) must produce the same pair set at the
    same threshold."""
    from chopin_spark.tables import load
    from chopin_spark.textops import jaccard_prefix_pairs, ngram_jaccard_pairs
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    via_prefix = {
        (r.d1, r.d2): (r.inter, r.uni)
        for r in jaccard_prefix_pairs(docs, threshold_tenths=6).collect()
    }
    brute = {
        (r.d1, r.d2): round(r.jaccard, 4)
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
        if 10 * round(r.jaccard, 4) >= 6  # jaccard >= 0.6
    }
    assert set(via_prefix) == set(brute)
    assert via_prefix  # non-vacuous: near-dup pairs exist in the fixture
    for (d1, d2), (i, u) in via_prefix.items():
        assert 10 * i >= 6 * u


def test_gopher_gate_rules_all_discriminate(spark):
    """Every Gopher rule must fire somewhere AND pass somewhere —
    an all-zero or all-fail rule column verifies nothing."""
    from chopin_spark.queries.trainprep import gopher_quality_gate
    from tests.conftest import SF_CORRECT

    rows = gopher_quality_gate(spark, SF_CORRECT).collect()
    tot = {
        c: sum(getattr(r, c) for r in rows)
        for c in ("n_docs", "fail_len", "fail_wordlen",
                  "fail_stopwords", "fail_repetition", "n_pass")
    }
    for c in ("fail_len", "fail_wordlen", "fail_stopwords",
              "fail_repetition"):
        assert 0 < tot[c] < tot["n_docs"], c
    assert 0 < tot["n_pass"] < tot["n_docs"]


def test_canonical_selection_semantics(spark):
    """Canonical = longest member (min doc_id on ties); the drop-set
    checksum and member counts must be consistent with the raw
    component labeling."""
    from chopin_spark.queries.textops import (
        dedup_cluster_canonical,
        dedup_components,
    )

    comp_rows = dedup_components(spark, SF_CORRECT).collect()
    chars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    members: dict[int, list[int]] = {}
    for r in comp_rows:
        members.setdefault(r.comp_id, []).append(r.doc_id)

    got = {
        r.comp_id: (r.canonical_doc, r.n_members, r.dropped_id_sum)
        for r in dedup_cluster_canonical(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(members)
    for cid, docs in members.items():
        canon = max(docs, key=lambda d: (chars[d], -d))
        assert got[cid] == (canon, len(docs), sum(docs) - canon), cid
        assert len(docs) >= 2  # pair-graph components are never singletons


def test_dsir_scores_separate_target_slice(spark):
    """The English (target) slice must score higher on average than
    the non-target slice — otherwise the LLR model learned nothing —
    and every document must be scored."""
    from chopin_spark.queries.trainprep import dsir_importance_weights

    rows = dsir_importance_weights(spark, SF_CORRECT).collect()
    n_docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
    )
    assert len(rows) == n_docs  # no doc dropped (none are feature-free)
    en = [r.dsir_score for r in rows if r.lang == "en"]
    rest = [r.dsir_score for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    assert all(r.n_feats >= 1 for r in rows)


def test_dsir_gumbel_topk_upweights_target(spark):
    """The Gumbel-top-k resample must over-represent the target (en)
    slice relative to its corpus base rate — otherwise the temperature
    lets noise drown the importance scores."""
    from chopin_spark.queries.trainprep import _DSIR_TOPK, dsir_gumbel_topk

    rows = dsir_gumbel_topk(spark, SF_CORRECT).collect()
    assert len(rows) == _DSIR_TOPK
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    base = docs.filter("lang = 'en'").count() / docs.count()
    frac = sum(1 for r in rows if r.lang == "en") / len(rows)
    assert frac > base + 0.15
    # keys are strictly decreasing-or-tie-broken: no duplicate doc
    assert len({r.doc_id for r in rows}) == _DSIR_TOPK


def test_containment_catches_subset_copy_jaccard_misses(spark):
    """The operator's reason to exist: a short doc pasted whole into a
    much longer one has containment 1.0 but Jaccard well under any
    resemblance threshold — the Jaccard query keeps both copies, the
    containment query flags the pair."""
    from chopin_spark.textops import containment_pairs

    short = " ".join(f"s{k}" for k in range(20))
    long_ = short + " " + " ".join(f"t{k}" for k in range(200))
    rows = [
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": long_},
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == [], "resemblance must miss the subset copy"
    cont = containment_pairs(docs, threshold=0.8).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    # every one of the short doc's 16 distinct 5-gram shingles appears
    # in the long doc (it starts with the short text verbatim)
    assert r["c_fwd"] == 1.0
    assert r["c_rev"] < 0.1


def test_decontam_flags_only_docs_sharing_eval_13grams(spark):
    """Planted contamination: the corpus doc that embeds a 13-token run
    from an eval doc is flagged with the exact shared-shingle count;
    clean corpus docs and eval docs themselves never appear."""
    from chopin_spark.queries.textops import (
        _DECONTAM_ORACLE,
        benchmark_decontam_13gram,
    )
    import duckdb
    import os
    import tempfile

    ev_text = " ".join(f"e{k}" for k in range(30))  # doc_id 3 -> eval
    # corpus doc 5 copies eval tokens 5..17 (13 tokens -> ONE shared
    # 13-gram) into otherwise-unique text
    stolen = " ".join(f"e{k}" for k in range(5, 18))
    rows = [
        {"doc_id": 3, "text": ev_text},
        {"doc_id": 5, "text": " ".join(f"c{k}" for k in range(10))
                              + " " + stolen
                              + " " + " ".join(f"d{k}" for k in range(10))},
        {"doc_id": 6, "text": " ".join(f"z{k}" for k in range(40))},
    ]
    pdf = pd.DataFrame(rows)
    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td, "sf")
        os.makedirs(sf)
        duckdb.connect().execute(
            f"COPY (SELECT doc_id, text FROM pdf) TO "
            f"'{sf}/documents.parquet' (FORMAT PARQUET)"
        )
        out = benchmark_decontam_13gram(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 5
    assert r["n_contam"] == 1
    # doc 5 has 33 tokens -> 21 distinct 13-gram shingles
    assert r["n_sh"] == 21
    assert r["contam_frac"] == round(1 / 21, 4)


def test_decontam_eval_side_is_broadcast(spark):
    """The 100 TB plan shape: the eval shingle set must arrive via a
    BroadcastExchange — the corpus side is never shuffled for the
    contamination join."""
    from chopin_spark.queries.textops import benchmark_decontam_13gram

    df = benchmark_decontam_13gram(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_robots_wildcard_matches_reference_matcher(spark):
    """Per-document decisions from the LIKE-join plan must equal an
    independent regex REP matcher (longest rule wins, allow breaks
    ties) over the same paths."""
    import re

    from chopin_spark.queries.webtext import (
        _WC_MATCH, _WC_RULES, _wc_like,
    )
    from chopin_spark.tables import load

    load(spark, "/root/testdata/sf0.001", "documents").limit(300) \
        .createOrReplaceTempView("documents")
    rules = spark.createDataFrame(
        [(p, _wc_like(p), d, len(p)) for p, d in _WC_RULES],
        "pattern string, like_pat string, decision string, plen int",
    )
    rules.createOrReplaceTempView("wrules")
    got = spark.sql(
        "WITH "
        + _WC_MATCH[:_WC_MATCH.index("SELECT COALESCE")].rstrip().rstrip(",")
        + """
SELECT d.doc_id, d.path, COALESCE(m.decision, 'allow') AS decision
FROM docs d LEFT JOIN decided m ON d.doc_id = m.doc_id
"""
    ).collect()
    assert len(got) == 300

    def ref_decide(path: str) -> str:
        best = None  # (plen, allow_flag, decision)
        for pat, dec in _WC_RULES:
            body = pat[:-1] if pat.endswith("$") else pat
            rx = "".join(".*" if ch == "*" else re.escape(ch)
                         for ch in body)
            rx = rx + "$" if pat.endswith("$") else rx + ".*"
            if re.match(rx, path):
                key = (len(pat), 1 if dec == "allow" else 0)
                if best is None or key > best[0]:
                    best = (key, dec)
        return best[1] if best else "allow"

    mismatches = [
        (r["path"], r["decision"], ref_decide(r["path"]))
        for r in got if r["decision"] != ref_decide(r["path"])
    ]
    assert not mismatches, mismatches[:5]
    # the fixture must exercise both decisions and at least one
    # tie-breaking allow override
    decs = {r["decision"] for r in got}
    assert decs == {"allow", "deny"}
    assert any(r["decision"] == "allow" and r["path"].startswith("/s4/")
               and r["path"].endswith(".html") for r in got)
