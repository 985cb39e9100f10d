"""Web-scale text-pipeline operators: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash), text quality, language heuristics, document
fingerprinting.

These extend the reference's operator set to the training-data-pipeline
ops the north rule's Common-Crawl-style corpus needs. Everything stays
JVM-side (split / HOFs / xxhash64 / groupBy) — there is NO Python in
any hot path; the plans are linear scans + one or two hash shuffles.

Dedup strategy at 100 TB:
- exact: groupBy(md5(text)) — one shuffle on a 16-byte key.
- n-gram Jaccard: inverted-index self-join on shingles (exact, output =
  all pairs sharing ≥1 shingle) — right when shingle frequency is
  bounded; hot shingles are the skew case AQE splits.
- MinHash-LSH: constant-size signature per doc (H mins), band-bucket
  equi-join — the scale path: candidate volume is O(near-dup pairs),
  not O(docs sharing a token).
- SimHash: 64-bit fingerprint; hamming-ball lookup via band exact-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic MinHash parameters: (a, b) pairs from a fixed LCG — part
# of the engine definition, not runtime randomness (resume/lineage-safe)
_MERSENNE = 2147483647

# Polynomial string/shingle hashes (SQL-expressible in BOTH Spark and
# DuckDB — VERDICT r01 next-steps #5: xxhash64 had no DuckDB twin, which
# forced the MinHash/SimHash queries into rows-only driver checks).
# All arithmetic stays < 2^61: hashes < P30 ≈ 2^30, multipliers < 2^21.
P30 = 1_000_000_007  # ~30-bit prime modulus
_SHINGLE_B = 1_000_003  # shingle-combine multiplier


def charfold_spark(var: str, mult: int = 31) -> str:
    """31-polynomial char hash of a string expr — Spark SQL text."""
    return (
        f"aggregate(transform(sequence(1, length({var})),"
        f" _ci -> cast(ascii(substring({var}, _ci, 1)) as bigint)),"
        f" cast(0 as bigint), (_h, _c) -> (_h * {mult} + _c) % {P30})"
    )


def charfold_duckdb(var: str, mult: int = 31) -> str:
    """Same fold as :func:`charfold_spark` in DuckDB SQL (list_reduce
    needs a seed row, hence list_prepend; same left-to-right order)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(generate_series(1, length({var})),"  # length = CHARS (strlen counts bytes; Spark length() is chars)
        f" _ci -> CAST(ascii(substr({var}, CAST(_ci AS INT), 1)) AS BIGINT))),"
        f" (_h, _c) -> (_h * {mult} + _c) % {P30})"
    )


def _shingle_fold(uh: str, i: str, n: int, elem_fmt: str) -> str:
    """n-token shingle hash from the token-hash array `uh` starting at
    1-based index `i`: left fold h = (h·B + u) mod P30."""
    expr = "CAST(0 AS BIGINT)"
    for k in range(n):
        e = elem_fmt.format(arr=uh, idx=f"{i} + {k}")
        expr = f"(({expr}) * {_SHINGLE_B} + {e}) % {P30}"
    return expr


def token_hashes_spark() -> str:
    """Spark SQL: text → array of per-token char-fold hashes.  Keep this
    as its OWN projected column — inlining it into the shingle transform
    re-evaluates the (interpreted) nested HOF once per reference, a
    measured 30× blowup at sf0.1."""
    return f"transform(split(text, ' '), _t -> {charfold_spark('_t')})"


def shingles_from_uh_spark(n: int = 5, arr: str = "_uh") -> str:
    """Spark SQL: token-hash array column → array of n-gram shingle
    hashes (polynomial combine) — identical values to the DuckDB twin."""
    return (
        f"transform(sequence(1, size({arr}) - {n - 1}), _i -> "
        + _shingle_fold(
            arr, "_i", n, "element_at({arr}, cast(({idx}) as int))"
        )
        + ")"
    )


def _hash_params(num_hashes: int) -> list[tuple[int, int]]:
    params, state = [], 88172645463325252
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + state % (_MERSENNE - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE
        params.append((a, b))
    return params


def token_hashes_duckdb() -> str:
    return (
        "list_transform(string_split(text, ' '),"
        f" _t -> {charfold_duckdb('_t')})"
    )


def shingles_from_uh_duckdb(n: int = 5, arr: str = "_uh") -> str:
    return (
        f"list_transform(generate_series(1, len({arr}) - {n - 1}), _i -> "
        + _shingle_fold(arr, "_i", n, "({arr})[{idx}]")
        + ")"
    )


# "Lines" for boilerplate removal: the synthetic corpus has no \n, so a
# line is a NON-OVERLAPPING n-token chunk (CCNet dedups newline-split
# lines; the chunking is the tokenizer-agnostic analogue, same move as
# trainprep's fixed-16-token C4 spans).  Each chunk is packed as
# pos * 2^31 + chunk_hash (hash < P30 < 2^31), so one BIGINT carries
# both document order and identity — sortable, foldable, dialect-free.
_POS_PACK = 2_147_483_648  # 2^31


def packed_chunk_hashes_spark(n: int = 4, arr: str = "_uh") -> str:
    """Spark SQL: token-hash array → array of pos-packed line hashes
    (1-based chunk index; docs shorter than n tokens → empty array)."""
    return (
        f"transform(sequence(1, size({arr}) div {n}), _i -> "
        f"_i * CAST({_POS_PACK} AS BIGINT) + "
        + _shingle_fold(
            arr, f"((_i - 1) * {n} + 1)", n,
            "element_at({arr}, cast(({idx}) as int))",
        )
        + ")"
    )


def packed_chunk_hashes_duckdb(n: int = 4, arr: str = "_uh") -> str:
    """DuckDB twin of :func:`packed_chunk_hashes_spark` (len // n can be
    0 → generate_series(1, 0) is empty, same as Spark's sequence)."""
    return (
        f"list_transform(generate_series(1, len({arr}) // {n}), _i -> "
        f"_i * CAST({_POS_PACK} AS BIGINT) + "
        + _shingle_fold(arr, f"((_i - 1) * {n} + 1)", n, "({arr})[{idx}]")
        + ")"
    )


def spread_input(df: DataFrame) -> DataFrame:
    """Unsplittable-input guard (guide §2.5 input skew): a single-row-
    group parquet file scans as ONE task, serializing every expensive
    per-row projection that follows (char-fold token hashing, shingle
    explosion — the dominant map-side cost of the dedup family).  When
    the scan is narrower than the scheduler's parallelism, redistribute
    rows round-robin BEFORE the heavy projection: the raw text crosses
    the wire once, which is ~an order of magnitude fewer bytes than the
    shingle explosion the next exchange would otherwise carry from one
    writer.  On properly split production input (splits ≥ cores) this
    is a NO-OP — the partition count is read from the actual scan, so
    the behavior is scale-adaptive, not tuned to local mode.  Callers
    pass base-table projections only (the .rdd partition probe plans
    but does not execute a bare scan)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def tokens_col(text: str = "text"):
    return F.split(F.col(text), " ")


def shingles(docs: DataFrame, id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Distinct word n-gram shingles per document (JVM HOFs only)."""
    w = tokens_col()
    sh = F.transform(
        F.sequence(F.lit(0), F.size("w") - n),
        lambda i: F.concat_ws(
            " ",
            *[
                F.element_at(F.col("w"), (i + F.lit(k + 1)).cast("int"))
                for k in range(n)
            ],
        ),
    )
    return (
        spread_input(docs.select(id_col, F.col("text")))
        .select(id_col, w.alias("w"))
        .filter(F.size("w") >= n)
        .select(id_col, F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    n: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join:
    J(A,B) = |A∩B| / (|A| + |B| - |A∩B|) over distinct shingle sets.
    Returns (d1, d2, jaccard) with d1 < d2.

    ``max_df`` is the scale guard: the pair join is O(Σ df²) over
    shingle document frequencies, so boilerplate shingles (headers,
    navigation chrome — df in the millions on a real crawl) make it
    quadratic. Dropping shingles with df > max_df bounds every
    shingle's pair fan-out at max_df² and re-bases sizes on the
    retained universe (capped Jaccard — the standard near-dup
    practice). The df filter shuffles on `shingle`, the same key as
    the pair join, so AQE coalesces them into one exchange."""
    sh = shingles(docs, id_col, n)
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return _jaccard_scored(sh, inter, id_col, threshold)


def _jaccard_scored(
    sh: DataFrame, inter: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Shared Jaccard finish: set sizes + round-4 ratio + threshold
    over an (d1, d2, i) intersection-count table — ONE definition of
    the scoring/tie policy for the exact and the LSH-verified paths."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("i")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    n: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT near-dup pairs (Broder 1997's
    second resemblance measure): C(A→B) = |A∩B| / |A| over distinct
    shingle sets.  Containment catches subset copies — a short document
    pasted whole into a much longer one — whose Jaccard is diluted by
    the longer side's extra shingles and slips under any resemblance
    threshold.  Returns (d1, d2, i, c_fwd, c_rev) with d1 < d2,
    c_fwd = i/|d1|, c_rev = i/|d2|, kept when either direction clears
    ``threshold``.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (the df cap
    is the identical 100 TB guard — pair fan-out is bounded per shingle,
    never n²); only the scoring finish differs, so the two operators
    share one shuffle structure and Catalyst can reuse the exchange
    when both run over the same corpus."""
    sh = shingles(docs, id_col, n)
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "c_fwd", F.round(F.col("i").cast("double") / F.col("n1"), 4)
        )
        .withColumn(
            "c_rev", F.round(F.col("i").cast("double") / F.col("n2"), 4)
        )
        .filter(F.greatest("c_fwd", "c_rev") >= threshold)
        .select("d1", "d2", "i", "c_fwd", "c_rev")
    )


def hashed_shingles(
    docs: DataFrame, id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Distinct n-gram shingle HASHES per document (polynomial char fold
    per token, polynomial combine across the n tokens — the values the
    DuckDB oracles rebuild via :func:`shingles_from_uh_duckdb`).

    Engine path: one vectorized mapInPandas (the simhash() argument —
    Spark interprets HOF lambdas per element, and this fold dominated
    every MinHash/Jaccard query's map side).  The numpy fold replays
    the identical int64 recurrences — (h·31 + codepoint) mod P30 per
    token, then s = (s·B + u) mod P30 across the n tokens — every
    intermediate < 2^51, exact, so the shingle values are bit-identical
    to the SQL twin (oracle-pinned).  The trailing .distinct() is
    unchanged."""
    import numpy as np
    import pandas as pd

    def fold(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            tok_lists = [t.split(" ") for t in pdf["text"].tolist()]
            n_tok = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
            toks = [t for ts in tok_lists for t in ts]
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            tstarts = np.zeros(len(toks), dtype=np.int64)
            np.cumsum(lens[:-1], out=tstarts[1:])
            blob = "".join(toks)
            codes = (
                np.frombuffer(
                    blob.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if blob
                else np.zeros(0, dtype=np.int64)
            )
            uh = np.zeros(len(toks), dtype=np.int64)
            maxlen = int(lens.max()) if len(lens) else 0
            for p in range(maxlen):
                m = lens > p
                uh[m] = (uh[m] * 31 + codes[tstarts[m] + p]) % P30
            # shingle windows: docs with < n tokens yield none
            cnt = np.where(n_tok >= n, n_tok - n + 1, 0)
            if int(cnt.sum()) == 0:
                yield pd.DataFrame(
                    {id_col: ids[:0], "v": np.zeros(0, dtype=np.int64)}
                )
                continue
            doc_starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(n_tok[:-1], out=doc_starts[1:])
            sh_doc = np.repeat(np.arange(len(pdf)), cnt)
            cnt_starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(cnt[:-1], out=cnt_starts[1:])
            within = (
                np.arange(int(cnt.sum()), dtype=np.int64)
                - np.repeat(cnt_starts, cnt)
            )
            base = np.repeat(doc_starts, cnt) + within
            sh = np.zeros(int(cnt.sum()), dtype=np.int64)
            for k in range(n):
                sh = (sh * _SHINGLE_B + uh[base + k]) % P30
            yield pd.DataFrame({id_col: ids[sh_doc], "v": sh})

    return (
        spread_input(docs.select(id_col, F.col("text")))
        .mapInPandas(fold, f"{id_col} long, v long")
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", n: int = 5, num_hashes: int = 32,
    sh: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: per doc, min over hashed shingles of H
    universal hashes ((a·v + b) mod p).  One groupBy with H
    min-aggregates — fully JVM-side, constant output per doc; v < 2^30
    and a < 2^31 keep a·v + b inside int64 under ANSI arithmetic.
    ``sh`` lets the verified-dedup path pass its already-materialized
    shingle table instead of re-deriving it."""
    if sh is None:
        sh = hashed_shingles(docs, id_col, n)
    aggs = [
        F.min(
            F.pmod(F.col("v") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    sh: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split the signature into `bands` rows of
    num_hashes/bands values; docs sharing any band bucket become
    candidate pairs. Candidates ≫ threshold recall: at r=4, b=8 a pair
    with J=0.9 is missed with p≈2e-4; J=0.5 pairs are mostly skipped —
    the classic S-curve. Returns distinct (d1, d2)."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
            " (trailing hash functions would be silently dropped)"
        )
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, n, num_hashes, sh=sh)
    # bucket key = the band's signature values joined as a string — an
    # equi-join key both engines compute identically (hashing it again
    # would only re-bucket the same partitions)
    band_rows = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_", *[F.col(f"h{bi * r + k}") for k in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = band_rows.select(F.col(id_col).alias("d1"), "band", "bucket")
    b = band_rows.select(F.col(id_col).alias("d2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_dedup_verified(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold —
    the production near-dup plan: LSH prunes the pair space, the exact
    check removes false positives. (False *negatives* are the LSH
    S-curve tail; use threshold ≥ 0.9 with the default banding.)"""
    cand = minhash_lsh_pairs(docs, id_col, n)
    # exact Jaccard over the hashed shingle sets (same sets the
    # signatures minimize over, same sets the DuckDB oracle rebuilds)
    sh = hashed_shingles(docs, id_col, n)
    a = sh.select(F.col(id_col).alias("d1"), "v")
    b = sh.select(F.col(id_col).alias("d2"), "v")
    inter = (
        cand.join(a, "d1")
        .join(b, ["d2", "v"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return _jaccard_scored(sh, inter, id_col, threshold)


SIMHASH_BITS = 60


def token_hash60_spark(var: str) -> str:
    """60-bit token hash from two independent char folds (mult 31 / 131),
    each < 2^30: h = fold31 | fold131 << 30.  SQL-expressible in DuckDB
    (:func:`token_hash60_duckdb`) — replaces xxhash64, which DuckDB
    lacks, so the SimHash query gets a value-level oracle."""
    return (
        f"({charfold_spark(var, 31)})"
        f" + ({charfold_spark(var, 131)}) * cast({1 << 30} as bigint)"
    )


def token_hash60_duckdb(var: str) -> str:
    return (
        f"({charfold_duckdb(var, 31)})"
        f" + ({charfold_duckdb(var, 131)}) * CAST({1 << 30} AS BIGINT)"
    )


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash fingerprint: per-token 60-bit polynomial hash; bit
    k of the fingerprint = sign of Σ(±1 per token at bit k).

    Engine path: ONE vectorized mapInPandas over (id, text) batches —
    the interpreted higher-order-function char fold was the measured
    dominant cost of every SimHash query (~10 s of executor CPU per
    pass at sf0.1; Spark does not codegen `aggregate`/`transform`
    lambdas), and the explode + 60 conditional-sum aggregates added a
    fact-sized shuffle.  The numpy fold replays the IDENTICAL integer
    recurrence ((h·31 + codepoint) mod P30, and the 131 twin) on int64
    — every intermediate < 2^40, exact — and sums the ±1 bit votes per
    document, so the fingerprints are bit-identical to the SQL twin
    (pinned by the brute-force oracles and test_textops).  Map-only
    stage, no shuffle; scan parallelism via spread_input.  Guide §4.2:
    hand whole batches to vectorized native code instead of
    per-element interpreted JVM lambdas."""
    import numpy as np
    import pandas as pd

    def fold(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            tok_lists = [t.split(" ") for t in pdf["text"].tolist()]
            n_tok = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
            doc_idx = np.repeat(np.arange(len(pdf)), n_tok)
            toks = [t for ts in tok_lists for t in ts]
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            starts = np.zeros(len(toks), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            blob = "".join(toks)
            codes = (
                np.frombuffer(
                    blob.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if blob
                else np.zeros(0, dtype=np.int64)
            )
            h31 = np.zeros(len(toks), dtype=np.int64)
            h131 = np.zeros(len(toks), dtype=np.int64)
            maxlen = int(lens.max()) if len(lens) else 0
            for p in range(maxlen):
                m = lens > p
                c = codes[starts[m] + p]
                h31[m] = (h31[m] * 31 + c) % P30
                h131[m] = (h131[m] * 131 + c) % P30
            h60 = h31 + h131 * (1 << 30)
            fp = np.zeros(len(pdf), dtype=np.int64)
            for k in range(SIMHASH_BITS):
                votes = 2 * ((h60 >> k) & 1) - 1
                b = np.bincount(
                    doc_idx, weights=votes, minlength=len(pdf)
                )
                fp |= (b > 0).astype(np.int64) << k
            yield pd.DataFrame({id_col: ids, "simhash": fp})

    return spread_input(docs.select(id_col, F.col("text"))).mapInPandas(
        fold, f"{id_col} long, simhash long"
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    threshold_tenths: int,
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin,
    Bayardo WWW'07 / Xiao WWW'08) — the other canonical scale path
    beside the df-capped inverted index (:func:`ngram_jaccard_pairs`)
    and MinHash-LSH (:func:`minhash_lsh_pairs`), and unlike LSH it is
    EXACT: complete by theorem, verified, no recall loss.

    Tokens sort by global (df, token) — rarest first; each doc indexes
    only its first p = |s| − ceil(t·|s|) + 1 tokens.  If J(A,B) ≥ t,
    the smallest common token w must sit in BOTH prefixes (were w
    outside A's prefix, all of A∩B would fit in A's suffix of size
    ceil(t·|A|)−1 < ceil(t·|A|) ≤ |A∩B| — contradiction), so the
    prefix-to-prefix equi-join loses nothing.  Candidate volume is
    O(Σ df_prefix²) over PREFIX postings only — rare tokens, small df —
    instead of O(Σ df²) over all postings; no df cap, no dropped pairs.

    `threshold_tenths` keeps the threshold rational (6 → 0.6): the
    final filter is the integer cross-multiplication 10·i ≥ t10·u, no
    float knife-edge.  Returns (d1, d2, inter, uni, jaccard ROUND 4).

    Scale: one df shuffle on token, one per-doc sort of its OWN tokens
    (array_sort over a collected doc-local list — docs are bounded,
    this is not a global sort), the prefix self-join, and a verify join
    that touches only candidate pairs.
    """
    t10 = threshold_tenths
    sh = shingles(docs, id_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "shingle")
    per_doc = ranked.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("_df", "shingle"))
        ).alias("toks"),
        F.count(F.lit(1)).alias("sz"),
    )
    p = (
        F.col("sz")
        - F.expr(f"({t10} * sz + 9) DIV 10")
        + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        "sz",
        F.explode(F.slice("toks", F.lit(1), p)).alias("tk"),
    ).select(id_col, "sz", F.col("tk.shingle").alias("shingle"))
    a = prefix.select(
        F.col(id_col).alias("d1"), F.col("sz").alias("s1"), "shingle"
    )
    b = prefix.select(
        F.col(id_col).alias("d2"), F.col("sz").alias("s2"), "shingle"
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "s1", "s2")
        .distinct()
    )
    s1 = sh.select(F.col(id_col).alias("d1"), "shingle")
    s2 = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2", "s1", "s2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    uni = F.col("s1") + F.col("s2") - F.col("inter")
    return (
        inter.withColumn("uni", uni.cast("long"))
        .filter(F.lit(10) * F.col("inter") >= F.lit(t10) * F.col("uni"))
        .select(
            "d1", "d2",
            F.col("inter").cast("long").alias("inter"),
            "uni",
            F.round(
                F.col("inter").cast("double") / F.col("uni"), 4
            ).alias("jaccard"),
        )
    )
