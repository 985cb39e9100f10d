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


def _hash_params(num_hashes: int) -> list[tuple[int, int]]:
    params, state = [], 88172645463325252
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = 1 + state % (_MERSENNE - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE
        params.append((a, b))
    return params


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
        docs.select(id_col, w.alias("w"))
        .filter(F.size("w") >= n)
        .select(id_col, F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join:
    J(A,B) = |A∩B| / (|A| + |B| - |A∩B|) over distinct shingle sets.
    Returns (d1, d2, jaccard) with d1 < d2."""
    sh = shingles(docs, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
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


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", n: int = 5, num_hashes: int = 32
) -> DataFrame:
    """MinHash signatures: per doc, min over shingles of H universal
    hashes ((a·x + b) mod p) of the shingle's xxhash64. One groupBy with
    H min-aggregates — fully JVM-side, constant output per doc."""
    sh = shingles(docs, id_col, n)
    # bound the base hash to 2^31 so a·x + b stays within int64 under
    # ANSI arithmetic (no silent wrap, no overflow error)
    base = F.pmod(F.xxhash64("shingle"), F.lit(1 << 31))
    aggs = [
        F.min(F.pmod(base * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(
            f"h{i}"
        )
        for i, (a, b) in enumerate(_hash_params(num_hashes))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split the signature into `bands` rows of
    num_hashes/bands values; docs sharing any band bucket become
    candidate pairs. Candidates ≫ threshold recall: at r=4, b=8 a pair
    with J=0.9 is missed with p≈2e-4; J=0.5 pairs are mostly skipped —
    the classic S-curve. Returns distinct (d1, d2)."""
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, n, num_hashes)
    band_rows = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{bi * r + k}") for k in range(r)]
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
    sh = shingles(docs, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        cand.join(a, "d1")
        .join(b, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
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


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint: per token xxhash64; bit k of the
    fingerprint = sign of Σ(±1 per token at bit k). Pure column math —
    64 conditional-sum aggregates in one groupBy."""
    tok = docs.select(
        id_col, F.explode(tokens_col()).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), k).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{k}")
        for k in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for k in range(64):
        bit = F.when(F.col(f"b{k}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, k)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(id_col, fp.alias("simhash"))
