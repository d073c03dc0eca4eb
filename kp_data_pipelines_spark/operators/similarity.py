"""Similarity search + near-duplicate detection at corpus scale (north star).

- ``cosine_topk``: brute-force cosine top-k against a query vector — the
  correctness baseline. All arithmetic in double via JVM higher-order
  functions (zip_with/aggregate); no Python in the loop. At 100 TB this is
  one scan + a top-k (TakeOrdered) — no shuffle of the full table.
- ``lsh_bucket_cosine_topk``: scale path — random-hyperplane (SimHash-style)
  bucketing prunes candidates before exact scoring.
- ``minhash_near_dups``: MinHash + LSH banding for Jaccard near-dup pairs.
- ``simhash64``: 64-bit SimHash fingerprint for Hamming-distance dedup.

All candidate generation is expressed as joins on bucket keys (shuffle on
band hash), never a cross join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def with_cosine(df: DataFrame, vec_col: str, query: list[float], out: str = "cosine") -> DataFrame:
    """Attach cosine similarity vs a constant query vector (double math)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = _dot(v, q)
    vn = F.sqrt(_dot(v, v))
    return df.withColumn(out, dot / (vn * F.lit(qn)))


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k: one scan, TakeOrdered(k) — the baseline ANN
    oracle. Deterministic tie-break on id."""
    scored = with_cosine(df, vec_col, query, "cosine")
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def simhash_planes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency in
    the plan; planes are tiny driver-side constants broadcast as literals)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / 2**31) * 2.0 - 1.0)
        planes.append(row)
    return planes


def with_hyperplane_bucket(
    df: DataFrame, vec_col: str, planes: list[list[float]], out: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH bucket id: sign-bit string over the planes."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        F.when(_dot(v, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return df.withColumn(out, F.concat(*bits))


def lsh_bucket_cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Scale-path ANN: score only vectors whose hyperplane bucket matches the
    query's bucket (expected candidate reduction 2^n_planes), then exact
    cosine top-k within candidates. Recall < 1 by construction; n_planes
    trades recall vs cost."""
    dim = len(query)
    planes = simhash_planes(dim, n_planes)
    bucketed = with_hyperplane_bucket(df, vec_col, planes)
    qbits = "".join(
        "1" if sum(a * b for a, b in zip(plane, query)) >= 0 else "0" for plane in planes
    )
    candidates = bucketed.filter(F.col("bucket") == qbits).drop("bucket")
    return cosine_topk(candidates, vec_col, id_col, query, k)


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate pairs (Jaccard over word shingles)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 31) - 1  # Mersenne-31: a*h+b stays < 2^62 (no ANSI overflow)


def _minhash_col(shingle_col, a: int, b: int):
    """One MinHash signature slot: min over shingles of a universal hash
    ``(a*h + b) mod p`` with h = xxhash64 folded into [0, p). All JVM
    built-ins; arithmetic bounded to avoid int64 overflow under ANSI."""
    hashed = F.transform(
        shingle_col,
        lambda s: (F.lit(a) * F.pmod(F.xxhash64(s), F.lit(_MERSENNE)) + F.lit(b))
        % _MERSENNE,
    )
    return F.array_min(hashed)


def minhash_signature(shingle_col, num_hashes: int = 32, seed: int = 11):
    """Array of ``num_hashes`` MinHash values with LCG-derived (a,b) params."""
    state = seed
    cols = []
    for _ in range(num_hashes):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        a = state % (_MERSENNE - 1) + 1
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE
        cols.append(_minhash_col(shingle_col, a, b))
    return F.array(*cols)


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash/LSH near-duplicate pairs.

    shingle -> minhash signature -> split into ``bands`` bands -> candidate
    pairs = equi-join on (band_index, band_hash) -> verify with estimated
    Jaccard (signature agreement rate) >= threshold.

    The only shuffle keys are band hashes — at 100 TB this is the standard
    banding trick: no pairwise comparison outside shared buckets. Returns
    (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    from kp_data_pipelines_spark.operators.textops import shingles

    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(shingles(text_col, shingle_k), num_hashes).alias("sig"),
    )
    banded = sig.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws("_", *[F.element_at("sig", i * rows_per_band + j + 1).cast("string") for j in range(rows_per_band)]))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(text_col, k: int = 2):
    """64-bit SimHash over word k-shingles, as a signed long.

    Per-bit majority vote of shingle hashes, expressed with higher-order
    functions (no UDF): for each bit position, count shingles with that bit
    set; bit in result = count*2 > n_shingles."""
    from kp_data_pipelines_spark.operators.textops import shingles

    sh = shingles(text_col, k)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    n = F.size(hashed)
    bit_terms = []
    for bit in range(64):
        ones = F.size(F.filter(hashed, lambda h: h.bitwiseAND(F.lit(1 << bit) if bit < 63 else F.lit(-(1 << 63))) != 0))
        bit_val = F.when(ones * 2 > n, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bit_terms.append(bit_val * F.lit(1 << bit if bit < 63 else -(1 << 63)))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, LSH-free but bucketed by a cheap
    length band to avoid the full cross join (exact verification path for
    small candidate sets; use minhash_near_dups first at scale)."""
    from kp_data_pipelines_spark.operators.textops import shingles

    g = df.select(
        F.col(id_col),
        F.array_distinct(shingles(text_col, n)).alias("grams"),
        (F.length(text_col) / 100).cast("int").alias("len_band"),
    )
    a, b = g.alias("a"), g.alias("b")
    band_match = F.abs(F.col("a.len_band") - F.col("b.len_band")) <= 1
    cand = a.join(b, band_match & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    inter = F.size(F.array_intersect("a.grams", "b.grams")).cast("double")
    union = F.size(F.array_union("a.grams", "b.grams")).cast("double")
    return (
        cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
