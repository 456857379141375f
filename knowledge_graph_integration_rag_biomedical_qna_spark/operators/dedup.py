"""Deduplication operators for large-scale training-data pipelines.

All of these are first-class engine components (per the build brief): exact
hash dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard, and embedding-cosine
near-dup. Design notes for 100 TB:

- exact dedup: one groupBy on md5(text) — the only full shuffle; payload is a
  counter + min(doc_id), so map-side combine absorbs duplicates early.
- MinHash+LSH: signatures are computed per row (no shuffle), the band join
  groups only rows sharing a band key — candidate pairs, never the full cross
  product. Hash functions are md5-based so any SQL engine reproduces them
  bit-for-bit (the correctness oracle runs the same formula in DuckDB).
- pair verification: exact Jaccard on shingle sets of candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- exact -----------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per distinct text + duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- shingles / minhash ------------------------------------------------------

def with_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) exploded word n-grams of the lowercased text.

    Shingle = space-joined n consecutive tokens; texts shorter than n tokens
    yield their full token string as the single shingle.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    shingle = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingle)).alias("shingle"))


def minhash_hash_expr(i: int):
    """Hash i of the md5-derived family: 8 hex chars (32 bits) carved from
    md5('<i//4>:' || shingle) at offset 8*(i%4). Four hashes share one md5
    (whole-stage codegen CSEs the md5 across the four substrings), so a
    16-hash signature costs 4 md5 evaluations per shingle, not 16. Hex
    substrings compare lexicographically == numerically, which is all minhash
    needs. Engine-portable: the DuckDB oracle computes the identical value."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{i // 4}:"), F.col("shingle"))), 1 + 8 * (i % 4), 8
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(id, h0..h{m-1}) — hash i = min over shingles of minhash_hash_expr(i)."""
    aggs = [F.min(minhash_hash_expr(i)).alias(f"h{i}") for i in range(num_hashes)]
    return shingles.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Band the signature, bucket-join, emit candidate (id_a < id_b) pairs."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("key"))
        )
    banded = signatures.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, shingles: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs; keep pairs >= threshold."""
    sa = shingles.select(F.col("id").alias("id_a"), F.col("shingle"))
    sb = shingles.select(F.col("id").alias("id_b"), F.col("shingle"))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: verified duplicate pairs."""
    sh = with_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(sig, num_hashes=num_hashes, bands=bands)
    return jaccard_verify(cand, sh, threshold=threshold)


# --- simhash -----------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash bigint): per token, hash to `bits` bits (crc32 of token),
    sum +1/-1 votes per bit position, sign -> bit. Pure column expressions
    (explode + groupBy) — no Python. Near-dups then cluster by hamming bands.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("th", F.crc32(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sim = F.lit(0).cast("bigint")
    for i in range(bits):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return agg.select("id", sim.alias("simhash"))


def simhash_near_dups(sim: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Candidate near-dup pairs: identical high `prefix_bits` of the simhash
    (banding analog); returns pairs with hamming distance of full hashes."""
    banded = sim.withColumn("bucket", F.shiftright(F.col("simhash"), 32 - prefix_bits))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
    )
    return pairs


# --- embedding near-dup --------------------------------------------------------

def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine >= threshold pairs. Blocking on `block_col` (or an LSH sign
    bucket when None) keeps the self-join from going quadratic."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    base = embeddings.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        norm.alias("nrm"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    )
    if not block_col:
        # sign-LSH bucket: sign of sum of first 8 dims (cheap, deterministic)
        base = base.withColumn(
            "blk", (F.aggregate(F.slice("v", 1, 8), F.lit(0.0), lambda a, x: a + x) > 0).cast("int")
        )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
