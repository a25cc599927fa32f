"""Document deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard (C1).

All stages are pure DataFrame compositions (no Python in the hot path):

- **exact**: hash-group-by on normalized text.
- **MinHash-LSH**: word n-gram shingles -> k minhashes (k aggregate
  ``min(hash(shingle, seed))`` over the exploded shingle set) -> band
  signatures -> same-bucket candidate pairs -> exact-Jaccard verification.
- **SimHash**: 32-bit fingerprint from per-token hash bit votes; near-dup
  candidates via band bucketing (Hamming-distance blocking).
- **n-gram Jaccard**: the exact verifier, reusable standalone.

Scale notes (100 TB posture):
- Everything keys on shingle/band hashes — shuffles are on small fixed-width
  ints, never raw text; dedup state never sits on one node.
- LSH banding bounds the candidate-pair explosion: pairs are generated only
  within (band, signature) buckets.  Hot buckets (boilerplate text) should be
  salted/capped in production; we cap pairs-per-bucket defensively.
- The exact verifier joins candidate doc-ids back to shingle sets — two
  broadcast-free shuffle joins on long keys, AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[^a-z0-9]+"


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to full parallelism before CPU-bound per-row transforms.

    A small input (one parquet file => one partition) would otherwise pin the
    tokenizer to one core; the row shuffle is trivial next to the transform.
    At cluster scale the scan already has many partitions and AQE coalesces
    the added exchange away when it isn't needed.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def normalized_tokens(text_col) -> "F.Column":
    """Lower-case word tokens with empty strings removed (deterministic)."""
    return F.filter(
        F.split(F.lower(text_col), TOKEN_RE), lambda t: t != F.lit("")
    )


def shingles(text_col, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles as strings ('w1 w2 w3')."""
    toks = normalized_tokens(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: representative id (min), duplicate count.

    Spark plan: single hash-aggregate on the text hash — at scale, group on
    ``xxhash64(text)`` first so the shuffle key is 8 bytes, not the document.
    """
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, minhash_0..k-1) — k independent minhashes over the shingle set.

    Uses ``min(xxhash64(shingle, seed_i))`` per document: the explode shuffles
    (doc_id, shingle_hash) pairs only, and the k mins are one hash-aggregate
    pass (map-side combined).
    """
    exploded = _spread(df).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(seed))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact verified Jaccard.

    LSH recall knob: bands=4 over 16 hashes => r=4 rows/band; collision prob
    at Jaccard j is 1-(1-j^4)^4 (~0.9 at j=0.7).  Verification is exact, so
    precision is 1.0 given the threshold.
    """
    rows_per_band = num_hashes // bands
    # Tokenize ONCE: the shingle-set relation feeds both the signature pass
    # and the verification joins.  cache() avoids re-running the regexp
    # tokenizer three times (at cluster scale this is a checkpoint/persist to
    # MEMORY_AND_DISK; the relation is (id, array<string>) — small vs corpus).
    sets = _spread(df).select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh_set")
    ).cache()

    exploded = sets.select(F.col(id_col), F.explode("sh_set").alias("sh"))
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(seed))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    sigs = exploded.groupBy(id_col).agg(*mins)

    # One (id, band_idx, band_sig) relation + ONE self-join — not a join per
    # band: band index participates in the join key so collisions only pair
    # within the same band.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(F.col(id_col), F.explode(band_structs).alias("bs")).select(
        F.col(id_col), F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    left = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "sig")
    candidates = (
        left.join(right, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    verified = (
        candidates.join(sets.withColumnsRenamed({id_col: "id_a", "sh_set": "set_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sh_set": "set_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash) 32-bit fingerprint: per-token hash bit votes, sign-summed.

    One explode + one aggregate with ``bits`` conditional sums — all JVM-side.
    """
    toks = _spread(df).select(
        F.col(id_col), F.explode(normalized_tokens(F.col(text_col))).alias("tok")
    )
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    fingerprint = None
    for i in range(bits):
        bit = F.when(F.col(f"bit_{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select(F.col(id_col), fingerprint.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Candidate near-dup pairs whose SimHash Hamming distance <= max_hamming.

    Blocking: split the fingerprint into ``bands`` byte-bands; any pair within
    Hamming<=bands-1 shares at least one exact band (pigeonhole).  Exact
    Hamming verification via bit_count(xor).
    """
    fp = simhash(df, id_col, text_col, bits)
    width = bits // bands
    mask = (1 << width) - 1
    banded = fp.select(
        F.col(id_col),
        F.col("simhash"),
        *[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias(f"band_{b}")
            for b in range(bands)
        ],
    )
    candidates = None
    for b in range(bands):
        left = banded.select(
            F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"band_{b}").alias("sig")
        )
        right = banded.select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"band_{b}").alias("sig")
        )
        pairs = (
            left.join(right, "sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b")
        )
        candidates = pairs if candidates is None else candidates.unionByName(pairs)
    return (
        candidates.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    blocking: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    ``blocking`` (id_a, id_b) bounds the pair space; without it this is the
    quadratic verifier for fixture-scale tests only — production always blocks
    via :func:`minhash_lsh_pairs` or :func:`simhash_near_pairs` first.
    """
    sets = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh_set"))
    if blocking is None:
        a = sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("set_a"))
        b = sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("set_b"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = (
            blocking.join(
                sets.withColumnsRenamed({id_col: "id_a", "sh_set": "set_a"}), "id_a"
            ).join(sets.withColumnsRenamed({id_col: "id_b", "sh_set": "set_b"}), "id_b")
        )
    return (
        pairs.withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
