"""Near-duplicate detection families: MinHash+LSH, SimHash, n-gram
Jaccard — the large-scale training-data dedup operators.

Design for 100 TB:
- shingling + hashing are pure JVM expressions (transform/md5) — one
  scan, no Python, no shuffle.
- MinHash signatures collapse each document to NUM_PERM strings before
  anything shuffles; the LSH band join shuffles only (band, band_hash)
  keys, never document text. Candidate volume is controlled by the
  band/row split exactly as in the MinHash-LSH literature.
- n-gram Jaccard is the exact (quadratic) method — used on blocked
  candidates, never the full corpus, at scale.

Everything is md5-based so DuckDB reproduces it bit-for-bit: MinHash
takes the lexicographic min of md5(seed || shingle) hex strings — a
uniform hash order without engine-specific integer hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_PERM = 8  # minhash permutations (seeded md5 namespaces)
BANDS = 4  # LSH bands → rows_per_band = NUM_PERM // BANDS


def word_shingles(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-grams as an array<string>; EMPTY array for
    documents shorter than k tokens. The short-doc branch matters:
    sequence(1, n) with n <= 0 yields the DESCENDING array [1, 0] in
    Spark (and slice(toks, 0, k) then throws), while DuckDB's
    generate_series(1, 0) is empty — so both the crash and the oracle
    divergence are avoided by guarding on token count."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks) - F.lit(k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _seeded_md5(seed: int):
    # single-arg closure: a default-arg lambda would change the arity
    # PySpark inspects and make transform() pass the element INDEX here
    def fn(s: Column) -> Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), s))

    return fn


def minhash_signature(shingles: Column, num_perm: int = NUM_PERM) -> list[Column]:
    """num_perm minhash values: min over md5('<seed>|' || shingle)."""
    return [
        F.array_min(F.transform(shingles, _seeded_md5(seed))).alias(f"mh_{seed}")
        for seed in range(num_perm)
    ]


def lsh_bands(df: DataFrame, num_perm: int = NUM_PERM, bands: int = BANDS) -> DataFrame:
    """Explode a signature table (id + mh_0..mh_{n-1}) into
    (id, band, band_hash) rows; equal band_hash ⇒ candidate pair."""
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    id_cols = [c for c in df.columns if not c.startswith("mh_")]
    return (
        df.select(*id_cols, F.explode(F.array(*band_cols)).alias("bb"))
        .select(*id_cols, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    )


def simhash_expr(text_col: str | Column = "text", bits: int = 32) -> Column:
    """SimHash over word tokens: per bit, majority vote of token-hash
    bits (hex-nibble decoding of md5 — portable to any SQL engine).

    bit b of token t = (nibble(md5(t), b // 4) >> (b % 4)) & 1
    simhash bit b    = 1 iff sum(2*bit - 1) > 0 over tokens

    Callers should materialize the token-hash array in a prior
    projection and pass it as ``precomputed_hexes`` when building many
    derived columns (see q_docs_simhash).
    """
    toks = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    return simhash_from_hexes(F.transform(toks, F.md5), bits)


def token_hexes(text_col: str = "text") -> Column:
    """md5 hex per whitespace token — materialize this once, then feed
    simhash_from_hexes (avoids re-hashing per derived column)."""
    return F.transform(F.split(F.col(text_col), " "), F.md5)


def simhash_from_hexes(hexes: Column, bits: int = 32) -> Column:
    def nibble(h: Column, i: int) -> Column:
        # instr is 1-based; md5 hex is lowercase on both engines
        return F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1

    def bit_merger(b: int):
        # two-arg closure (see _seeded_md5 note on PySpark arity)
        def merge(s: Column, h: Column) -> Column:
            return s + F.shiftright(nibble(h, b // 4), b % 4).bitwiseAND(F.lit(1)) * 2 - 1

        return merge

    acc = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hexes, F.lit(0).cast("long"), bit_merger(b))
        acc = acc + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("int") if bits <= 64 else None


def simhash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) via explode + one partially-aggregated groupBy —
    measured ~3x faster than the per-row 32-bit-fold expression form
    (codegen'd conditional sums beat interpreted array folds), and the
    shuffle stays tiny: a document's tokens are colocated, so map-side
    combine collapses each doc to one 32-vote row before the exchange.
    Output is identical to simhash_expr (verified by test + measured
    equality)."""
    toks = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    toks = toks.withColumn("h", F.md5("tok"))

    def bit(b: int) -> Column:
        nib = F.instr(F.lit("0123456789abcdef"), F.substring("h", b // 4 + 1, 1)) - 1
        return F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))

    votes = toks.groupBy(id_col).agg(
        *[F.sum(bit(b) * 2 - 1).alias(f"v_{b}") for b in range(bits)]
    )
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.when(F.col(f"v_{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(id_col, acc.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bits: int = 32,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs at hamming distance <= max_hamming WITHOUT the
    all-pairs cross join: pigeonhole banding. Split the fingerprint
    into max_hamming+1 bit segments; any pair within max_hamming
    differs in at most max_hamming segments, so at least one segment
    is bit-identical — candidates are exactly the pairs sharing a
    (segment_idx, segment_value) key, found by an equi-join (the same
    bucketed-join shape as lsh_bands). Hamming is then verified on the
    candidates only. Output is identical to the brute-force join.

    Scale note: pruning power is bounded by segment-value cardinality
    (2^(bits/(max_hamming+1)) buckets per segment). With a 32-bit hash
    and distance 8 that's 8-16 buckets per segment — adequate here;
    at 10^9+ docs use a 64/128-bit simhash (7-14-bit segments) with
    this same operator, which is the Manku-et-al. permuted-table
    scheme expressed relationally.
    """
    n_seg = max_hamming + 1
    base, extra = divmod(bits, n_seg)
    sizes = [base + (1 if i < extra else 0) for i in range(n_seg)]
    offsets = [sum(sizes[:i]) for i in range(n_seg)]

    def seg_val(col: Column, i: int) -> Column:
        return F.shiftright(col, offsets[i]).bitwiseAND(F.lit((1 << sizes[i]) - 1))

    segs = F.array(
        *[
            F.struct(F.lit(i).alias("seg"), seg_val(F.col(hash_col), i).alias("val"))
            for i in range(n_seg)
        ]
    )
    ex = (
        df.select(id_col, hash_col, F.explode(segs).alias("s"))
        .select(id_col, hash_col, F.col("s.seg").alias("seg"), F.col("s.val").alias("val"))
    )
    l, r = ex.alias("l"), ex.alias("r")
    lh, rh = F.col(f"l.{hash_col}"), F.col(f"r.{hash_col}")
    # a pair colliding in several segments would be emitted once per
    # collision; keep only the FIRST matching segment's copy — a pure
    # bit-compare on the two hashes, so the dedup costs no shuffle
    # (vs a distinct() over the full candidate set)
    first_eq = F.lit(-1)
    for i in reversed(range(n_seg)):
        first_eq = F.when(seg_val(lh, i) == seg_val(rh, i), F.lit(i)).otherwise(first_eq)
    return (
        l.join(
            r,
            (F.col("l.seg") == F.col("r.seg"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .filter(F.col("l.seg") == first_eq)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming_distance(lh, rh).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs via shingle-inverted
    index: explode shingles → self-join on shingle → count shared /
    union. The join key is the shingle, so only documents sharing at
    least one shingle ever meet — the sparse-similarity-join pattern.

    ``max_df``: drop shingles appearing in more than max_df documents
    BEFORE the self-join (jaccard is then over the capped shingle
    universe, on both the shared and union counts). This is the scale
    guard: a stop-shingle in f documents alone generates O(f²) pairs —
    one hot boilerplate line can dwarf the rest of the corpus. Capped
    document frequency bounds per-shingle join fan-out at max_df².
    """
    sh = df.select(
        F.col(id_col), word_shingles(text_col, k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select(id_col, "n_sh", F.explode("sh").alias("g"))
    if max_df is not None:
        # shingles are distinct per document, so count(*) per g = df
        kept = (
            ex.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("g")
        )
        fex = ex.join(kept, "g").select(id_col, "g")
        n = fex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
        ex = fex.join(n, id_col).select(id_col, "n_sh", "g")
    left = ex.alias("l")
    right = ex.alias("r")
    pairs = (
        left.join(right, (F.col("l.g") == F.col("r.g")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.n_sh").alias("n_a"),
            F.col("r.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.round(
        F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
    ).alias("jaccard")
    return (
        pairs.select("id_a", "id_b", jac)
        .filter(F.col("jaccard") >= threshold)
    )
