"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB: every variant is a pure DataFrame plan —

- exact:     one hash-groupBy (map-side partial agg, single shuffle);
- jaccard:   shingle explode -> self-join on shingle -> pair counts; the
  shingle join is the classic inverted-index pattern: common shingles are
  the skew risk, so ultra-frequent shingles are dropped by a document-
  frequency cap before the join (stop-shingle filter);
- minhash:   64 per-shingle hashes aggregated with min (one shuffle),
  banded into LSH buckets -> candidate pairs join within buckets only —
  the linear-scale path; signatures verify candidates without re-reading
  text;
- simhash:   64 sign-sum bits from token hashes, bucketed by 16-bit chunks
  (Hamming-distance blocking);
- embedding: cosine over LSH sign-buckets (random-hyperplane sketch) with
  exact verify, or brute-force within small blocks.

No Python in the hot path: hashing via xxhash64, aggregation via built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import tokens


def exact_duplicates(df: DataFrame, col: str = "text", key: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, keep_id) with
    n_docs >= 2; keep_id = min key (the survivor)."""
    return (
        df.select(F.md5(F.col(col)).alias("text_hash"), F.col(key))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(key).alias("keep_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def word_shingles(df: DataFrame, col: str = "text", key: str = "doc_id", n: int = 2) -> DataFrame:
    """Distinct word n-gram shingles per document: (key, shingle)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    # no global .distinct(): array_distinct already dedups within the doc
    # and the key makes rows unique across docs — the extra distinct was a
    # full exchange of the exploded shingle stream for an identical row set
    # (removed r6; one Exchange gone from every shingle consumer's plan)
    return (
        df.select(F.col(key), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def jaccard_pairs(
    shingles: DataFrame,
    key: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over the inverted shingle index:
    (a, b, jaccard) for pairs with similarity >= threshold, a < b.

    ``max_df`` drops shingles occurring in more than that many documents
    before the self-join — the stop-shingle skew guard (a shingle in d docs
    contributes d^2 candidate pairs)."""
    sh = shingles
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle"
        )
    sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(key).alias("a"), "shingle")
    b = sh.select(F.col(key).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(key).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(key).alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(
    shingles: DataFrame, key: str = "doc_id", num_hashes: int = 64
) -> DataFrame:
    """(key, sig array<bigint>): column-parallel MinHash — one aggregation,
    num_hashes min() columns.

    The variable-length shingle string is hashed ONCE; the per-function
    hashes re-hash that single 8-byte value with a seed (still a proper
    64-bit hash family, but the string is scanned once instead of
    num_hashes times — the round-1 sweep re-evaluated xxhash64 over the
    string per function and dominated the minhash bench)."""
    pre = shingles.select(
        F.col(key), F.xxhash64(F.col("shingle")).alias("h")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = pre.groupBy(key).agg(*aggs)
    return wide.select(
        F.col(key), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    key: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.5,
    num_hashes: int | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows, bucket by the
    band hash, generate candidate pairs inside buckets only, then estimate
    jaccard as the fraction of matching signature positions.

    Returns (a, b, est_jaccard >= threshold). Scale path: candidates are
    produced by an equi-join on (band, band_hash) — never a cross join.
    Pass ``num_hashes`` when known: the fallback peeks at one row, which
    costs a full evaluation of the signature aggregation.

    [r6] The bucket self-join pairs BARE (key, band, bucket) rows and the
    signatures are attached to the surviving distinct pairs afterwards
    (guide §8: shuffle keys, not payloads): hot buckets blow the join
    output up quadratically — at sf1.0 the raw pair stream is ~10^8 rows
    for 5.7k distinct candidates — and carrying two 64-long signature
    arrays (~1 KB/row) through that join + dropDuplicates shuffled ~60x
    more bytes than the 16-byte id pairs do. Same candidate set, same
    est_jaccard, measured 39.4 s -> 4.2 s for the candidate stage."""
    if num_hashes is None:
        num_hashes = len(signatures.select("sig").first().sig)
    rows_per_band = num_hashes // bands
    # bucket = hash of the band's signature longs DIRECTLY (r6) — the old
    # slice->cast-to-string->concat->hash chain evaluated interpreted
    # higher-order lambdas per element (guide §4.1: prefer flat built-ins);
    # bucket equality semantics are unchanged (equal slices <=> equal
    # buckets, modulo 64-bit collisions that only add candidates which the
    # est/exact verification filters away)
    banded = signatures.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + 1 + i)
                                for i in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(key), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # materialized once: it feeds BOTH sides of the bucket self-join, which
    # would otherwise re-run the whole signature aggregation + banding per
    # side (measured: ~4 s/side at sf1.0 for a 38 MB table)
    banded = banded.localCheckpoint()
    left = banded.select(F.col(key).alias("a"), "band", "bucket")
    right = banded.select(F.col(key).alias("b"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    sig_a = signatures.select(F.col(key).alias("a"), F.col("sig").alias("siga"))
    sig_b = signatures.select(F.col(key).alias("b"), F.col("sig").alias("sigb"))
    cands = pairs.join(sig_a, "a").join(sig_b, "b")
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("siga", "sigb", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(float(num_hashes)),
        6,
    )
    return cands.select("a", "b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


def minhash_verified_pairs(
    shingles: DataFrame,
    key: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    reuse: str = "cache",
) -> DataFrame:
    """MinHash+LSH blocking with EXACT Jaccard verification: (a, b, jaccard
    >= threshold), a < b. The LSH banding only generates candidates; every
    candidate is re-scored against the true shingle sets, so the output is
    engine-independent (a SQL oracle computing all-pairs exact Jaccard
    matches it whenever banding recall is 1.0 on the data — at threshold
    0.5 with 32 bands x 2 rows the per-pair miss probability is
    (1 - J^2)^32 <= 1e-4). This is the scale shape: candidates come from an
    equi-join on (band, bucket), the verify join touches candidate pairs
    only, never all pairs."""
    # shingles feeds four branches (signatures, verify join x2, sizes).
    # reuse="cache" persists the explode once while KEEPING the logical
    # plan, so AQE still sees real size stats and the verify join keeps its
    # broadcast (measured 2x at sf0.1; a localCheckpoint loses the stats
    # and the broadcast — that variant measured slower than recompute).
    # reuse="recompute" is the extreme-scale escape hatch: when the
    # exploded shingle set is a multiple of a 100 TB input, re-deriving it
    # from the columnar scan can beat spilling the cache to executor disks.
    if reuse == "cache":
        shingles = shingles.cache()
    # the signature table is tiny (one row per doc) but feeds FOUR plan
    # branches (banding left/right + the est attach joins); materialize it
    # once instead of re-running the 64-way min aggregation per branch (r6)
    sig = minhash_signatures(
        shingles, key=key, num_hashes=num_hashes
    ).localCheckpoint()
    # banding recall is tuned for >= threshold, but it also admits ~8% of
    # random low-similarity pairs (2-row bands match with prob J^2 PER band);
    # pre-filtering candidates on the signature estimate at threshold/2 —
    # 4 sigma below the verify threshold for 64 hashes — prunes that noise
    # before the (much costlier) exact shingle-set verification join.
    cands = minhash_lsh_pairs(
        sig, key=key, bands=bands, threshold=threshold / 2,
        num_hashes=num_hashes,
    ).select("a", "b")
    sizes = shingles.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = cands.join(shingles.select(F.col(key).alias("a"), "shingle"), "a")
    inter = (
        a_sh.join(
            shingles.select(F.col(key).alias("b"), "shingle"), ["b", "shingle"]
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(key).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(key).alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if reuse == "cache":
        # materialize the (small) verified-pairs result, then release the
        # cached shingle partitions — a long-lived session (bench runs every
        # query multiple passes) otherwise accumulates dead cache entries in
        # executor memory/disk across calls
        out = out.localCheckpoint()
        shingles.unpersist()
    return out


def winnow_fingerprints(
    df: DataFrame, col: str = "text", key: str = "doc_id", k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprinting
    scheme: Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every word k-gram,
    slide a window of ``w`` consecutive k-gram hashes, keep the minimum of
    each window, distinct. Guarantees: any shared token run of length
    >= k + w - 1 between two documents yields at least one SHARED
    fingerprint — the partial-overlap (shared-passage) dedup primitive the
    whole-document ops above cannot express.

    Returns (key, fp bigint), one row per distinct fingerprint. Documents
    shorter than ``k`` tokens yield no rows; documents with fewer than
    ``w`` k-grams yield exactly one fingerprint (min over all hashes —
    the standard degenerate-window rule).

    Scale shape: the entire per-document computation is one columnar
    projection (no shuffle, no Python) — only the explode output moves.
    The hash is the first 15 hex chars of md5 (a positive 60-bit value),
    chosen over xxhash64 so the DuckDB correctness oracle can recompute
    the exact fingerprint set cross-engine (same trick as portable
    simhash)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    hashes = F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(toks, i + 1, k), " ")), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    ng = F.size(hashes)
    wins = F.sequence(F.lit(0), F.greatest(ng - w, F.lit(0)))
    fps = F.array_distinct(
        F.transform(wins, lambda j: F.array_min(F.slice(hashes, j + 1, w)))
    )
    guarded = F.when(n >= k, fps).otherwise(F.array().cast("array<bigint>"))
    return df.select(F.col(key), F.explode(guarded).alias("fp"))


def winnow_overlap_pairs(
    fps: DataFrame,
    key: str = "doc_id",
    min_shared: int = 2,
    max_df: int | None = 100,
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowed fingerprints:
    (a, b, n_shared, containment) for pairs sharing >= ``min_shared``
    fingerprints, a < b; containment = n_shared / min(|fps_a|, |fps_b|)
    (the asymmetric-overlap score — near 1.0 when one document contains
    the other's passages). ``max_df`` drops boilerplate fingerprints
    occurring in more than that many documents before the self-join —
    the same stop-key skew guard as ``jaccard_pairs`` (a fingerprint in d
    docs contributes d^2 candidates); sizes are computed on the FILTERED
    set so containment stays consistent with the pairs it scores."""
    if max_df is not None:
        dfc = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        fps = fps.join(dfc.filter(F.col("df") <= max_df).select("fp"), "fp")
    sizes = fps.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a = fps.select(F.col(key).alias("a"), "fp")
    b = fps.select(F.col(key).alias("b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col(key).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(key).alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least(F.col("sza"), F.col("szb")), 6
            ).alias("containment"),
        )
    )


def cluster_assignments(
    docs: DataFrame,
    pairs: DataFrame,
    col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs -> the keep/drop decision every dedup pipeline actually
    needs: group pairs into connected components (a chain a~b, b~c is ONE
    cluster even when a and c never paired directly) and pick one canonical
    survivor per cluster — the longest document by whitespace token count,
    ties broken by smallest key (longest-survivor is the standard web-corpus
    policy: near-dup clusters usually contain truncated variants of one
    full text).

    Returns one row per clustered document: (doc_id, canonical_id,
    cluster_size, keep). Unclustered documents (no near-dup pair) are not
    emitted — they are all trivially keepers.

    Scale shape: components via the canon min-propagation + pointer-jumping
    loop (O(log n) rounds, each one equi-join + groupBy — the same machinery
    the KG merge path runs at full corpus scale, canon.py:30); the canonical
    pick is one map-side min(struct) aggregate per cluster, no window, no
    global sort."""
    from .. import canon

    comp = canon.connected_components(pairs.select("a", "b"))
    sized = comp.join(
        docs.select(
            F.col(key).alias("node"),
            F.size(tokens(col)).cast("bigint").alias("n_tokens"),
        ),
        "node",
    )
    best = sized.groupBy("comp").agg(
        F.min(F.struct((-F.col("n_tokens")).alias("neg"), F.col("node").alias("node")))[
            "node"
        ].alias("canonical_id"),
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
    )
    return sized.join(best, "comp").select(
        F.col("node").alias(key),
        "canonical_id",
        "cluster_size",
        (F.col("node") == F.col("canonical_id")).alias("keep"),
    )


def simhash(
    df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(key, simhash bigint): sign-sum of token-hash bits. Columnar: explode
    tokens, one sum per bit position, reassemble.

    ``portable=True`` derives the per-(token, bit) values from md5 instead
    of xxhash64: md5 is bit-identical across engines (Spark, DuckDB,
    Python), so the resulting simhash — and therefore the near-dup pair set
    — is recomputable by the DuckDB correctness oracle. The default stays
    xxhash64 (cheaper: one 64-bit hash vs a cryptographic digest) for
    production pipelines where cross-engine parity is not needed; blocking
    and verification are identical either way."""
    tok = df.select(F.col(key), F.explode(tokens(col)).alias("tok"))
    if portable:
        if bits > 64:
            raise ValueError("portable simhash derives at most 64 bits from md5")
        # two independent 32-bit words from the md5 hex digest cover 64
        # bit positions (conv() parses hex; 8 hex chars < 2^32 fit a long)
        md = F.md5("tok")
        tok = tok.withColumn(
            "h1", F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
        ).withColumn("h2", F.conv(F.substring(md, 9, 8), 16, 10).cast("long"))

        def _bit(i):
            src, off = ("h1", i) if i < 32 else ("h2", i - 32)
            return F.shiftright(src, off).bitwiseAND(F.lit(1)) == 1

    else:
        tok = tok.withColumn("h", F.xxhash64("tok"))

        def _bit(i):
            return F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1

    aggs = [
        F.sum(F.when(_bit(i), 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy(key).agg(*aggs)
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select(F.col(key), acc.alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, key: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs by SimHash with exact-recall blocking: split the
    64-bit hash into ``max_hamming + 1`` chunks — by pigeonhole, any pair
    within the distance budget agrees on at least one whole chunk, so the
    equi-join on (chunk, value) generates every qualifying pair; Hamming is
    then verified exactly."""
    n_chunks = max_hamming + 1
    chunk_bits = -(-64 // n_chunks)  # ceil
    mask = (1 << chunk_bits) - 1
    chunks = sims.select(
        F.col(key),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select(F.col(key), "simhash", "cc.chunk", "cc.val")
    l = chunks.select(F.col(key).alias("a"), F.col("simhash").alias("ha"), "chunk", "val")
    r = chunks.select(F.col(key).alias("b"), F.col("simhash").alias("hb"), "chunk", "val")
    cands = (
        l.join(r, ["chunk", "val"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cands.select("a", "b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
