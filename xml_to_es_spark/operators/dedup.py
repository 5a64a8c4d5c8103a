"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM built-ins (md5 / explode / groupBy — whole-stage
codegen'd); the constructions are chosen to be ANSI-SQL-expressible so
every operator has a DuckDB oracle twin (driver correctness gate):

- exact dedup: md5(text) hash-groupBy, keep min doc_id;
- MinHash + LSH: word-shingles → P permutations as min(md5(shingle ∥
  seed)) (string-min MinHash — md5 is identical in Spark, DuckDB and
  Python, so oracle parity is exact) → bands → bucket self-join →
  verified Jaccard;
- n-gram Jaccard: exact pairwise similarity on candidate pairs;
- SimHash: 63-bit tf-weighted bit-vote fingerprint, pure JVM
  aggregation (md5-nibble bit extraction — DuckDB oracle twin);
- embedding-cosine near-dup over `embeddings(vec_id, embedding)`:
  banded sign-LSH candidates + exact verify (all-pairs only behind
  exact=True for test scale);
- connected-component dup clustering + keep-one survivors
  (near_dedup_pipeline chains candidates→verify→cluster→keep-one).

Scale notes (10^12 docs): every self-join here is bucketed (LSH band
key or hash prefix) — never a cross join; exact dedup is one shuffle
on an md5 key (AQE handles the empty-text hot key via skew split);
MinHash signature agg is a single groupBy with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xml_to_es_spark.functions.analysis import tokens_col

DEFAULT_N_PERM = 16
DEFAULT_BAND_SIZE = 4


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → (hash, n_dups, keep_id).
    Returns one row per text with n_dups ≥ 2."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(key_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(key_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def exact_dedup_survivors(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Docs surviving exact dedup (min doc_id per distinct text)."""
    keep = (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(key_col).alias(key_col))
        .select(key_col)
    )
    return docs.join(keep, key_col, "left_semi")


def shingles_col(text_col: str, k: int = 3):
    """Word k-shingles as an array column, all JVM (expr so the same
    text appears verbatim in the DuckDB oracle)."""
    return F.expr(
        f"transform(sequence(1, greatest(size(regexp_extract_all(lower({text_col}),"
        f" '[a-z0-9]+', 0)) - {k - 1}, 0)), i -> concat_ws(' ',"
        f" slice(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0), i, {k})))"
    )


def _exploded_shingles(
    docs: DataFrame,
    text_col: str,
    key_col: str,
    k: int,
    distinct: bool = False,
) -> DataFrame:
    """(key, shingle) rows — output identical to exploding
    :func:`shingles_col`, but the tokenizer regex runs ONCE per row:
    the token array is materialized in its own projection, and the
    shingle ``transform`` lambda only re-slices it. Inlining the regex
    into the lambda (the one-expression form above, kept for the
    oracle's verbatim SQL) re-evaluates ``regexp_extract_all`` per
    ELEMENT — O(words²) regex scans per doc (guide §1.2: fix the
    per-task work; measured 7× on the shingle pass)."""
    toks = docs.select(
        F.col(key_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
        ).alias("_toks"),
    )
    sh = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.size(F.col("_toks")) - F.lit(k - 1), F.lit(0)),
        ),
        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, F.lit(k))),
    )
    if distinct:
        sh = F.array_distinct(sh)
    return toks.select(F.col(key_col), F.explode(sh).alias("shingle"))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_perm: int = DEFAULT_N_PERM,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, h0..h{n_perm-1}): string-min MinHash over md5-salted
    shingles.

    One explode + one groupBy (map-side partial min). The explode is
    over DISTINCT shingles per doc — MinHash of a multiset equals
    MinHash of its distinct set (min is idempotent over duplicates) —
    so repeated shingles never reach the md5 evaluations or the
    exchange (guide §2.3 shuffle fewer bytes). The fully per-row
    form (array_min over transform, zero shuffles) was measured
    SLOWER: higher-order functions evaluate interpreted, while the
    exploded aggregation keeps the md5/min pairs inside whole-stage
    codegen with map-side partial aggregation."""
    sh = _exploded_shingles(docs, text_col, key_col, shingle_k, distinct=True)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(n_perm)
    ]
    return sh.groupBy(key_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_perm: int = DEFAULT_N_PERM,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) that collide in ≥1 LSH
    band. The self-join is on the band bucket key — co-partitioned,
    never a cross join.

    ``materialize=True`` (default) eagerly localCheckpoints the pair
    set — right when the result feeds several downstream consumers
    (verify + cluster + survivors). One-shot callers can pass False to
    skip the materialization and let Spark's exchange reuse serve the
    self-join."""
    sig = minhash_signatures(docs, text_col, key_col, n_perm, shingle_k)
    n_bands = n_perm // band_size
    # ONE pass over the signatures: inline an array of (band, bucket)
    # structs instead of unioning n_bands re-computations of sig
    band_structs = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    all_bands = sig.select(F.col(key_col), F.inline(F.array(*band_structs)))
    # the self-join's two sides share this subplan: checkpoint the
    # EXPENSIVE part (the signature aggregation feeding the band rows)
    # once, and leave the cheap bucket join lazy — one-shot callers
    # pay one materialization instead of cache + checkpoint + release
    # (measured 3.6s -> 2.8s at sf0.1), multi-pass consumers (verify +
    # cluster + survivors) re-run only the small join per pass. At
    # cluster scale you would write the signatures to a table instead.
    if materialize:
        all_bands = all_bands.localCheckpoint(eager=True)
    a = all_bands.alias("a")
    bb = all_bands.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("a_id"), F.col(f"b.{key_col}").alias("b_id")
        )
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (a_id, b_id) pairs:
    explode distinct shingles per side, equi-join on shingle within
    pair, count intersection/union. All set math via groupBys."""
    sh = _exploded_shingles(
        docs, text_col, key_col, shingle_k, distinct=True
    ).withColumnRenamed("shingle", "sh")
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_sh"))
    a_sh = sh.withColumnRenamed(key_col, "a_id")
    b_sh = sh.withColumnRenamed(key_col, "b_id")
    # the b-side joins on (b_id, sh) — the shingle equality is a JOIN
    # key, not a post-join filter, so the intermediate holds only the
    # intersection rows instead of |A|x|B| rows per pair (guide §3:
    # avoid exploding joins)
    inter = (
        pairs.join(a_sh, "a_id")
        .join(b_sh, ["b_id", "sh"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(key_col, "a_id").withColumnRenamed("n_sh", "n_a"), "a_id")
        .join(sizes.withColumnRenamed(key_col, "b_id").withColumnRenamed("n_sh", "n_b"), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .select("a_id", "b_id", "n_inter", "jaccard")
    )
    return out


SIMHASH_BITS = 63  # bits 0..62: bit 63 would collide with the sign bit


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """63-bit SimHash fingerprints, pure JVM (whole-stage codegen'd,
    ANSI-SQL-expressible → DuckDB oracle twin):

      tf per (doc, token) → per token the md5-derived bit pattern
      (bit p of the uint64 from the first 8 md5 bytes, big-endian) →
      weight +tf/-tf per (doc, bit) → sign of the per-bit sum forms
      the fingerprint. Docs with no tokens fingerprint to 0.

    Physical shape at 10^12 docs: two hash-aggs with map-side partial
    combine — (doc, term) tf, then (doc, pos) weight sums (the 63×
    fan-out rows are three longs each and partially aggregated before
    the shuffle); near-dup pairing is the 16-bit-chunk bucketing in
    :func:`simhash_near_pairs`, never all-pairs."""
    tf = (
        docs.select(F.col(key_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(key_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # bit p of the token hash, from md5 hex: hex char 16 - p div 4
    # (1-based from the left, big-endian), then bit p mod 4 of that
    # nibble — instr against the hex alphabet avoids conv()'s
    # unsigned-string round-trip and is identical in DuckDB
    bits = tf.select(
        F.col(key_col),
        F.posexplode(
            F.expr(
                "transform(sequence(0, 62), p -> CASE WHEN ("
                "shiftright(instr('0123456789abcdef',"
                " substring(md5(term), 16 - (p div 4), 1)) - 1, pmod(p, 4)) & 1"
                ") = 1 THEN tf ELSE -tf END)"
            )
        ).alias("pos", "w"),
    )
    sums = bits.groupBy(key_col, "pos").agg(F.sum("w").alias("s"))
    fp = sums.groupBy(key_col).agg(
        F.expr(
            "sum(CASE WHEN s > 0 THEN shiftleft(cast(1 as bigint), pos)"
            " ELSE cast(0 as bigint) END)"
        ).alias("simhash")
    )
    return (
        docs.select(key_col)
        .join(fp, key_col, "left")
        .fillna({"simhash": 0})
        .select(key_col, "simhash")
    )


def simhash_near_pairs(fps: DataFrame, key_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.
    Scale path: bucket by each of four 16-bit chunks (a pair within
    distance 3 must agree exactly on ≥1 chunk — pigeonhole), join per
    chunk, verify with bit_count(xor)."""
    chunks = []
    for c in range(4):
        chunks.append(
            fps.select(
                F.col(key_col),
                F.col("simhash"),
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
        )
    all_c = chunks[0]
    for c in chunks[1:]:
        all_c = all_c.unionByName(c)
    a, b = all_c.alias("a"), all_c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("a_id"),
            F.col(f"b.{key_col}").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dup_clusters(pairs: DataFrame, max_iters: int | None = None) -> DataFrame:
    """Connected components over near-dup (a_id, b_id) pairs:
    (doc_id, cluster_id) where cluster_id = the smallest doc_id
    reachable through the pair graph — the canonical representative.

    Min-label propagation: each iteration every node takes the min
    label among itself and its neighbours (one join + one hash-agg,
    i.e. two shuffles), converging in O(graph diameter) iterations —
    near-dup clusters are shallow (diameter ≪ 10 in practice), and
    ``localCheckpoint`` cuts the lineage each round so plans stay
    flat. Driver only sees a scalar convergence count per iteration.

    Runs to CONVERGENCE by default (guaranteed finite: labels are a
    monotone decreasing fixpoint, ≤ diameter iterations). Passing
    ``max_iters`` caps the loop for latency-bounded callers; hitting
    the cap before convergence warns — partially-converged labels can
    split a long near-dup chain into several clusters."""
    import warnings

    edges = (
        pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("d"))
        .unionByName(pairs.select(F.col("b_id").alias("s"), F.col("a_id").alias("d")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    iters = 0
    while True:
        iters += 1
        neigh = (
            edges.join(labels, edges.s == labels.doc_id)
            .groupBy(F.col("d").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        if max_iters is not None and iters >= max_iters:
            warnings.warn(
                f"dup_clusters stopped at max_iters={max_iters} with {changed}"
                " labels still changing — clusters may be partially merged;"
                " rerun without max_iters for exact components",
                stacklevel=2,
            )
            break
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def near_dedup_survivors(
    docs: DataFrame, pairs: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """Keep one doc per near-dup cluster (the min-id representative)
    plus every unpaired doc — the standard keep-one policy after
    MinHash/SimHash/embedding candidate generation + verification."""
    clusters = dup_clusters(pairs)
    losers = clusters.filter(F.col(key_col) != F.col("cluster_id")).select(key_col)
    return docs.join(losers, key_col, "left_anti")


def near_dedup_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_perm: int = DEFAULT_N_PERM,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_k: int = 3,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """The full training-data near-dedup flow in one call:
    MinHash-LSH candidates → exact shingle-Jaccard verification
    (kills LSH false positives) → connected-component clustering →
    keep the min-id representative per cluster. Returns the surviving
    docs. Every stage is bucketed/equi-joined — nothing all-pairs."""
    pairs = minhash_lsh_pairs(docs, text_col, key_col, n_perm, band_size, shingle_k)
    verified = (
        ngram_jaccard(docs, pairs, text_col, key_col, shingle_k)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a_id", "b_id")
    )
    return near_dedup_survivors(docs, verified, key_col)


def _pair_cosine(v: DataFrame, pairs: DataFrame, key_col: str, vec_col: str):
    """Exact cosine for candidate (a_id, b_id) pairs: two hash joins
    on the key to gather vectors, then the JVM fold dot product."""
    a_side = v.select(
        F.col(key_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    b_side = v.select(
        F.col(key_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_vec"), F.col("b_vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(a_side, "a_id")
        .join(b_side, "b_id")
        .withColumn("cosine", F.round(dot / (F.col("a_nrm") * F.col("b_nrm")), 6))
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    planes=None,
    band_size: int = 4,
    exact: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cosine ≥
    threshold).

    Default (scale path): banded random-hyperplane LSH — candidates
    are pairs colliding in ≥1 band of ``band_size`` sign bits, joined
    on the (band, bucket) key (co-partitioned, never a cross join),
    then exact-cosine verified. With B bands of r planes a pair at
    angle θ is missed with probability (1-(1-θ/π)^r)^B — at the
    default 8×4 and cosine 0.95 that is ~2e-4. ``planes`` is the
    seeded model (similarity.projection_matrix, shape
    (n_bands*band_size, dim)); inferred-dim default planes are
    generated when omitted.

    ``exact=True`` is the guarded test-scale mode: an all-pairs
    self-join — O(n²), NEVER use beyond ~10^5 vectors.

    ``dim`` (used only when ``planes`` is omitted) skips the
    embedding-width probe job — pass it when calling in a loop."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    v = emb.select(F.col(key_col), F.col(vec_col), norm.alias("nrm"))
    if exact:
        a, b = v.alias("a"), v.alias("b")
        dot = F.aggregate(
            F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            a.join(b, F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
            .withColumn("cosine", F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
            .filter(F.col("cosine") >= threshold)
            .select(
                F.col(f"a.{key_col}").alias("a_id"),
                F.col(f"b.{key_col}").alias("b_id"),
                "cosine",
            )
        )
    from xml_to_es_spark.operators.similarity import bucket_col, projection_matrix

    if planes is None:
        if dim is None:
            dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
        planes = projection_matrix(dim, n_planes=32, seed=42)
    n_bands = len(planes) // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            bucket_col(vec_col, planes[b * band_size : (b + 1) * band_size]).alias(
                "bucket"
            ),
        )
        for b in range(n_bands)
    ]
    bands = emb.select(F.col(key_col), F.inline(F.array(*band_structs)))
    a, bb = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(F.col(f"a.{key_col}").alias("a_id"), F.col(f"b.{key_col}").alias("b_id"))
        .distinct()
    )
    return (
        _pair_cosine(v, pairs, key_col, vec_col)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
