"""Dedup + similarity operators: planted duplicates must be found,
LSH candidates must superset true near-dups at high similarity, and
plans must stay broadcast/bucketed (no cartesian joins)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xml_to_es_spark.operators import dedup, similarity
from xml_to_es_spark.plans import assert_no_cartesian


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "completely different text about spark shuffle partitions and joins",
        "a third document mentioning inverted index construction with postings",
    ]
    rows = []
    # 0,1: exact dups; 2,3: near dups (one word changed); others unique
    rows.append((0, base[0]))
    rows.append((1, base[0]))
    rows.append((2, base[1]))
    rows.append((3, base[1].replace("joins", "aggregations")))
    rows.append((4, base[2]))
    for i in range(5, 30):
        rows.append((i, f"unique document number {i} with its own words w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_finds_planted(spark, docs):
    groups = dedup.exact_dedup(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    surv = dedup.exact_dedup_survivors(docs)
    assert surv.count() == docs.count() - 1
    assert surv.filter(F.col("doc_id") == 1).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, n_perm=16, band_size=4)
    assert_no_cartesian(pairs)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dups always collide
    assert (2, 3) in got  # near dups collide w.h.p. at 16 perms
    # verify with exact jaccard and filter
    verified = dedup.ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.5)
    v = {(r["a_id"], r["b_id"]): r["jaccard"] for r in verified.collect()}
    assert v[(0, 1)] == 1.0
    assert (2, 3) in v and 0.5 <= v[(2, 3)] < 1.0


def test_simhash_hamming(spark, docs):
    fps = dedup.simhash(docs)
    rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ham = lambda a, b: bin(rows[a] ^ rows[b]).count("1")
    assert ham(0, 1) == 0  # identical text → identical fingerprint
    assert ham(2, 3) <= 12  # near dup → close
    assert ham(0, 2) > 12  # different docs → far
    near = dedup.simhash_near_pairs(fps, max_hamming=3).collect()
    got = {(r["a_id"], r["b_id"]) for r in near}
    assert (0, 1) in got


def test_near_dedup_pipeline_end_to_end(spark, docs):
    """candidates → Jaccard verify → cluster → keep-one: the planted
    exact pair (0,1) and near pair (2,3) each lose their higher id;
    everything else survives."""
    surv = dedup.near_dedup_pipeline(docs, min_jaccard=0.5)
    ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    assert 0 in ids and 1 not in ids
    assert 2 in ids and 3 not in ids
    assert surv.count() == docs.count() - 2


def test_dup_clusters_and_survivors(spark, docs):
    """Connected components over a planted pair graph: chains merge
    transitively into one cluster with the min id as representative;
    survivors keep exactly one doc per cluster."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": [0, 1, 3, 7], "b_id": [1, 2, 4, 8]})
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dup_clusters(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 7: 7, 8: 7}
    surv = dedup.near_dedup_survivors(docs, pairs)
    ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    # losers 1,2,4,8 dropped; representatives 0,3,7 and all unpaired kept
    assert {1, 2, 4, 8}.isdisjoint(ids)
    assert {0, 3, 7} <= ids
    assert surv.count() == docs.count() - 4


def _simhash_py(text: str) -> int:
    """Pinned SimHash semantics, independently re-derived: tf-weighted
    md5 bit votes over bits 0..62 (the operator's contract)."""
    import hashlib
    from collections import Counter

    from xml_to_es_spark.pyref import tokenize

    votes = [0] * 63
    for tok, tf in Counter(tokenize(text or "")).items():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for p in range(63):
            votes[p] += tf if (h >> p) & 1 else -tf
    return sum(1 << p for p in range(63) if votes[p] > 0)


def test_simhash_matches_pinned_python_semantics(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        assert got[i] == _simhash_py(t), f"doc {i}"
    # empty doc fingerprints to 0
    empty = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": [""]})
    )
    assert dedup.simhash(empty).first()["simhash"] == 0


def test_embedding_near_dups_and_ann(spark):
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(40, 16))
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16)  # planted near-dup
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in vecs]}
    )
    emb = spark.createDataFrame(pdf)
    # default = banded-LSH scale path: candidate join is bucketed,
    # never a cartesian/nested-loop product
    bucketed = dedup.embedding_near_dups(emb, threshold=0.95)
    assert_no_cartesian(bucketed)
    assert {(r["a_id"], r["b_id"]) for r in bucketed.collect()} == {(0, 1)}
    # guarded test-scale exact mode agrees (recall 1.0 on the planted pair)
    exact_pairs = dedup.embedding_near_dups(emb, threshold=0.95, exact=True).collect()
    assert {(r["a_id"], r["b_id"]) for r in exact_pairs} == {(0, 1)}

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    exact = similarity.cosine_topk(emb, q, k=5).collect()
    assert [r["vec_id"] for r in exact][:2] == [0, 1]  # self then near-dup

    planes = similarity.projection_matrix(dim=16, n_planes=6)
    approx = similarity.ann_topk_lsh(emb, q, planes, k=5).collect()
    got = [r["vec_id"] for r in approx]
    assert got[0] == 0 and 1 in got  # near-dup lands in same/adjacent bucket


def test_ivf_ann_recall(spark):
    rng = np.random.RandomState(9)
    # clustered corpus so IVF cells are meaningful
    centers = rng.normal(size=(4, 12)) * 5
    vecs = np.vstack([c + rng.normal(size=(50, 12)) for c in centers])
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    C = similarity.kmeans_centroids(emb, k=4, iters=4)
    assert C.shape == (4, 12)
    # assignment is deterministic
    a1 = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(emb, C).collect()}
    a2 = {r["vec_id"]: r["cell"] for r in similarity.ivf_assign(emb, C).collect()}
    assert a1 == a2 and len(set(a1.values())) == 4
    q = emb.filter(F.col("vec_id").isin([0, 60, 120])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    exact = similarity.cosine_topk(emb, q, k=5).toPandas()
    approx = similarity.ann_topk_ivf(emb, q, C, k=5, nprobe=2).toPandas()
    # recall@5 vs exact with nprobe=2 on a 4-cell clustered corpus
    hits = 0
    for qid in (0, 60, 120):
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
    assert hits >= 12  # ≥0.8 recall


def test_ivf_indexed_storage_partition_pruned(spark, tmp_path):
    """build_ivf_index + ann_topk_ivf_indexed: results identical to
    the inline IVF path, and the scan is pruned to the probed cell
    DIRECTORIES (partition filter in the plan)."""
    from xml_to_es_spark.plans import explain_str

    rng = np.random.RandomState(21)
    pdf = pd.DataFrame(
        {"vec_id": range(120), "embedding": [rng.normal(size=12).tolist() for _ in range(120)]}
    )
    emb = spark.createDataFrame(pdf)
    C = similarity.fixed_centroids(dim=12, k=6, seed=3)
    path = str(tmp_path / "ivf_idx")
    similarity.build_ivf_index(emb, C, path)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    inline = similarity.ann_topk_ivf(emb, q, C, k=5, nprobe=2).toPandas()
    indexed_df = similarity.ann_topk_ivf_indexed(spark, path, q, C, k=5, nprobe=2)
    plan = explain_str(indexed_df)
    assert "PartitionFilters" in plan and "cell" in plan
    # unprobed cells never read: the partition filter lists ≤ q×nprobe cells
    indexed = indexed_df.toPandas()
    a = inline.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = indexed.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["query_id", "rank", "vec_id"]], b[["query_id", "rank", "vec_id"]]
    )
    np.testing.assert_allclose(a["cosine"], b["cosine"], atol=1e-6)


def test_lsh_buckets_deterministic(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame(
        {"vec_id": range(20), "embedding": [rng.normal(size=8).tolist() for _ in range(20)]}
    )
    emb = spark.createDataFrame(pdf)
    planes = similarity.projection_matrix(dim=8, n_planes=4)
    a = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(emb, planes).collect()}
    b = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(emb, planes).collect()}
    assert a == b
    # oracle: numpy
    M = np.stack(pdf["embedding"])
    expect = ((M @ planes.T) > 0) @ (1 << np.arange(4))
    assert [a[i] for i in range(20)] == expect.tolist()


def test_minhash_signatures_match_multiset_twin(spark, docs):
    """The r7 distinct-shingle signature pass must be bit-identical
    to the multiset (non-distinct) exploded form it replaced —
    MinHash of a multiset equals MinHash of its distinct set."""
    n_perm, k = 8, 3
    sig = dedup.minhash_signatures(docs, n_perm=n_perm, shingle_k=k)
    got = sig.toPandas().sort_values("doc_id").reset_index(drop=True)
    sh = dedup._exploded_shingles(docs, "text", "doc_id", k)
    want = (
        sh.groupBy("doc_id")
        .agg(*[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
            for i in range(n_perm)
        ])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
