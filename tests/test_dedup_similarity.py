"""Production dedup/similarity operators: simhash64 properties, Hamming
band candidates, LSH-ANN recall vs brute force, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_simhash64_near_duplicates_close(spark):
    from fischer_spark.operators.dedup import simhash64

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (3, "completely different text about spark rollup engines and gorilla codecs"),
    ]
    df = simhash64(spark.createDataFrame(rows, "doc_id long, text string"))
    sh = {r.doc_id: r.simhash for r in df.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])
    assert ham(sh[1], sh[2]) <= 12


def test_simhash64_deterministic(spark):
    from fischer_spark.operators.dedup import simhash64

    d = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    a = {r.doc_id: r.simhash for r in simhash64(d).collect()}
    b = {r.doc_id: r.simhash for r in simhash64(d.repartition(7)).collect()}
    assert a == b


def test_simhash_candidates_bucketed(spark):
    from fischer_spark.operators.dedup import simhash64, simhash_candidates

    d = simhash64(spark.read.parquet(f"{SF}/documents.parquet"))
    pairs = simhash_candidates(d)
    got = pairs.filter(F.col("hamming") <= 3)
    # pigeonhole guarantee: every true Hamming<=3 pair appears
    import itertools

    sh = {r.doc_id: r.simhash for r in d.select("doc_id", "simhash").collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 3:
            want.add((a, b))
    have = {(r.id_a, r.id_b) for r in got.collect()}
    assert want <= have


def test_ann_recall_vs_bruteforce(spark):
    from fischer_spark.operators.dedup import ann_topk_lsh
    from fischer_spark.queries_webtext import cosine_topk_embeddings

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    # These synthetic embeddings are near-random: true top-10 neighbors sit
    # at θ≈75°, where hyperplane-LSH per-table collision is (1−θ/π)^planes.
    # 4 planes × 16 tables ⇒ expected recall ≈ 1−(1−0.583⁴)^16 ≈ 0.86.
    ann = ann_topk_lsh(emb, probes, k=10, n_planes=4, n_tables=16)
    brute = cosine_topk_embeddings(spark, SF)
    got = {(r.probe_id, r.vec_id) for r in ann.collect()}
    want = {(r.probe_id, r.vec_id) for r in brute.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.6, recall
    # and fewer planes/tables trade recall down, monotonically-ish
    ann_lo = ann_topk_lsh(emb, probes, k=10, n_planes=6, n_tables=2)
    got_lo = {(r.probe_id, r.vec_id) for r in ann_lo.collect()}
    assert len(got_lo & want) <= len(got & want)


def test_multimodal_features(spark):
    from fischer_spark.operators.multimodal import (
        HAVE_PIL,
        decode_image,
        extract_media_features,
        synth_media,
    )

    media = synth_media(spark, 200)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(0.0 <= r.mean_luma <= 1.0 for r in rows)
    assert all(r.frames_sampled >= 1 for r in rows)
    vids = [r for r in rows if r.kind == "video"]
    assert any(r.frames_sampled > 1 for r in vids)
    # decode stub is gated, not silently fake
    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")
    # determinism across partitioning
    again = {r.media_id: r.sha for r in extract_media_features(media.repartition(11)).collect()}
    first = {r.media_id: r.sha for r in rows}
    assert first == again


def test_embedding_near_dup_pairs_lsh_recall(spark):
    """LSH-bucket-blocked near-dup pairs find planted high-cosine pairs
    (recall per the OR-construction bound) and never emit a pair below
    threshold; candidate surface is far from all-pairs."""
    import numpy as np

    from fischer_spark.operators.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    dim = 32
    base = rng.standard_normal((50, dim))
    rows = [(i, base[i].astype(float).tolist()) for i in range(50)]
    # planted near-dups: tiny perturbations of the first 10 vectors
    planted = set()
    for i in range(10):
        v = base[i] + 0.05 * rng.standard_normal(dim)
        rows.append((100 + i, v.astype(float).tolist()))
        planted.add((i, 100 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = embedding_near_dup_pairs(
        df, threshold=0.9, n_planes=4, n_tables=8, seed=5
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert all(r.cos_sim >= 0.9 for r in got)
    # exact truth by brute force
    vecs = {i: np.array(v) for i, v in rows}
    truth = set()
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            va, vb = vecs[a], vecs[b]
            if va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.9:
                truth.add((a, b))
    assert planted <= truth
    recall = len(pairs & truth) / len(truth)
    # OR-construction bound at cos≈0.995 (the planted pairs): ≈1-1e-5
    assert recall >= 0.9, (recall, sorted(truth - pairs))
    assert not (pairs - truth)  # exact verify step: no false positives
