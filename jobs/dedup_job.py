#!/usr/bin/env python
"""Corpus dedup job — the training-data analogue of rollup_job.py, in the
same deployment form (BASELINE.json north_rule: spark-submit --py-files):

    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        jobs/dedup_job.py \
        --input /path/to/documents_parquet \
        --warehouse /path/to/warehouse --run-id dedup-2026-08-18 \
        [--id-col doc_id --text-col text] \
        [--n-hashes 128 --n-bands 32 --threshold 0.8] [--no-fuzzy]

Chain (SURVEY §2.7b/c/d; every step an existing gated operator):
  1. exact edges — md5(text) groups; only (id, digest) shuffles, text
     stays in the scan.
  2. fuzzy edges — MinHash band candidates (hot-bucket-pruned), VERIFIED
     by signature-agreement fraction >= --threshold (the standard LSH
     verify: matching minhash fraction is an unbiased Jaccard estimator;
     signatures join back onto the deduplicated candidate pairs only).
  3. pairs → clusters — alternating large-star/small-star connected
     components (O(log n) rounds, id-only shuffles).
  4. verdicts — every doc labeled (cluster_id, keep); min-id survivor.

Committed tables (snapshot store, same manifest semantics as the tiers;
every row stamped with the producing run_id):
  dedup_edges     (id_a, id_b, reason, run_id)          — the evidence
  dedup_verdicts  (<id>, cluster_id, keep, run_id)      — per-doc outcome
  dedup_stats     (1 row: docs, clusters, survivors, dup_docs, run_id)

Re-running with the same warehouse OVERWRITES all three (full-range
overwrite commits — the job is idempotent per corpus snapshot).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="fischer_spark corpus dedup job")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-hashes", type=int, default=128)
    ap.add_argument("--n-bands", type=int, default=32)
    ap.add_argument(
        "--threshold", type=float, default=0.8,
        help="estimated-Jaccard verify threshold on band candidates "
        "(fraction of agreeing minhashes)",
    )
    ap.add_argument(
        "--no-fuzzy", action="store_true",
        help="exact (md5) dedup only — skip the MinHash stage",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from fischer_spark.operators.cluster import canonical_assignments
    from fischer_spark.operators.dedup import minhash_candidates, minhash_signatures
    from fischer_spark.session import get_spark
    from fischer_spark.sources.storage import ParquetManifestStore

    spark = get_spark(f"fischer_dedup_{args.run_id}")
    store = ParquetManifestStore(spark, args.warehouse)
    idc, txt = args.id_col, args.text_col

    docs = spark.read.parquet(args.input).select(idc, txt)

    # -- 1. exact edges: (doc, group-min) per md5 group; text never
    #    shuffles — only (id, 16-byte digest) rows cross the wire.
    #    NULL text is excluded BEFORE hashing (ADVICE r4): md5(NULL) is
    #    NULL and groupBy treats NULL as one group, which would collapse
    #    every content-less doc into a single bogus "exact" cluster.
    #    Content-less docs carry no dedup evidence — they are all kept.
    nn_docs = docs.where(F.col(txt).isNotNull())
    hashed = nn_docs.select(idc, F.md5(F.col(txt)).alias("_h"))
    roots = hashed.groupBy("_h").agg(F.min(idc).alias("_root"))
    exact_edges = (
        hashed.join(roots, "_h")
        .where(F.col(idc) != F.col("_root"))
        .select(
            F.col(idc).alias("id_a"), F.col("_root").alias("id_b"),
            F.lit("exact").alias("reason"),
        )
    )

    edges = exact_edges
    if not args.no_fuzzy:
        # -- 2. fuzzy edges: band candidates, then the signature-agreement
        #    verify — signatures join back once onto deduplicated pairs.
        #    Same NULL-text exclusion as the exact stage: a content-less
        #    doc has no tokens, hence no signature evidence to pair on.
        cand = minhash_candidates(
            nn_docs, id_col=idc, text_col=txt,
            n_hashes=args.n_hashes, n_bands=args.n_bands,
        ).select("id_a", "id_b")
        sig = minhash_signatures(nn_docs, idc, txt, args.n_hashes)
        sa = sig.select(F.col(idc).alias("id_a"), F.col("sig").alias("_sa"))
        sb = sig.select(F.col(idc).alias("id_b"), F.col("sig").alias("_sb"))
        agree = F.aggregate(
            F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        fuzzy_edges = (
            cand.join(sa, "id_a").join(sb, "id_b")
            .withColumn("_est", agree / F.lit(float(args.n_hashes)))
            .where(F.col("_est") >= args.threshold)
            .select("id_a", "id_b", F.lit("minhash").alias("reason"))
        )
        edges = edges.unionByName(fuzzy_edges)

    # every table carries the producing run_id; re-runs replace the
    # whole table via an overwrite_range spanning all possible run ids
    # (string bounds "" .. "\uffff" — the store's range ops compare the
    # named column, and run_id is a string in every row by construction)
    rid = F.lit(args.run_id).alias("run_id")
    full = "", "\uffff"
    s_edges = store.overwrite_range(
        "dedup_edges", edges.select("*", rid), "run_id", *full
    )

    # -- 3+4. clusters + per-doc verdicts (min-id survivor per cluster)
    verdicts = canonical_assignments(
        docs, store.read("dedup_edges"), id_col=idc,
        pair_a="id_a", pair_b="id_b",
    )
    s_verd = store.overwrite_range(
        "dedup_verdicts", verdicts.select("*", rid), "run_id", *full
    )

    v = store.read("dedup_verdicts")
    stats = v.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("cluster_id").alias("clusters"),
        F.sum("keep").cast("long").alias("survivors"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("long").alias("dup_docs"),
    )
    s_stats = store.overwrite_range(
        "dedup_stats", stats.select("*", rid), "run_id", *full
    )

    row = store.read("dedup_stats").first()
    print(
        f"run {args.run_id}: dedup_edges={s_edges} dedup_verdicts={s_verd} "
        f"dedup_stats={s_stats}"
    )
    print(
        f"  docs={row['docs']} clusters={row['clusters']} "
        f"survivors={row['survivors']} dup_docs={row['dup_docs']}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
