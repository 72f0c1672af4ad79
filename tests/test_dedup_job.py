"""End-to-end corpus dedup job (jobs/dedup_job.py): exact + MinHash
edges → connected components → min-id survivors, committed to the
snapshot store; re-runs overwrite instead of duplicating."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# ~40 shared tokens; doc 3 changes one token (Jaccard ≈ 0.95 → band
# candidate w.p. ~1 at 128/32, agreement ≥ 0.9 > the 0.8 threshold)
_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang on the wall and autumn rain falls softly "
    "across the quiet harbor where fishing boats rock gently against "
    "wooden piers under a pale morning sky"
)
_NEAR = _BASE.replace("harbor", "haven")

_DISTINCT = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
    "one two three four five six seven eight nine ten eleven twelve",
    "red orange yellow blue indigo violet crimson teal maroon ochre",
    "north south east west compass bearing azimuth meridian latitude",
    "sonata concerto symphony etude nocturne prelude fugue rhapsody",
    "granite basalt marble slate quartzite gneiss schist limestone",
]


def _run(args: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(REPO / "jobs" / "dedup_job.py"), *args],
        capture_output=True, text=True, timeout=600,
    )


def test_dedup_job_end_to_end(spark, tmp_path):
    rows = [(1, _BASE), (2, _BASE), (3, _NEAR)] + [
        (i + 4, t) for i, t in enumerate(_DISTINCT)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    wh = str(tmp_path / "wh")

    p = _run(["--input", src, "--warehouse", wh, "--run-id", "d1"])
    assert p.returncode == 0, p.stderr[-3000:]
    assert "docs=9 clusters=7 survivors=7 dup_docs=2" in p.stdout, p.stdout

    from fischer_spark.sources.storage import ParquetManifestStore

    store = ParquetManifestStore(spark, wh)
    v = {r["doc_id"]: (r["cluster_id"], r["keep"])
         for r in store.read("dedup_verdicts").collect()}
    # {1,2,3} collapse to cluster 1 (exact 1~2 + minhash 1~3/2~3); doc 1
    # is the min-id survivor; everything else is its own kept singleton
    assert v[1] == (1, 1) and v[2] == (1, 0) and v[3] == (1, 0)
    assert all(v[d] == (d, 1) for d in range(4, 10))
    # evidence table carries both reasons
    reasons = {r["reason"] for r in store.read("dedup_edges").collect()}
    assert reasons == {"exact", "minhash"}

    # re-run with a new run id: overwrite, not append — counts unchanged
    p2 = _run(["--input", src, "--warehouse", wh, "--run-id", "d2"])
    assert p2.returncode == 0, p2.stderr[-3000:]
    assert store.read("dedup_verdicts").count() == 9
    assert store.read("dedup_stats").count() == 1
    assert store.read("dedup_stats").first()["run_id"] == "d2"


def test_dedup_job_exact_only(spark, tmp_path):
    """--no-fuzzy: the near-dup doc 3 survives as its own cluster."""
    rows = [(1, _BASE), (2, _BASE), (3, _NEAR), (4, _DISTINCT[0])]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    wh = str(tmp_path / "wh")
    p = _run(["--input", src, "--warehouse", wh, "--run-id", "x", "--no-fuzzy"])
    assert p.returncode == 0, p.stderr[-3000:]
    assert "docs=4 clusters=3 survivors=3 dup_docs=1" in p.stdout, p.stdout


def test_dedup_job_null_text_docs_are_never_deduped(spark, tmp_path):
    """NULL-text docs must NOT collapse into one "exact" cluster
    (ADVICE r4: md5(NULL) is NULL and groupBy keeps NULL as one group).
    Each content-less doc stays its own kept singleton; real dups still
    dedupe."""
    rows = [(1, _BASE), (2, _BASE), (3, None), (4, None), (5, None)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    wh = str(tmp_path / "wh")
    p = _run(["--input", src, "--warehouse", wh, "--run-id", "n1"])
    assert p.returncode == 0, p.stderr[-3000:]
    assert "docs=5 clusters=4 survivors=4 dup_docs=1" in p.stdout, p.stdout

    from fischer_spark.sources.storage import ParquetManifestStore

    store = ParquetManifestStore(spark, wh)
    v = {r["doc_id"]: (r["cluster_id"], r["keep"])
         for r in store.read("dedup_verdicts").collect()}
    assert v[1] == (1, 1) and v[2] == (1, 0)
    assert all(v[d] == (d, 1) for d in (3, 4, 5))
