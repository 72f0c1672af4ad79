"""Driver-window ordering (fischer_spark/queries.py): the external
driver checks only the FIRST 50 registry entries per round, so
get_queries() must serve least-recently-driver-witnessed queries first,
derived from the committed CORRECTNESS_r*.json artifacts."""

from __future__ import annotations

import json


def test_least_recently_witnessed_first():
    from fischer_spark.queries import _witness_rounds, get_oracles, get_queries

    q = list(get_queries())
    last = _witness_rounds()
    ranks = [last.get(n, -1) for n in q]
    # the serve order is non-decreasing in last-witnessed round: nothing
    # already-witnessed ever precedes a never-witnessed query
    assert ranks == sorted(ranks), ranks
    # every never-witnessed query sits inside the driver's 50-entry window
    never = [n for n in q if n not in last]
    late = [n for n in never if q.index(n) >= 50]
    assert not late, f"never-witnessed outside the driver window: {late}"
    # oracles iterate in the same order as queries
    assert list(get_oracles()) == [n for n in q if n in get_oracles()]


def test_failed_rows_do_not_count_as_witnessed(tmp_path, monkeypatch):
    """A CORRECTNESS row recording a failure must keep its query at the
    front (re-verified next round), and artifacts are read resiliently."""
    import fischer_spark.queries as Q

    art = {
        "good": {"rows_match": True, "schema_match": True, "hash_match": True,
                 "err": None},
        "rows_only": {"rows_match": True, "schema_match": True,
                      "hash_match": None, "err": "no_oracle"},
        "hash_fail": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "errored": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "AnalysisException: boom"},
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(art))
    (tmp_path / "CORRECTNESS_rBAD.json").write_text("{not json")

    monkeypatch.setattr(
        "glob.glob", lambda pat: [str(tmp_path / "CORRECTNESS_r07.json"),
                                  str(tmp_path / "CORRECTNESS_rBAD.json")]
    )
    last = Q._witness_rounds()
    assert last == {"good": 7, "rows_only": 7}
