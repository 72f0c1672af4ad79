"""Driver-window ordering (fischer_spark/queries.py): the external
driver checks only the FIRST 50 registry entries per round, so
get_queries() serves least-recently-driver-witnessed queries first,
derived from the committed CORRECTNESS_r*.json artifacts — with the
last _RESAMPLE_SLOTS window positions reserved for a rotating sample
of the recently-witnessed tail (ADVICE r4: bounds how long a
regression in a recently-green query can escape the driver)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(autouse=True)
def _fresh_witness_cache():
    import fischer_spark.queries as Q

    Q._WITNESS_CACHE = None
    yield
    Q._WITNESS_CACHE = None


def test_least_recently_witnessed_first_with_resample_slice():
    from fischer_spark.queries import (
        _DRIVER_WINDOW,
        _RESAMPLE_SLOTS,
        _witness_rounds,
        get_oracles,
        get_queries,
    )

    q = list(get_queries())
    last = _witness_rounds()
    head_n = _DRIVER_WINDOW - _RESAMPLE_SLOTS
    ranks = [last.get(n, -1) for n in q]
    # the head of the window is non-decreasing in last-witnessed round:
    # nothing already-witnessed precedes a never-witnessed query there
    assert ranks[:head_n] == sorted(ranks[:head_n]), ranks[:head_n]
    # every head entry was witnessed no later than any entry after it
    if len(q) > head_n:
        assert max(ranks[:head_n]) <= min(ranks[head_n:])
    # every never-witnessed query sits inside the head (and so inside
    # the driver's window)
    never = [n for n in q if n not in last]
    late = [n for n in never if q.index(n) >= head_n]
    assert not late, f"never-witnessed outside the window head: {late}"
    # oracles iterate in the same order as queries
    assert list(get_oracles()) == [n for n in q if n in get_oracles()]


def test_resample_slice_rotates_by_round(tmp_path, monkeypatch):
    """The reserved window slice covers a different part of the
    recently-witnessed tail each round, so every query is re-witnessed
    within ~len(tail)/_RESAMPLE_SLOTS rounds."""
    import fischer_spark.queries as Q

    names = [f"q{i:03d}" for i in range(60)]
    d = {n: n for n in names}

    def fake_rounds(rnd):
        # all witnessed in round `rnd` → base order is registration
        # order and the whole tail is eligible for resampling
        return {n: rnd for n in names}

    windows = []
    for rnd in (7, 8, 9):
        monkeypatch.setattr(Q, "_witness_rounds", lambda r=rnd: fake_rounds(r))
        order = Q._serve_order(names)
        assert sorted(order) == sorted(names)  # a permutation, no loss
        head_n = Q._DRIVER_WINDOW - Q._RESAMPLE_SLOTS
        windows.append(tuple(order[head_n:Q._DRIVER_WINDOW]))
    # consecutive rounds pick different slices of the tail
    assert windows[0] != windows[1] and windows[1] != windows[2]
    # the three rounds together re-witness min(3*k, tail) distinct tail
    # queries — here the whole 18-query tail is covered in 3 rounds
    tail_len = len(names) - (Q._DRIVER_WINDOW - Q._RESAMPLE_SLOTS)
    seen = set().union(*map(set, windows))
    assert len(seen) == min(3 * Q._RESAMPLE_SLOTS, tail_len) == 18


def test_small_registry_skips_resampling(monkeypatch):
    """At or under the driver window, plain least-recently-witnessed
    order is served unchanged."""
    import fischer_spark.queries as Q

    names = [f"s{i}" for i in range(20)]
    monkeypatch.setattr(
        Q, "_witness_rounds", lambda: {n: 3 for n in names[:10]}
    )
    order = Q._serve_order(names)
    assert order[:10] == names[10:]  # never-witnessed first
    assert order[10:] == names[:10]


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
    # and the scan is cached per process: a second call does no file I/O
    monkeypatch.setattr(
        Q, "_scan_witness_artifacts",
        lambda: (_ for _ in ()).throw(AssertionError("rescanned")),
    )
    assert Q._witness_rounds() is last
