"""Driver-window ordering contract (__spark_entry__._ordered_registry).

The driver checks only the FIRST 50 keys of ``queries()`` per round, so
the dict order IS the coverage scheduler. Four tiers:

  0. red rows (failed / vacuous 0=0) — re-verify first, insertion order,
     snapshot membership ignored (a post-snapshot red key must not be
     deprioritized behind never-checked snapshot keys);
  1. never-checked SURVEY §2 contract keys — snapshot keys first;
  2. never-checked extras — snapshot keys first;
  3. green in a prior round — tail, snapshot membership ignored, ordered
     by latest-green round ASCENDING (oldest evidence re-verifies first —
     the r8 staleness rotation, see tests/test_entry_rotation.py).

These tests monkeypatch the history/snapshot inputs so the ordering is
asserted as pure logic, independent of the real CORRECTNESS_r*.json files
on disk.
"""

from __future__ import annotations

import __spark_entry__ as e

# real registry keys, chosen so same-module insertion order is known:
# relational registers project_rename -> filter_pred -> filter_null_semantics
S2_A, S2_B, S2_C = "project_rename", "filter_pred", "filter_null_semantics"
# extras from one late module (similarity registers knn_cosine_topk first)
EXTRA_A, EXTRA_B = "knn_gemm_topk", "knn_ann_lsh"


def _order(monkeypatch, green, failed, snapshot):
    monkeypatch.setattr(e, "_correctness_history", lambda: (green, failed))
    monkeypatch.setattr(e, "_registry_snapshot", lambda: snapshot)
    # isolate from the repo's live staleness file: mid-round it
    # legitimately demotes rewritten keys to tier 0, which would let a
    # key the test picked as "green filler" jump the ordering under test
    # (r10: knn_gemm_topk was rewritten and broke the snapshot test)
    monkeypatch.setattr(e, "_green_hashes", lambda: {})
    return list(e._ordered_registry())


def test_failed_keys_lead_regardless_of_snapshot(monkeypatch):
    """Tier 0 outranks everything, and within it snapshot membership is
    ignored (insertion order): a post-snapshot red key re-verifies ahead
    of never-checked snapshot keys."""
    keys = _order(
        monkeypatch,
        green=set(),
        failed={EXTRA_B},  # post-snapshot (not in snapshot set) and red
        snapshot={S2_A, S2_B, S2_C, EXTRA_A},
    )
    assert keys[0] == EXTRA_B  # red first, despite being non-snapshot extra
    assert keys.index(EXTRA_B) < keys.index(S2_A)


def test_snapshot_priority_within_never_checked_s2(monkeypatch):
    """Tier 1: snapshot keys outrank later-registered keys even when the
    non-snapshot key was inserted earlier in the same module."""
    keys = _order(
        monkeypatch,
        green=set(),
        failed=set(),
        snapshot={S2_B},  # only filter_pred is 'old'
    )
    # snapshot S2 key precedes both non-snapshot S2 module-mates, even the
    # one registered before it
    assert keys.index(S2_B) < keys.index(S2_A) < keys.index(S2_C)


def test_contract_keys_precede_extras(monkeypatch):
    """Tier 1 (never-checked §2) before tier 2 (never-checked extras),
    even when the extra is a snapshot key and the §2 key is not."""
    keys = _order(
        monkeypatch,
        green=set(),
        failed=set(),
        snapshot={EXTRA_A},
    )
    assert keys.index(S2_C) < keys.index(EXTRA_A)


def test_green_keys_sink_and_ignore_snapshot(monkeypatch):
    """Tier 3 is the tail and snapshot membership is inert there: a green
    snapshot key does NOT outrank a green non-snapshot key with earlier
    (module, insertion) rank."""
    keys = _order(
        monkeypatch,
        green={S2_A: 1, EXTRA_A: 1},  # same round: age ties, rank decides
        failed=set(),
        snapshot={EXTRA_A},
    )
    # both green keys sink below every never-checked key
    last_unchecked = max(
        keys.index(k) for k in keys if k not in {S2_A, EXTRA_A}
    )
    assert keys.index(S2_A) > last_unchecked
    assert keys.index(EXTRA_A) > last_unchecked
    # within the green tail, ordering is (module, insertion) — the
    # relational key precedes the similarity key although only the
    # latter is in the snapshot
    assert keys.index(S2_A) < keys.index(EXTRA_A)


def test_vacuous_and_failed_rows_requeue(monkeypatch, tmp_path):
    """_correctness_history itself: a 0=0 pass and an errored row both
    land in `failed` (re-verify), a real pass lands in `green`."""
    import json

    rows = {
        "real_pass": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
            "spark_rows": 5,
            "oracle_rows": 5,
        },
        "vacuous_pass": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
            "spark_rows": 0,
            "oracle_rows": 0,
        },
        "hard_fail": {
            "rows_match": False,
            "schema_match": True,
            "hash_match": False,
            "err": None,
            "spark_rows": 3,
            "oracle_rows": 4,
        },
        "errored": {"err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(e, "_ROOT", str(tmp_path))
    green, failed = e._correctness_history()
    assert green == {"real_pass": 1}  # value = latest green round
    assert failed == {"vacuous_pass", "hard_fail", "errored"}
