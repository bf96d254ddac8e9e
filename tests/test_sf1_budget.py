"""sf1 budget gate: the self-seed loophole stays closed.

VERDICT r11 task 1: the sf1 budget check is the repo's only
scale-regression gate, so it must not be self-healing. A NEW key whose
first observation is already over the 30 s default budget must alert
and must NOT seed its own budget — the alert has to stay red run after
run until a human lands a hand-set budget line in
scripts/sf1_budgets.json. These tests feed `_budget_check` synthetic
observations against a temp budgets file and pin that lifecycle.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

import sf1_smoke  # noqa: E402


def _with_budgets(monkeypatch, tmp_path, initial=None):
    path = tmp_path / "sf1_budgets.json"
    if initial is not None:
        path.write_text(json.dumps(initial))
    monkeypatch.setattr(sf1_smoke, "_BUDGETS_PATH", str(path))
    return path


def _read(path):
    return json.loads(path.read_text()) if path.exists() else {}


def test_over_default_first_observation_alerts_and_is_not_seeded(
    monkeypatch, tmp_path, capsys
):
    path = _with_budgets(monkeypatch, tmp_path)
    t = sf1_smoke._DEFAULT_BUDGET_SEC + 15.0
    over = sf1_smoke._budget_check({"new_heavy_key": t})
    assert over == {"new_heavy_key": [t, sf1_smoke._DEFAULT_BUDGET_SEC]}
    assert "new_heavy_key" not in _read(path), (
        "over-default first observation must not self-seed a budget"
    )
    assert "OVER BUDGET new_heavy_key" in capsys.readouterr().err


def test_gate_stays_red_across_runs_until_hand_set_budget_lands(
    monkeypatch, tmp_path
):
    path = _with_budgets(monkeypatch, tmp_path)
    t = 45.0
    # run 1 and run 2: identical over-default observations keep alerting
    # (no self-clearing via a 1.2x auto-baseline)
    for _ in range(2):
        over = sf1_smoke._budget_check({"new_heavy_key": t})
        assert "new_heavy_key" in over
        assert "new_heavy_key" not in _read(path)
    # a human lands a deliberate budget line -> gate clears for
    # observations inside the drift ratio of THAT budget
    budgets = _read(path)
    budgets["new_heavy_key"] = 40.0
    path.write_text(json.dumps(budgets))
    assert sf1_smoke._budget_check({"new_heavy_key": t}) == {}
    # ... but a regression against the hand-set budget still alerts
    bad = 40.0 * sf1_smoke._DRIFT_RATIO + 1.0
    assert "new_heavy_key" in sf1_smoke._budget_check({"new_heavy_key": bad})


def test_under_default_first_observation_seeds_floored_budget(
    monkeypatch, tmp_path
):
    path = _with_budgets(monkeypatch, tmp_path)
    assert sf1_smoke._budget_check({"fast_key": 10.0, "tiny_key": 0.5}) == {}
    budgets = _read(path)
    assert budgets["fast_key"] == 12.0  # 1.2x observed
    assert budgets["tiny_key"] == 5.0  # floor
    # boundary: exactly AT the default still seeds (<= semantics)
    sf1_smoke._budget_check({"edge_key": sf1_smoke._DEFAULT_BUDGET_SEC})
    assert _read(path)["edge_key"] == round(
        1.2 * sf1_smoke._DEFAULT_BUDGET_SEC, 1
    )


def test_detect_only_probe_never_seeds_or_prints(
    monkeypatch, tmp_path, capsys
):
    path = _with_budgets(monkeypatch, tmp_path)
    over = sf1_smoke._budget_check(
        {"new_heavy_key": 60.0, "fast_key": 1.0}, finalize=False
    )
    assert "new_heavy_key" in over
    assert not path.exists(), "pre-retry probe must not write budgets"
    assert capsys.readouterr().err == ""


def test_existing_budgets_never_reseeded(monkeypatch, tmp_path):
    """A hand-maintained budget only changes by hand: a fast observation
    of an already-budgeted key must not tighten (or loosen) the line."""
    path = _with_budgets(monkeypatch, tmp_path, initial={"k": 20.0})
    assert sf1_smoke._budget_check({"k": 2.0}) == {}
    assert _read(path) == {"k": 20.0}
