"""On-device eval quotability guard + artifact plumbing (VERDICT r4 #4).

The physics-backend on-device evaluator must consult the committed
K*-bound artifacts (results/physics_bound_*_float32.json, produced by
scripts/physics_bound.py) and refuse action horizons the measured bound
does not cover; and the on-device evaluators must expose per-episode
returns so their runs can be persisted in the results/ JSON schema the
host protocol uses (reference evaluate.py:271-310 discipline).
"""

import importlib.util
import json
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "eval_ondevice_locomotion",
        REPO / "scripts" / "eval_ondevice_locomotion.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Args:
    def __init__(self, env, ah, allow=False):
        self.env = env
        self.action_horizon = ah
        self.allow_unquotable = allow


def _k_star(env_key):
    path = REPO / "results" / f"physics_bound_{env_key}_float32.json"
    rows = json.load(open(path))["distributions"]["heldout"]["rows"]
    return max(r["K"] for r in rows if r["quotable"])


def test_guard_passes_within_bound():
    mod = _load_script()
    mod._check_chunk_bound(_Args("HalfCheetah-v5", _k_star("HalfCheetah_v5")))


def test_guard_refuses_beyond_bound():
    mod = _load_script()
    k = _k_star("HalfCheetah_v5")
    with pytest.raises(SystemExit):
        mod._check_chunk_bound(_Args("HalfCheetah-v5", k + 1))


def test_guard_override_flag():
    mod = _load_script()
    k = _k_star("HalfCheetah_v5")
    mod._check_chunk_bound(_Args("HalfCheetah-v5", k + 1, allow=True))


def test_guard_warns_without_artifact(capsys):
    mod = _load_script()
    mod._check_chunk_bound(_Args("NoSuchEnv-v0", 1))
    assert "no measured chunk bound" in capsys.readouterr().out


def test_all_committed_bounds_parse():
    for env_key in ("HalfCheetah_v5", "Hopper_v5", "Walker2d_v5"):
        assert _k_star(env_key) >= 1


def test_rollout_metrics_expose_per_env_arrays():
    from dadiff_tpu.envs.rollout import RolloutMetrics

    assert "per_env_reward" in RolloutMetrics._fields
    assert "per_env_success" in RolloutMetrics._fields
    # optional with defaults: older 3-field construction still works
    m = RolloutMetrics(1.0, 2.0, 3.0)
    assert m.per_env_reward is None
