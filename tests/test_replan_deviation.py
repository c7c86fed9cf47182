"""Deviation-triggered replanning (GuidedPolicy.replan_deviation): replan
early when the executed observation drifts off the plan — standard MPC
practice, no reference counterpart."""

import numpy as np
import jax
import pytest

from dadiff_tpu.guides.policies import MPCPolicy
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.models.temporal_unet import TemporalUnet


class _IdentityNormalizer:
    obs_mean = np.zeros(6, np.float32)
    obs_std = np.ones(6, np.float32)
    action_mean = np.zeros(2, np.float32)
    action_std = np.ones(2, np.float32)

    def normalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_observations(self, x):
        return np.asarray(x, np.float32)

    def unnormalize_actions(self, x):
        return np.asarray(x, np.float32)


@pytest.fixture(scope="module")
def policy_parts():
    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=16, observation_dim=6, action_dim=2, n_timesteps=10
    )
    return d, d.init_params(jax.random.PRNGKey(0))


def _counting_policy(policy_parts, **kwargs):
    d, params = policy_parts
    policy = MPCPolicy(
        d, _IdentityNormalizer(), params=params, action_horizon=6, **kwargs
    )
    calls = []
    orig = policy.plan

    def counted(obs):
        calls.append(1)
        return orig(obs)

    policy.plan = counted
    return policy, calls


def test_on_plan_obs_keeps_buffer(policy_parts):
    policy, calls = _counting_policy(policy_parts, replan_deviation=0.5)
    obs0 = np.zeros(6, np.float32)
    policy.get_action(obs0)
    assert len(calls) == 1
    # feed the obs the plan predicts for the next step -> no early replan
    on_plan = np.asarray(policy._planned_obs[0])
    policy.get_action(on_plan)
    assert len(calls) == 1


def test_deviation_triggers_replan(policy_parts):
    policy, calls = _counting_policy(policy_parts, replan_deviation=0.5)
    policy.get_action(np.zeros(6, np.float32))
    assert len(calls) == 1 and len(policy.action_buffer) > 0
    # obs far from every plan row -> buffer dropped, fresh plan
    policy.get_action(np.full(6, 50.0, np.float32))
    assert len(calls) == 2
    # planned-obs bookkeeping stays aligned with the buffer
    assert len(policy._planned_obs) == len(policy.action_buffer)


def test_disabled_by_default(policy_parts):
    policy, calls = _counting_policy(policy_parts)
    policy.get_action(np.zeros(6, np.float32))
    policy.get_action(np.full(6, 50.0, np.float32))  # huge drift, ignored
    assert len(calls) == 1


def test_reset_clears_planned_obs(policy_parts):
    policy, _ = _counting_policy(policy_parts, replan_deviation=0.5)
    policy.get_action(np.zeros(6, np.float32))
    policy.reset()
    assert policy._planned_obs == [] and policy.action_buffer == []


def test_cli_rejects_batched_combination(tmp_path):
    from dadiff_tpu.cli import evaluate_main

    with pytest.raises(SystemExit, match="sequential"):
        evaluate_main([
            "--checkpoint", "nonexistent.pt", "--dataset", "synthetic:pointmaze",
            "--replan-deviation", "0.5", "--batched",
        ])
