"""Value-function subsystem tests (capability the reference declares but
never implements, train.py:294-298)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dadiff_tpu.datasets.sequence import SequenceDataset
from dadiff_tpu.models.value_net import ValueNet, make_value_guide_fn, value_loss
from dadiff_tpu.ops.schedules import make_schedule


@pytest.fixture(scope="module")
def vnet():
    return ValueNet(transition_dim=8, dim=8, dim_mults=(1, 2))


def test_value_net_shapes(vnet, rng):
    params = vnet.init_params(rng, horizon=16)
    x = jax.random.normal(rng, (4, 16, 8))
    t = jnp.array([0, 1, 2, 3])
    v = vnet.apply({"params": params}, x, t)
    assert v.shape == (4,)
    assert v.dtype == jnp.float32


def test_dataset_returns():
    ds = SequenceDataset(
        "synthetic:pointmaze:n=4,T=40", horizon=8, include_returns=True,
        discount=0.9,
    )
    item = ds[0]
    assert "returns" in item and np.isfinite(item["returns"])
    batch = ds.get_batch(np.arange(16))
    assert batch["returns"].shape == (16,)
    # normalized targets
    all_r = ds._returns
    assert abs(all_r.mean()) < 0.1 and abs(all_r.std() - 1.0) < 0.1
    # return-to-go decreases toward episode end for positive rewards:
    # the first window of an episode has higher rtg than the last
    first, last = ds._starts[0], ds._starts[40 - 8]  # episode 0 boundaries
    assert ds._returns[first] > ds._returns[last]


def test_dataset_reward_fn_override():
    """reward_fn replaces recorded rewards for return-to-go targets (dense
    goal-distance shaping for sparse-reward tasks)."""
    def dense(ep):
        obs = np.asarray(ep["observations"], dtype=np.float64)
        T = len(ep["actions"])
        nxt = obs[1:T + 1] if len(obs) > T else obs[:T]
        return -np.linalg.norm(nxt[:, 0:2] - nxt[:, 4:6], axis=-1)

    ds_sparse = SequenceDataset(
        "synthetic:pointmaze:n=4,T=40", horizon=8, include_returns=True,
    )
    ds_dense = SequenceDataset(
        "synthetic:pointmaze:n=4,T=40", horizon=8, include_returns=True,
        reward_fn=dense,
    )
    # dense targets differ from recorded-reward targets and stay normalized
    assert not np.allclose(ds_sparse._returns, ds_dense._returns)
    assert abs(ds_dense._returns.mean()) < 0.1
    assert np.all(np.isfinite(ds_dense._returns))


def test_value_training_reduces_loss(vnet, rng):
    ds = SequenceDataset(
        "synthetic:pointmaze:n=6,T=40", horizon=8, include_returns=True
    )
    schedule = make_schedule(10, "cosine")
    params = vnet.init_params(rng, horizon=8)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    batch_np = ds.get_batch(np.arange(64))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: value_loss(vnet, p, schedule, key, batch)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_value_guided_sampling_shifts_distribution(vnet, rng):
    """Guidance from a value net changes samples in the value-increasing
    direction (end-to-end through make_sampler)."""
    from dadiff_tpu.guides.sampling import conditions_for_initial_obs, make_sampler
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    unet = TemporalUnet(transition_dim=8, dim=8, dim_mults=(1, 2))
    d = GaussianDiffusion(
        model=unet, horizon=8, observation_dim=6, action_dim=2, n_timesteps=10
    )
    params = d.init_params(rng)

    # hand-crafted 'value': mean of obs dim 0 (so guidance should raise it)
    def fake_value(x, t):
        return jnp.mean(x[:, :, 0], axis=1)

    cond = conditions_for_initial_obs(jnp.zeros(6), 6, 8, 8)
    plain = make_sampler(d)(params, jax.random.PRNGKey(0), cond)
    guided = make_sampler(d, guide_fn=fake_value, guide_weight=10.0)(
        params, jax.random.PRNGKey(0), cond
    )
    assert float(jnp.mean(guided[:, 1:, 0])) > float(jnp.mean(plain[:, 1:, 0]))

    # and the real ValueNet plugs in through the same interface
    vparams = vnet.init_params(rng, horizon=8)
    guide_fn = make_value_guide_fn(vnet, vparams)
    out = make_sampler(d, guide_fn=guide_fn, guide_weight=1.0)(
        params, jax.random.PRNGKey(1), cond
    )
    assert out.shape == (1, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rewards_in_sources_roundtrip(tmp_path):
    from dadiff_tpu.datasets import sources

    eps = sources.generate_synthetic_episodes("pointmaze", n_episodes=2, episode_len=10)
    assert "rewards" in eps[0] and eps[0]["rewards"].shape == (10,)
    path = str(tmp_path / "r.npz")
    sources.save_episodes_npz(path, eps)
    back = sources.load_episodes_npz(path)
    np.testing.assert_array_equal(back[0]["rewards"], eps[0]["rewards"])
