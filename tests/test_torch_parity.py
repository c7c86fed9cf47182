"""Golden parity tests: dadiff_tpu vs the reference torch implementation.

These load the reference modules read-only from /root/reference, convert
reference weights into Flax params via dadiff_tpu.io.torch_compat, and check
numerical agreement of the forward pass, diffusion math, and the full
reverse-sampling chain (with injected identical noise, since torch and JAX
PRNG streams differ by construction — see SURVEY.md §7 'hard parts')."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dadiff_tpu.models.temporal_unet import TemporalUnet
from dadiff_tpu.models.diffusion import GaussianDiffusion
from dadiff_tpu.io import torch_compat as tc

from tests.reference_loader import reference_available, load_reference_models

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

DIM = 16
DIM_MULTS = (1, 2, 4)
HORIZON = 16
OBS_DIM = 4
ACT_DIM = 2
TRANSITION = OBS_DIM + ACT_DIM
N_TIMESTEPS = 25


@pytest.fixture(scope="module")
def ref_modules():
    return load_reference_models()


@pytest.fixture(scope="module")
def pair(ref_modules):
    """A (torch diffusion model, jax diffusion model, flax params) triple with
    identical weights."""
    ref_unet_mod, ref_diff_mod = ref_modules
    torch.manual_seed(0)
    t_unet = ref_unet_mod.TemporalUnet(
        transition_dim=TRANSITION, dim=DIM, dim_mults=DIM_MULTS
    )
    t_diff = ref_diff_mod.GaussianDiffusion(
        model=t_unet,
        horizon=HORIZON,
        observation_dim=OBS_DIM,
        action_dim=ACT_DIM,
        n_timesteps=N_TIMESTEPS,
        beta_schedule="cosine",
    )
    t_diff.eval()

    j_unet = TemporalUnet(transition_dim=TRANSITION, dim=DIM, dim_mults=DIM_MULTS)
    j_diff = GaussianDiffusion(
        model=j_unet,
        horizon=HORIZON,
        observation_dim=OBS_DIM,
        action_dim=ACT_DIM,
        n_timesteps=N_TIMESTEPS,
        beta_schedule="cosine",
    )
    state = {k: v.detach().numpy() for k, v in t_diff.state_dict().items()}
    params = tc.diffusion_state_to_flax(state)
    return t_diff, j_diff, params


def test_schedule_buffers_match(pair):
    t_diff, j_diff, _ = pair
    for name in tc._SCHEDULE_BUFFERS:
        ref = getattr(t_diff, name).numpy()
        ours = np.asarray(getattr(j_diff.schedule, name))
        # torch precomputes buffers in float32; we use float64 then cast —
        # small drift at the high-beta end of the cosine schedule is expected
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=1e-5, err_msg=name)


def test_param_tree_is_complete(pair):
    t_diff, j_diff, params = pair
    expected = j_diff.init_params(jax.random.PRNGKey(0))
    exp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert exp_paths == got_paths


def test_unet_forward_parity(pair):
    t_diff, j_diff, params = pair
    rng = np.random.RandomState(1)
    x = rng.randn(3, HORIZON, TRANSITION).astype(np.float32)
    t = np.array([0, 7, 24])
    with torch.no_grad():
        ref_out = t_diff.model(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(j_diff.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


def test_q_sample_parity(pair):
    t_diff, j_diff, params = pair
    rng = np.random.RandomState(2)
    x0 = rng.randn(2, HORIZON, TRANSITION).astype(np.float32)
    noise = rng.randn(*x0.shape).astype(np.float32)
    t = np.array([3, 20])
    ref = t_diff.q_sample(
        torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)
    ).numpy()
    ours = np.asarray(j_diff.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_p_mean_variance_parity(pair):
    t_diff, j_diff, params = pair
    rng = np.random.RandomState(3)
    x = rng.randn(2, HORIZON, TRANSITION).astype(np.float32)
    t = np.array([5, 12])
    with torch.no_grad():
        ref_mean, ref_logvar = t_diff.p_mean_variance(
            torch.from_numpy(x), torch.from_numpy(t)
        )
    mean, logvar = j_diff.p_mean_variance(params, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(logvar), x.shape),
        np.broadcast_to(ref_logvar.numpy(), x.shape),
        rtol=1e-4,
        atol=1e-5,
    )


def test_full_sampling_chain_parity(pair):
    """End-to-end reverse chain with identical injected noise: the torch
    host-loop (diffusion.py:225-251) vs our single lax.scan."""
    t_diff, j_diff, params = pair
    rng = np.random.RandomState(4)
    batch = 2
    x_init = rng.randn(batch, HORIZON, TRANSITION).astype(np.float32)
    step_noise = rng.randn(N_TIMESTEPS, batch, HORIZON, TRANSITION).astype(np.float32)

    # torch side: replicate the reference loop, feeding our noise
    x_t = torch.from_numpy(x_init.copy())
    with torch.no_grad():
        for idx, i in enumerate(reversed(range(N_TIMESTEPS))):
            tt = torch.full((batch,), i, dtype=torch.long)
            mean, log_var = t_diff.p_mean_variance(x_t, tt)
            noise = torch.from_numpy(step_noise[idx])
            nonzero = (tt != 0).float().view(-1, 1, 1)
            x_t = mean + nonzero * torch.exp(0.5 * log_var) * noise
    ref = x_t.numpy()

    ours = np.asarray(
        j_diff.p_sample_loop(
            params,
            jax.random.PRNGKey(0),
            (batch, HORIZON, TRANSITION),
            init_noise=jnp.asarray(x_init),
            step_noise=jnp.asarray(step_noise),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_checkpoint_roundtrip(tmp_path, pair):
    """flax -> .pt -> flax identity + reference-style config inference."""
    t_diff, j_diff, params = pair
    config = {
        "dim": DIM,
        "dim_mults": list(DIM_MULTS),
        "n_timesteps": N_TIMESTEPS,
        "beta_schedule": "cosine",
        "horizon": HORIZON,
        "observation_dim": OBS_DIM,
        "action_dim": ACT_DIM,
    }
    path = str(tmp_path / "ckpt.pt")
    tc.save_pt_checkpoint(path, params, j_diff.schedule, config, epoch=3, global_step=77)

    ckpt = tc.load_pt_checkpoint(path)
    assert ckpt["epoch"] == 3 and ckpt["global_step"] == 77
    inferred = tc.infer_model_config_from_checkpoint(ckpt)
    assert inferred["dim"] == DIM
    assert tuple(inferred["dim_mults"]) == DIM_MULTS
    assert inferred["n_timesteps"] == N_TIMESTEPS
    assert inferred["horizon"] == HORIZON
    assert inferred["transition_dim"] == TRANSITION

    params2 = tc.diffusion_state_to_flax(ckpt["model_state_dict"])
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the exported .pt must load into the *reference* torch model
    state_t = torch.load(path, map_location="cpu", weights_only=False)
    t_diff.load_state_dict(state_t["model_state_dict"])


def test_seed_for_seed_sampling_parity(pair):
    """Bit-level (to f32 tolerance) reproduction of a torch.manual_seed(S)
    reference sampling run via the torch-RNG replay hooks."""
    from dadiff_tpu.io.torch_rng import reference_sampling_noise

    t_diff, j_diff, params = pair
    seed, batch = 1234, 2
    shape = (batch, HORIZON, TRANSITION)

    # the reference, exactly as shipped (torch global RNG)
    torch.manual_seed(seed)
    with torch.no_grad():
        ref = t_diff.p_sample_loop(shape).numpy()

    # replay: torch.manual_seed also seeds the default generator used by
    # torch.randn; our replay uses an explicit generator with the same seed,
    # which torch guarantees to produce the same stream.
    init, steps = reference_sampling_noise(seed, N_TIMESTEPS, shape)
    ours = np.asarray(
        j_diff.p_sample_loop(
            params,
            jax.random.PRNGKey(0),  # unused: noise fully injected
            shape,
            init_noise=jnp.asarray(init),
            step_noise=jnp.asarray(steps),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_config_inference_nonstandard_mults(tmp_path):
    """dim_mults inferred exactly from weight shapes, including sets the
    reference's level-count heuristic mis-infers (e.g. HalfCheetah's 1-4-8)."""
    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    unet = TemporalUnet(transition_dim=7, dim=8, dim_mults=(1, 4, 8))
    d = GaussianDiffusion(model=unet, horizon=16, observation_dim=5,
                          action_dim=2, n_timesteps=10)
    params = d.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "hc.pt")
    tc.save_pt_checkpoint(path, params, d.schedule, {
        "dim": 8, "dim_mults": [1, 4, 8], "n_timesteps": 10,
        "beta_schedule": "cosine", "horizon": 16,
        "observation_dim": 5, "action_dim": 2,
    })
    cfg = tc.infer_model_config_from_checkpoint(tc.load_pt_checkpoint(path))
    assert tuple(cfg["dim_mults"]) == (1, 4, 8)
    assert cfg["dim"] == 8
