#!/usr/bin/env python
"""Installation / environment diagnostic with PASS/FAIL summary.

Reference analogue: scripts/test_installation.py (import checks, device
probe, env creation, model forward, dataset access). Extended with TPU
specifics: backend identification, jit compile check, mesh construction,
and hermetic-data fallbacks.
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass
import sys
import traceback

RESULTS = []


def check(name):
    def deco(fn):
        def run():
            try:
                detail = fn()
                RESULTS.append((name, True, detail or ""))
            except Exception as e:
                RESULTS.append((name, False, f"{type(e).__name__}: {e}"))
        return run
    return deco


@check("core imports (jax/flax/optax/orbax/numpy)")
def check_imports():
    import flax
    import jax
    import numpy
    import optax
    import orbax.checkpoint

    return f"jax {jax.__version__}, flax {flax.__version__}"


@check("dadiff_tpu package")
def check_package():
    import dadiff_tpu

    return f"version {dadiff_tpu.__version__}"


@check("accelerator backend")
def check_backend():
    import jax

    devs = jax.devices()
    return f"{jax.default_backend()}: {devs}"


@check("jit compile + execute")
def check_jit():
    import jax
    import jax.numpy as jnp

    out = jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((64, 64)))
    assert float(out) == 64 * 64 * 64
    return "ok"


@check("model forward (TemporalUnet + diffusion loss)")
def check_model():
    import jax

    from dadiff_tpu.models.diffusion import GaussianDiffusion
    from dadiff_tpu.models.temporal_unet import TemporalUnet

    unet = TemporalUnet(transition_dim=8, dim=16, dim_mults=(1, 2))
    d = GaussianDiffusion(model=unet, horizon=8, observation_dim=6,
                          action_dim=2, n_timesteps=10)
    params = d.init_params(jax.random.PRNGKey(0))
    loss = d.loss(params, jax.random.PRNGKey(1),
                  jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8)))
    return f"loss {float(loss):.3f}"


@check("device mesh construction")
def check_mesh():
    import jax

    from dadiff_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    return f"mesh {dict(mesh.shape)} over {len(jax.devices())} device(s)"


@check("gymnasium + PointMaze")
def check_gym():
    import gymnasium as gym
    import gymnasium_robotics  # noqa: F401

    env = gym.make("PointMaze_UMaze-v3")
    obs, _ = env.reset(seed=0)
    env.close()
    return f"obs keys {sorted(obs.keys())}"


@check("hermetic dataset (synthetic)")
def check_synthetic():
    from dadiff_tpu.datasets.sequence import SequenceDataset

    ds = SequenceDataset("synthetic:pointmaze:n=2,T=20", horizon=8)
    return f"{len(ds)} windows"


@check("minari (optional)")
def check_minari():
    try:
        import minari

        return f"minari {minari.__version__}"
    except ImportError:
        return "not installed (hermetic sources available: synthetic/gym/expert/npz)"


@check("torch interop (optional)")
def check_torch():
    try:
        import torch

        return f"torch {torch.__version__} (.pt checkpoint interop enabled)"
    except ImportError:
        return "not installed (.pt interop disabled; orbax-native only)"


def main():
    for fn_name in list(globals()):
        fn = globals()[fn_name]
        if callable(fn) and fn_name.startswith("check_"):
            fn()

    print("=" * 64)
    n_pass = 0
    for name, ok, detail in RESULTS:
        mark = "PASS" if ok else "FAIL"
        n_pass += ok
        print(f"[{mark}] {name}: {detail}")
    print("=" * 64)
    print(f"{n_pass}/{len(RESULTS)} checks passed")
    return 0 if n_pass == len(RESULTS) else 1


if __name__ == "__main__":
    sys.exit(main())
