"""Declarative experiment configs.

The reference ships YAML experiment files that no code loads (SURVEY.md §2.3
#16 'dead artifacts'). Here the same schema (dataset/model/diffusion/
training/evaluation/system blocks, configs/experiments/*.yaml) is actually
consumed: ``load_experiment_config`` flattens it into the CLI argument
namespace, with explicit CLI flags taking precedence.
"""

from __future__ import annotations

import json
from typing import Any, Dict

# yaml block.key -> CLI arg name (reference configs/experiments/halfcheetah.yaml)
_YAML_TO_ARG = {
    ("dataset", "name"): "dataset",
    ("dataset", "horizon"): "horizon",
    ("dataset", "max_path_length"): "max_path_length",
    ("model", "dim"): "dim",
    ("model", "dim_mults"): "dim_mults",
    ("model", "kernel_size"): "kernel_size",
    ("diffusion", "n_timesteps"): "n_timesteps",
    ("diffusion", "beta_schedule"): "beta_schedule",
    ("diffusion", "loss_type"): "loss_type",
    ("diffusion", "clip_denoised"): "clip_denoised",
    ("diffusion", "predict_epsilon"): "predict_epsilon",
    ("diffusion", "prediction"): "prediction",
    ("training", "n_epochs"): "n_epochs",
    ("training", "batch_size"): "batch_size",
    ("training", "learning_rate"): "lr",
    ("training", "warmup_steps"): "warmup_steps",
    ("training", "gradient_clip"): "gradient_clip",
    ("training", "use_ema"): "use_ema",
    ("training", "ema_decay"): "ema_decay",
    ("training", "save_freq"): "save_freq",
    ("training", "eval_freq"): "eval_freq",
    ("evaluation", "env_name"): "env",
    ("evaluation", "n_episodes"): "n_episodes",
    ("evaluation", "policy_type"): "policy_type",
    ("evaluation", "action_horizon"): "action_horizon",
    ("system", "num_workers"): "num_workers",
    ("system", "seed"): "seed",
    ("system", "device"): "device",
}


def load_experiment_config(path: str) -> Dict[str, Any]:
    """Load a YAML (or JSON) experiment file into a flat {arg_name: value}."""
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        raw = json.loads(text)
    else:
        import yaml

        raw = yaml.safe_load(text)

    flat: Dict[str, Any] = {}
    for (block, key), arg in _YAML_TO_ARG.items():
        if isinstance(raw.get(block), dict) and key in raw[block]:
            flat[arg] = raw[block][key]
    # passthrough for unknown top-level scalar keys (forward-compat)
    for k, v in raw.items():
        if not isinstance(v, dict):
            flat.setdefault(k, v)
    return flat


def apply_config_defaults(args, config: Dict[str, Any], parser, argv=None) -> None:
    """Overlay config values onto argparse results: config wins over parser
    defaults, explicit CLI flags win over config.

    Explicitness is determined by scanning the actual command line for each
    option string (not by comparing against parser defaults, which cannot
    distinguish ``--dim 128`` from an unpassed ``--dim`` when 128 is the
    default)."""
    import sys

    if argv is None:
        argv = sys.argv[1:]
    explicit = set()
    for action in parser._actions:
        for opt in action.option_strings:
            if any(a == opt or a.startswith(opt + "=") for a in argv):
                explicit.add(action.dest)
                break
    for key, value in config.items():
        if hasattr(args, key) and key not in explicit:
            setattr(args, key, value)
