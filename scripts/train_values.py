#!/usr/bin/env python
"""Value-function training CLI (thin wrapper; logic in dadiff_tpu.cli).

Completes the capability the reference declares but never implements
(train.py:294-298 'Value guidance not yet implemented'):

    python scripts/train_values.py --dataset npz:data/pointmaze_umaze_expert.npz \
        --horizon 32 --n-timesteps 100 --n-epochs 30 --log-dir logs/values
    python scripts/evaluate.py --checkpoint ... --policy-type value-guided \
        --value-checkpoint logs/values/value_final ...
"""

try:
    import _path  # noqa: F401  (repo-checkout bootstrap)
except ImportError:  # imported as scripts.<name>: root already on path
    pass

from dadiff_tpu.cli import train_value_main

if __name__ == "__main__":
    train_value_main()
