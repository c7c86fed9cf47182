"""Horizon-window sequence dataset + device-prefetching dataloader.

Designed from the reference's implied interface (the module is missing from
the reference tree; call sites: train.py:370-386, evaluate.py:165-171,
training.py:127). Batches are ``{'conditions': (B, H, obs+act)}`` of
normalized interleaved trajectories, obs first (reference
policies.py:184-190).

TPU-first differences:
  * no torch DataLoader workers — windows are gathered with one vectorized
    numpy take per batch and prefetched into device memory double-buffered
    (``prefetch_to_device``), optionally pre-sharded across a mesh,
  * all episodes are packed into one contiguous (N_steps, dim) arena at
    construction so window extraction is a strided gather, not python loops.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from dadiff_tpu.datasets.normalization import DatasetNormalizer
from dadiff_tpu.datasets.sources import Episode, load_episodes


class SequenceDataset:
    """Fixed-length windows over episode trajectories.

    Args mirror the reference call sites:
        dataset_name: episode source spec (see sources.load_episodes).
        horizon: window length H.
        normalizer: 'LimitsNormalizer' | 'GaussianNormalizer' (evaluate.py:168).
        max_path_length: cap on per-episode steps used (evaluate.py:169).
        use_padding: pad episodes shorter than horizon by repeating the final
            transition so they still yield one window (evaluate.py:170).
        episodes: pre-loaded episode list (bypasses dataset_name).
        reward_fn: optional callable(episode) -> (T,) rewards replacing the
            recorded rewards for return-to-go targets (dense shaping for
            sparse-reward tasks; only used when include_returns=True).
    """

    def __init__(
        self,
        dataset_name: Optional[str] = None,
        horizon: int = 64,
        normalizer: str = "LimitsNormalizer",
        max_path_length: int = 1000,
        use_padding: bool = True,
        episodes: Optional[List[Episode]] = None,
        max_episodes: Optional[int] = None,
        include_returns: bool = False,
        discount: float = 0.99,
        reward_fn=None,
        **source_kwargs,
    ):
        if episodes is None:
            if dataset_name is None:
                raise ValueError("Provide dataset_name or episodes")
            episodes = load_episodes(dataset_name, **source_kwargs)
        if max_episodes is not None:
            episodes = episodes[:max_episodes]
        if not episodes:
            raise ValueError("Empty episode list")

        self.dataset_name = dataset_name
        self.horizon = horizon
        self.max_path_length = max_path_length
        self.use_padding = use_padding

        self.observation_dim = int(episodes[0]["observations"].shape[-1])
        self.action_dim = int(episodes[0]["actions"].shape[-1])
        self.transition_dim = self.observation_dim + self.action_dim

        # Build one packed interleaved arena: per episode, T rows of
        # [obs_t ‖ act_t] (the final observation has no action and is dropped,
        # matching the interleaved layout used throughout the reference).
        self.include_returns = include_returns
        self.discount = discount

        segments: List[np.ndarray] = []
        rtg_segments: List[np.ndarray] = []
        window_starts: List[int] = []
        offset = 0
        for ep in episodes:
            obs = np.asarray(ep["observations"], dtype=np.float32)
            act = np.asarray(ep["actions"], dtype=np.float32)
            T = min(len(act), max_path_length)
            obs, act = obs[:T], act[:T]
            seg = np.concatenate([obs, act], axis=-1)

            rtg = None
            if include_returns:
                if reward_fn is not None:
                    # synthesized reward (e.g. dense goal-distance shaping when
                    # the recorded env reward is sparse/terminal-only)
                    rewards = np.asarray(reward_fn(ep), dtype=np.float64)[:T]
                else:
                    rewards = np.asarray(
                        ep.get("rewards", np.zeros(T)), dtype=np.float64
                    )[:T]
                # discounted return-to-go per row (Diffuser-style value target)
                rtg = np.zeros(T, dtype=np.float64)
                acc = 0.0
                for t in range(T - 1, -1, -1):
                    acc = rewards[t] + discount * acc
                    rtg[t] = acc
                rtg = rtg.astype(np.float32)

            if T < horizon:
                if not use_padding or T == 0:
                    continue
                pad = np.repeat(seg[-1:], horizon - T, axis=0)
                seg = np.concatenate([seg, pad], axis=0)
                if rtg is not None:
                    rtg = np.concatenate(
                        [rtg, np.repeat(rtg[-1:], horizon - T)], axis=0
                    )
                T = horizon
            segments.append(seg)
            if rtg is not None:
                rtg_segments.append(rtg)
            window_starts.extend(range(offset, offset + T - horizon + 1))
            offset += T
        if not segments:
            raise ValueError(
                f"No usable windows: horizon={horizon} exceeds every episode "
                f"length and use_padding={use_padding}"
            )

        self._arena = np.concatenate(segments, axis=0)  # (N, transition_dim)
        self._starts = np.asarray(window_starts, dtype=np.int64)

        self._returns = None
        self.returns_mean = self.returns_std = None
        if include_returns:
            rtg_all = np.concatenate(rtg_segments, axis=0)
            self.returns_mean = float(rtg_all.mean())
            self.returns_std = float(rtg_all.std() + 1e-6)
            self._returns = (
                (rtg_all - self.returns_mean) / self.returns_std
            ).astype(np.float32)

        self.normalizer = DatasetNormalizer(
            self._arena[:, : self.observation_dim],
            self._arena[:, self.observation_dim:],
            self.observation_dim,
            self.action_dim,
            normalizer=normalizer,
        )
        # Normalize the arena once; windows come out pre-normalized.
        self._arena = self.normalizer.normalize_trajectory(self._arena)

    def set_normalizer(self, normalizer) -> None:
        """Swap in different normalization stats (e.g. the stats persisted
        in a checkpoint), renormalizing the packed arena so windows stay
        consistent with the new normalizer — required for fine-tuning on a
        different dataset without silently shifting the scaling the
        pretrained weights expect."""
        phys = self.normalizer.unnormalize_trajectory(self._arena)
        self.normalizer = normalizer
        self._arena = normalizer.normalize_trajectory(phys)

    def __len__(self) -> int:
        return len(self._starts)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        s = self._starts[idx]
        item = {"conditions": self._arena[s : s + self.horizon]}
        if self._returns is not None:
            item["returns"] = self._returns[s]
        return item

    def get_batch(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        """Vectorized window gather: (B, H, transition_dim) in one take."""
        rows = self._starts[idxs][:, None] + np.arange(self.horizon)[None, :]
        batch = {"conditions": self._arena[rows]}
        if self._returns is not None:
            batch["returns"] = self._returns[self._starts[idxs]]
        return batch


class DataLoader:
    """Minimal epoch iterator over a SequenceDataset.

    ``num_workers`` is accepted for API parity with the reference
    (train.py:376-381) and ignored — batch assembly is one vectorized gather,
    and device transfer overlap comes from :func:`prefetch_to_device`.
    """

    def __init__(
        self,
        dataset: SequenceDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 0,
    ):
        del num_workers
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, end, self.batch_size):
            yield self.dataset.get_batch(order[i : i + self.batch_size])


def create_dataloader(
    dataset: SequenceDataset,
    batch_size: int,
    shuffle: bool = True,
    num_workers: int = 0,
    drop_last: bool = True,
    seed: int = 0,
) -> DataLoader:
    """Factory matching the reference call site (train.py:376-381)."""
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        seed=seed,
        num_workers=num_workers,
    )


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->HBM prefetch (the TPU analogue of DataLoader
    workers + per-step H2D copies in the reference train loop,
    training.py:147-149). Yields batches already on device, optionally
    sharded across a mesh (e.g. batch-dim data parallelism)."""
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
