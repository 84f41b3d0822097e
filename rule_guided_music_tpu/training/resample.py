"""Timestep schedule samplers: uniform and loss-second-moment importance.

Re-architecture of guided_diffusion/resample.py.  The reference synchronizes
loss history across ranks with explicit torch.distributed all_gathers
(resample.py:71-104); in single-controller JAX every process computes over
global arrays, so the train step simply `process_allgather`s per-example
losses (or, under pjit, they are already global) and feeds them to
``update_with_all_losses`` — identical deterministic state on every host.
Sampling stays host-side numpy (it feeds data loading, not the jit graph).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


def create_named_schedule_sampler(name: str, num_timesteps: int) -> "ScheduleSampler":
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler(ABC):
    """Importance distribution over timesteps; unbiased via loss weights."""

    @abstractmethod
    def weights(self) -> np.ndarray:
        ...

    def sample(self, batch_size: int, rng: np.random.Generator):
        """Returns (timesteps int32 (B,), loss weights float32 (B,))."""
        w = self.weights()
        p = w / np.sum(w)
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1 / (len(p) * p[indices])
        return indices.astype(np.int32), weights.astype(np.float32)


class UniformSampler(ScheduleSampler):
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps
        self._weights = np.ones([num_timesteps])

    def weights(self) -> np.ndarray:
        return self._weights


class LossAwareSampler(ScheduleSampler):
    def update_with_all_losses(self, ts, losses):
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """Importance-sample t proportional to sqrt(E[loss^2]) with a uniform
    floor, after a warmup of ``history_per_term`` observations per t
    (resample.py:124-154)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            [num_timesteps, history_per_term], dtype=np.float64
        )
        self._loss_counts = np.zeros([num_timesteps], dtype=int)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        weights /= np.sum(weights)
        weights *= 1 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
