"""Replay buffer (parity with ref /root/reference/utils.py:45-103).

Vestigial in the reference (an RL leftover from the Py_PSOPS work, unused by
any training script) but part of its public utility surface. Host-side numpy;
``sample`` returns numpy arrays the caller can ``jnp.asarray``.
"""

from __future__ import annotations

import numpy as np


class ReplayBuffer:
    def __init__(self, state_dim: int, action_dim: int, max_size: int = int(1e6), seed: int = 0):
        self.max_size = max_size
        self.ptr = 0
        self.size = 0
        self.rng = np.random.default_rng(seed)
        self.state = np.zeros((max_size, state_dim))
        self.action = np.zeros((max_size, action_dim))
        self.next_state = np.zeros((max_size, state_dim))
        self.reward = np.zeros((max_size, 1))
        self.not_done = np.zeros((max_size, 1))

    def add(self, state, action, next_state, reward, done):
        self.state[self.ptr] = state
        self.action[self.ptr] = action
        self.next_state[self.ptr] = next_state
        self.reward[self.ptr] = reward
        self.not_done[self.ptr] = 1.0 - done
        self.ptr = (self.ptr + 1) % self.max_size
        self.size = min(self.size + 1, self.max_size)

    def _gather(self, ind):
        return (
            self.state[ind],
            self.action[ind],
            self.next_state[ind],
            self.reward[ind],
            self.not_done[ind],
        )

    def sample(self, batch_size: int):
        ind = self.rng.integers(0, self.size, size=batch_size)
        return self._gather(ind)

    def importance_sampling(self, batch_size: int):
        """Oversample positive-reward transitions 50/50; the first row is the
        argmax-reward transition (ref utils.py:84-103)."""
        positive = np.where(self.reward[: self.size, 0] > 0)[0]
        p = np.empty(self.size)
        if len(positive) > 0:
            po = 0.5 / len(positive)
            pd = 0.5 / max(self.size - len(positive), 1)
            p.fill(pd)
            p[positive] = po
            p /= p.sum()
        else:
            p.fill(1.0 / self.size)
        ind = self.rng.choice(np.arange(self.size), size=batch_size, p=p)
        ind[0] = int(np.argmax(self.reward[: self.size, 0]))
        return self._gather(ind)
