"""Periodic checkpoint/resume for long Gibbs runs.

The reference has no persistence until the final ``savemat`` — an exception
hours into a sweep loses everything (SURVEY.md §5). Host-loop samplers here
accept a checkpoint callback that snapshots ``(iteration, rng key, carried
reference draw)`` so runs resume mid-chain.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save(path: str, step: int, key, payload: Any) -> None:
    """Atomically write a checkpoint (numpy-converted pytree + rng state)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = {
        "step": int(step),
        "key": np.asarray(jax.random.key_data(key)),
        "payload": jax.tree_util.tree_map(lambda a: np.asarray(a), payload),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh)
    os.replace(tmp, path)


def load(path: str):
    """Load a checkpoint; returns ``(step, key, payload)`` or ``None``."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        state = pickle.load(fh)
    key = jax.random.wrap_key_data(state["key"])
    return state["step"], key, state["payload"]


class PeriodicCheckpointer:
    """Callback for host-loop samplers: saves every ``every`` iterations.

    The *current* RNG key must be passed on every call — snapshotting a
    fixed key at construction would make a resumed run replay the RNG
    stream from the start of the chain instead of continuing it.
    """

    def __init__(self, path: str, every: int = 50):
        self.path = path
        self.every = every

    def __call__(self, step: int, key, payload: Any) -> None:
        if step % self.every == 0:
            save(self.path, step, key, payload)
