"""Checkpoint/resume (improves on the reference, SURVEY.md §5).

The reference saves only the best model's state_dict each generation
(utils/train_dataset.py:211) and re-seeds the population on resume.  Here a
checkpoint carries the *full training state*: best params, the entire GA
population + fitness, generation counter, and RNG key — resume is exact.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, generation: int, best_params=None,
                    population=None, fitness=None, key=None, sigma=None,
                    extra=None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "generation": int(generation),
        "best_params": _to_host(best_params) if best_params is not None else None,
        "population": np.asarray(population) if population is not None else None,
        "fitness": np.asarray(fitness) if fitness is not None else None,
        "key": np.asarray(key) if key is not None else None,
        "extra": extra or {},
    }
    if sigma is not None:
        payload["sigma"] = float(sigma)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
