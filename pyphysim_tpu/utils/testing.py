"""Reproducibility helpers for stochastic tests.

Counterpart of the reference's seed capture/replay pattern
(tests/ia_package_test.py:35-152, the ``CustomTestCase`` that pickles the
RandomStates of channel/noise/solver on failure and replays them on the
next run). Here the unit of randomness is a jax PRNG key.

Usage::

    from pyphysim_tpu.utils.testing import SeedReplay

    def test_something(tmp_path):
        with SeedReplay("test_something.pickle") as sr:
            key = sr.key("channel", jax.random.PRNGKey(1234))
            ...stochastic assertions...

On failure the keys handed out inside the block are saved; the next run
replays the exact same keys so the failure is reproducible. On success
any stored replay file is removed.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["SeedReplay"]


class SeedReplay:
    """Capture-on-failure / replay-on-rerun of named PRNG keys."""

    def __init__(self, filename: str, folder: str = ".seed_replays") -> None:
        self._path = os.path.join(folder, filename)
        self._keys: Dict[str, np.ndarray] = {}
        self._replayed: Optional[Dict[str, np.ndarray]] = None
        if os.path.exists(self._path):
            with open(self._path, "rb") as f:
                self._replayed = pickle.load(f)

    @property
    def replaying(self) -> bool:
        """True when a previous failure's keys are being replayed."""
        return self._replayed is not None

    def key(self, name: str, default: jax.Array) -> jax.Array:
        """The key to use for ``name``: the replayed one if a failure was
        recorded, otherwise ``default`` (which is remembered for capture)."""
        if self._replayed is not None and name in self._replayed:
            value = jax.numpy.asarray(self._replayed[name])
        else:
            value = default
        self._keys[name] = np.asarray(value)
        return value

    def seed(self, name: str, default: int) -> int:
        """Like :meth:`key` for plain integer seeds."""
        if self._replayed is not None and name in self._replayed:
            value = int(self._replayed[name])
        else:
            value = int(default)
        self._keys[name] = np.asarray(value)
        return value

    # -- context manager ---------------------------------------------------

    def __enter__(self) -> "SeedReplay":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            os.makedirs(os.path.dirname(self._path), exist_ok=True)
            with open(self._path, "wb") as f:
                pickle.dump(self._keys, f)
        elif os.path.exists(self._path):
            os.unlink(self._path)
        return False  # never swallow the exception
