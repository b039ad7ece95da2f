"""Cross-device scalar statistics (reference: torch_utils/training_stats.py).

The reference accumulates [num, sum, sum-of-squares] moments per scalar and
syncs them with torch.distributed all_reduce (training_stats.py:55-99,
234-256).  The TPU-native equivalent: `report_moments` computes the moment
triple *inside* the jitted step (so it rides the program's existing
`psum`-style reductions across the mesh when values are sharded), and the
host-side `Collector` aggregates the per-step triples into means/stds over a
reporting window.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def report_moments(value) -> jnp.ndarray:
    """[num, sum, sum_sq] of a (possibly sharded) array — call inside jit."""
    value = jnp.asarray(value, jnp.float32)
    return jnp.stack([jnp.asarray(value.size, jnp.float32),
                      jnp.sum(value), jnp.sum(jnp.square(value))])


class Collector:
    """Aggregate per-step moment triples host-side and report mean/std."""

    def __init__(self, regex: str = ".*"):
        import re
        self._regex = re.compile(regex)
        self._moments: Dict[str, np.ndarray] = {}

    def update(self, stats: Dict[str, np.ndarray]):
        for name, triple in stats.items():
            if not self._regex.fullmatch(name):
                continue
            triple = np.asarray(triple, np.float64)
            if triple.shape != (3,):  # accept raw scalars too
                value = float(np.mean(triple))
                triple = np.array([1.0, value, value * value])
            if name in self._moments:
                self._moments[name] = self._moments[name] + triple
            else:
                self._moments[name] = triple

    def names(self):
        return list(self._moments)

    def num(self, name: str) -> float:
        return float(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        n, s, _ = self._moments.get(name, np.zeros(3))
        return float(s / n) if n > 0 else float("nan")

    def std(self, name: str) -> float:
        n, s, ss = self._moments.get(name, np.zeros(3))
        if n <= 1:
            return 0.0
        mean = s / n
        var = max(ss / n - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)} for name in self._moments}

    def reset(self):
        self._moments.clear()
