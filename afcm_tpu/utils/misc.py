"""Runtime-contract and inspection helpers
(reference: torch_utils/misc.py).

`assert_shape` is the pervasive runtime shape contract of the reference
(misc.py:82-95); under jit shapes are static so it costs nothing.
`print_module_summary` mirrors misc.py:196-264 for flax variables;
`check_replica_consistency` is the mesh-era analog of
`check_ddp_consistency` (misc.py:180-191)."""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import numpy as np


def assert_shape(tensor, ref_shape: Iterable[Optional[int]]):
    """Assert tensor shape matches ref (None entries = wildcard)."""
    ref_shape = tuple(ref_shape)
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, "
            f"expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, "
                f"expected {ref_size}")


def nan_to_num(x, nan=0.0, posinf=None, neginf=None):
    import jax.numpy as jnp
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def num_params(params) -> int:
    return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))


def print_module_summary(variables, max_rows: int = 200) -> str:
    """Per-parameter table + totals for a variables pytree."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        name = jax.tree_util.keystr(path)
        rows.append((name, tuple(leaf.shape), int(np.prod(leaf.shape))))
    total = sum(r[2] for r in rows)
    width = max((len(r[0]) for r in rows[:max_rows]), default=10)
    lines = [f"{'Parameter':<{width}}  {'Shape':<20}  Count"]
    for name, shape, count in rows[:max_rows]:
        lines.append(f"{name:<{width}}  {str(shape):<20}  {count}")
    if len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more)")
    lines.append(f"Total parameters: {total:,}")
    out = "\n".join(lines)
    print(out)
    return out


def check_replica_consistency(tree) -> bool:
    """Verify a replicated pytree holds identical values on every device of
    its sharding (mesh-era `check_ddp_consistency`)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        first = np.asarray(shards[0].data)
        for shard in shards[1:]:
            if not np.array_equal(first, np.asarray(shard.data)):
                raise AssertionError(
                    f"Replica mismatch at {jax.tree_util.keystr(path)} "
                    f"on device {shard.device}")
    return True


class InfiniteSampler:
    """Rank-aware infinite shuffled index stream
    (reference: misc.py:111-142)."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self):
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))

        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1
