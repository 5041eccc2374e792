"""Checkpoint / resume (SURVEY.md §5.4).

Reference behavior [R]: history arrays live on the optimizer object; a
crashed run loses state unless the user pickled it. The build does better:
every optimizer state is one pytree (scan carries are NamedTuples of
arrays), so checkpointing is a generic pytree serializer — ``.npz`` with a
structure descriptor, no pickle, no orbax dependency required (orbax is
available but msgpack/npz keeps checkpoints greppable and dependency-free).

The RNG key is part of the state, so ``save → load → continue`` is
deterministic: resuming reproduces the exact trajectory of an uninterrupted
run (tests/test_checkpoint.py).
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_SUFFIX_META = ".meta.json"


def _base(path: str) -> str:
    return path[: -len(".npz")] if path.endswith(".npz") else path


def save_state(path: str, state: Any, meta: dict | None = None) -> None:
    """Serialize any pytree of arrays to ``path`` (.npz) + a structure file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            arrays[f"leaf_{i}"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    np.savez(_base(path) + ".npz", **arrays)
    with open(_base(path) + _SUFFIX_META, "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "n_leaves": len(leaves),
                "key_leaves": [
                    i for i, l in enumerate(leaves) if _is_key(l)
                ],
                "meta": meta or {},
            },
            f,
        )


def _is_key(leaf) -> bool:
    try:
        return jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except (TypeError, AttributeError):
        return False


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by ``save_state``; ``like`` provides the
    structure (an example state with the same treedef, e.g. a fresh carry)."""
    data = np.load(_base(path) + ".npz")
    with open(_base(path) + _SUFFIX_META) as f:
        info = json.load(f)
    leaves_like, treedef = jax.tree.flatten(like)
    if len(leaves_like) != info["n_leaves"]:
        raise ValueError(
            f"checkpoint has {info['n_leaves']} leaves, expected {len(leaves_like)}"
        )
    key_set = set(info.get("key_leaves", []))
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        if i in key_set:
            leaves.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree.unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with open(_base(path) + _SUFFIX_META) as f:
        return json.load(f).get("meta", {})
