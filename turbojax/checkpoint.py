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


def exists(path: str) -> bool:
    import os

    return os.path.exists(_base(path) + ".npz") and os.path.exists(
        _base(path) + _SUFFIX_META
    )


class RunCheckpointer:
    """Periodic save/restore for host-driven optimizer loops (SURVEY.md
    §5.4: ``optimize(..., resume=path)``).

    The saved unit is ``{"state": <loop carry pytree>, "trace": (it,)}`` —
    since the RNG key lives in the carry, ``restore → continue`` reproduces
    the exact uninterrupted trajectory (tests/test_checkpoint.py). Saves are
    atomic (write temp + rename) so a crash mid-save can't corrupt the last
    good checkpoint.
    """

    def __init__(self, path: str | None, every: int = 0):
        self.path = path
        self.every = every
        self._last_saved = -1

    def maybe_save(self, it_done: int, state: Any, trace) -> None:
        """Save when ≥ ``every`` new iterations completed since last save.
        ``it_done`` = iterations completed so far; ``trace`` their bests."""
        if not self.path or not self.every:
            return
        if it_done - self._last_saved < self.every:
            return
        self.save(it_done, state, trace)

    def save(self, it_done: int, state: Any, trace) -> None:
        import os

        tmp = _base(self.path) + ".tmp"
        save_state(tmp, {"state": state, "trace": jnp.asarray(np.asarray(trace))},
                   meta={"it": it_done})
        os.replace(tmp + ".npz", _base(self.path) + ".npz")
        os.replace(tmp + _SUFFIX_META, _base(self.path) + _SUFFIX_META)
        self._last_saved = it_done

    def try_restore(self, like_state: Any):
        """Returns (state, trace_list) from the checkpoint, or None if the
        file doesn't exist yet (fresh start). ``like_state`` provides the
        carry treedef (e.g. from ``jax.eval_shape`` of the init)."""
        if not self.path or not exists(self.path):
            return None
        like = {"state": like_state, "trace": jnp.zeros((0,))}
        loaded = load_state(self.path, like)
        self._last_saved = int(loaded["trace"].shape[0])
        return loaded["state"], list(np.asarray(loaded["trace"]))
