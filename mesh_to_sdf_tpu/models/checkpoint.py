"""Checkpoint/resume for DifferentiableSDF training state.

The reference's checkpoint story is its versioned SDF container (SURVEY.md
§5); training state is a new capability, checkpointed with the same versioned
msgpack container discipline (orbax is available but msgpack keeps the whole
IO layer one format, shareable with the native codec).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import msgpack
import numpy as np

_MAGIC = "mesh_to_sdf_tpu.fit"
VERSION = 1


def _pack_tree(tree) -> list:
    leaves, treedef = jax.tree.flatten(tree)
    packed = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        packed.append(
            {"dtype": arr.dtype.str, "shape": list(arr.shape), "data": arr.tobytes()}
        )
    return packed


def _unpack_leaves(packed) -> list:
    out = []
    for rec in packed:
        arr = np.frombuffer(rec["data"], np.dtype(rec["dtype"]))
        out.append(arr.reshape(rec["shape"]))
    return out


def save_fit_state(path, state, step: int = 0) -> None:
    """Serialize an :class:`..models.sdf_layer.SdfFitState` (params + opt)."""
    env = {
        "magic": _MAGIC,
        "version": VERSION,
        "step": int(step),
        "leaves": _pack_tree(state),
    }
    with open(path, "wb") as f:
        f.write(msgpack.packb(env, use_bin_type=True))


def load_fit_state(path, like) -> Tuple[object, int]:
    """Restore a state with the same tree structure as ``like``.

    Returns (state, step)."""
    with open(path, "rb") as f:
        env = msgpack.unpackb(f.read(), raw=False)
    if not isinstance(env, dict) or env.get("magic") != _MAGIC:
        raise ValueError("not a fit-state checkpoint")
    if env.get("version") != VERSION:
        raise ValueError(f"unsupported checkpoint version {env.get('version')!r}")
    leaves, treedef = jax.tree.flatten(like)
    restored = _unpack_leaves(env["leaves"])
    if len(restored) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(restored)} leaves, expected {len(leaves)}"
        )
    cast = [
        jnp.asarray(r, dtype=l.dtype) if hasattr(l, "dtype") else r
        for r, l in zip(restored, leaves)
    ]
    return jax.tree.unflatten(treedef, cast), int(env.get("step", 0))
