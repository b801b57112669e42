"""DifferentiableSDF model + checkpointing tests."""
import numpy as np
import jax.numpy as jnp

from baselines import make_icosphere
from mesh_to_sdf_tpu import Grid, SignMethod
from mesh_to_sdf_tpu.models.checkpoint import load_fit_state, save_fit_state
from mesh_to_sdf_tpu.models.sdf_layer import (
    DifferentiableSDF,
    pad_tri_idx,
    sdf_grid,
)


def test_fit_reduces_loss():
    v, f = make_icosphere(subdiv=1)
    g = Grid.from_bounding_box([-1.5] * 3, [1.5] * 3, [10] * 3)
    tri = pad_tri_idx(f.astype(np.int32), 64)
    target = sdf_grid(
        jnp.asarray(v * 1.15), jnp.asarray(tri), g, SignMethod.NORMAL, block=64
    )
    model = DifferentiableSDF(f.astype(np.int32), g, SignMethod.NORMAL,
                              learning_rate=5e-2, block=64)
    state = model.init(v)
    losses = []
    for _ in range(8):
        state, loss = model.train_step(state, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses


def test_checkpoint_roundtrip(tmp_path):
    v, f = make_icosphere(subdiv=1)
    g = Grid.from_bounding_box([-1.5] * 3, [1.5] * 3, [8] * 3)
    model = DifferentiableSDF(f.astype(np.int32), g, SignMethod.NORMAL, block=64)
    state = model.init(v)
    tri = pad_tri_idx(f.astype(np.int32), 64)
    target = sdf_grid(
        jnp.asarray(v * 1.1), jnp.asarray(tri), g, SignMethod.NORMAL, block=64
    )
    state, _ = model.train_step(state, target)

    path = tmp_path / "fit.ckpt"
    save_fit_state(path, state, step=1)
    fresh = model.init(v)
    restored, step = load_fit_state(path, fresh)
    assert step == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params), np.asarray(state.params)
    )
    # Training continues identically from the restored state.
    s1, l1 = model.train_step(state, target)
    s2, l2 = model.train_step(restored, target)
    assert float(l1) == float(l2)

    import pytest

    with pytest.raises(ValueError):
        load_fit_state(path, {"wrong": np.zeros(3)})
