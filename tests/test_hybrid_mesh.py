"""Multi-slice (ICI x DCN) hybrid mesh layout.

Real multi-slice TPU deployments expose a ``slice_index`` per device and
pay ~10-100x more for collectives that cross the slice (DCN) boundary
than for intra-slice ICI hops.  ``make_hybrid_mesh`` keeps the axis names
(and therefore every PartitionSpec in the codebase) unchanged, but orders
devices so the model/seq axes never cross slices and the DCN factor is
the outer (slower) part of each axis — the "collectives ride ICI, not
DCN" layout.  Faked here with 8 virtual CPU devices grouped by id.
"""

import numpy as np
import jax
import pytest

from cara_tpu.config import CaraConfig, ViTConfig
from cara_tpu.models import cara as cara_lib
from cara_tpu.models import vit as vit_lib
from cara_tpu.parallel import mesh as mesh_lib
from cara_tpu.train import steps as steps_lib


def _slice_of(d):
    return d.id // 4  # 2 fake slices of 4 devices


def test_hybrid_layout_keeps_model_axis_intra_slice():
    mesh = mesh_lib.make_hybrid_mesh((4, 2), (2, 1), slice_of=_slice_of)
    assert mesh.axis_names == ("data", "model")
    arr = mesh.devices
    assert arr.shape == (4, 2)
    # Every model-axis pair lives inside ONE slice.
    for i in range(4):
        assert len({_slice_of(d) for d in arr[i]}) == 1
    # DCN factor is the OUTER half of the data axis: rows 0-1 = slice 0,
    # rows 2-3 = slice 1.
    row_slice = [_slice_of(arr[i, 0]) for i in range(4)]
    assert row_slice == [0, 0, 1, 1]
    # All 8 devices used exactly once.
    assert len({d.id for d in arr.flat}) == 8


def test_hybrid_layout_3d():
    mesh = mesh_lib.make_hybrid_mesh((2, 2, 2), (2, 1, 1),
                                     slice_of=_slice_of)
    assert mesh.axis_names == ("data", "model", "seq")
    arr = mesh.devices
    # Each (model, seq) 2x2 block is one slice; data index selects it.
    for i in range(2):
        assert len({_slice_of(d) for d in arr[i].flat}) == 1
    assert _slice_of(arr[0, 0, 0]) != _slice_of(arr[1, 0, 0])


def test_hybrid_validation():
    with pytest.raises(ValueError, match="same rank"):
        mesh_lib.make_hybrid_mesh((4, 2), (2,), slice_of=_slice_of)
    with pytest.raises(ValueError, match="divide"):
        mesh_lib.make_hybrid_mesh((4, 2), (3, 1), slice_of=_slice_of)
    with pytest.raises(ValueError, match="slices"):
        # devices form 2 slices, dcn asks for 4
        mesh_lib.make_hybrid_mesh((4, 2), (4, 1), slice_of=_slice_of)
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_hybrid_mesh((2, 2), (2, 1), slice_of=_slice_of)
    # Single-slice devices (no slice_index attr) -> dcn (1, 1) works...
    m = mesh_lib.make_hybrid_mesh((4, 2), (1, 1))
    assert m.devices.shape == (4, 2)
    # ...and a multi-slice request on them fails loudly.
    with pytest.raises(ValueError, match="slices"):
        mesh_lib.make_hybrid_mesh((4, 2), (2, 1))


def test_hybrid_train_step_matches_plain():
    """The hybrid layout is a pure device permutation: the jitted train
    step produces the same loss/updates as the standard mesh."""
    cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, repr_size=None, num_classes=4,
                    drop_path_rate=0.0)
    cara_cfg = CaraConfig(rank=4, scale=1.0, l_mu=1.0, l_std=0.0,
                          weight_dropout=0.0)
    params = vit_lib.init_vit_params(jax.random.key(0), cfg)
    cara_params = cara_lib.init_cara_params(jax.random.key(1), cfg, cara_cfg)
    tx = steps_lib.make_optimizer(1e-3, steps_per_epoch=10)
    frozen, state = steps_lib.init_train_state(tx, params, cara_params)
    step_fn = steps_lib.make_train_step(cfg, cara_cfg, tx)
    kx, ky = jax.random.split(jax.random.key(5))
    y = jax.random.randint(ky, (16,), 0, 4)
    x = jax.random.normal(kx, (16, 16, 16, 3)) + (y[:, None, None, None]
                                                  - 2.0) * 0.5
    batch = {"image": x, "label": y}
    rng = jax.random.key(7)

    def run(mesh):
        st, mt = jax.jit(step_fn)(
            mesh_lib.put_replicated(mesh, state), mesh_lib.put_replicated(
                mesh, frozen), mesh_lib.put_batch(mesh, batch), rng)
        return float(mt["loss"]), np.asarray(st.trainable["cara"]["A2"])

    loss_a, a2_a = run(mesh_lib.make_mesh((8, 1)))
    loss_b, a2_b = run(mesh_lib.make_hybrid_mesh((8, 1), (2, 1),
                                                 slice_of=_slice_of))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    np.testing.assert_allclose(a2_a, a2_b, atol=1e-6)


def test_dcn_mesh_cli_flag(tmp_path, monkeypatch):
    """--dcn-mesh trains end-to-end through the CLI (CARA_FAKE_SLICES fakes
    2 slices out of the 8 virtual CPU devices)."""
    from cara_tpu.cli import vit_cp as cli

    monkeypatch.setenv("CARA_FAKE_SLICES", "2")
    acc = cli.main([
        "--synthetic", "--dataset", "patch_camelyon",
        "--model", "vit_tiny_test", "--batch-size", "8",
        "--eval-batch-size", "8", "--synthetic-size", "32",
        "--dtype", "float32", "--backbone", str(tmp_path / "missing.npz"),
        "--out-dir", str(tmp_path), "--log-every", "1000",
        "--dim", "4", "--epochs", "2",
        "--mesh", "4,2", "--dcn-mesh", "2,1"])
    assert 0.0 <= acc <= 1.0
