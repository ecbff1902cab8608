"""Data parallelism over the virtual 8-device CPU mesh: sharded training
steps run, match single-device results, and actually shard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtb_tpu.data.synthetic import make_volume
from mvtb_tpu.models import UNet
from mvtb_tpu.ops.fused import StylizeConfig
from mvtb_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from mvtb_tpu.train import create_seg_state, seg_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(batch=8, spatial=(16, 16, 8)):
    model = UNet(out_channels=3, channels=(4, 8), strides=(2,), num_res_units=1)
    state = create_seg_state(jax.random.key(0), model, (1,) + spatial + (4,))
    rng = np.random.RandomState(0)
    imgs, lbls = zip(*[make_volume(rng, 4, spatial) for _ in range(batch)])
    return state, np.stack(imgs), np.stack(lbls)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_model=2)


def test_sharded_step_matches_single_device():
    state, image, label = _setup()
    key = jax.random.key(1)

    # replicate BEFORE the single-device step: seg_train_step donates its
    # input state, so the original buffers are dead after the call
    mesh = make_mesh()
    state_r = replicate(mesh, state)

    # single-device result
    s1, loss1 = seg_train_step(state, jnp.asarray(image), jnp.asarray(label), key)
    img_s, lbl_s = shard_batch(mesh, image, label)
    assert len(img_s.sharding.device_set) == 8
    with jax.set_mesh(mesh):
        s8, loss8 = seg_train_step(state_r, img_s, lbl_s, key)

    assert abs(float(loss1) - float(loss8)) < 1e-5
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_step_with_stylization():
    state, image, label = _setup()
    cfg = StylizeConfig(disk_r=4.0, sap_p=0.1)
    mesh = make_mesh()
    state_r = replicate(mesh, state)
    img_s, lbl_s = shard_batch(mesh, image, label)
    with jax.set_mesh(mesh):
        s8, loss = seg_train_step(state_r, img_s, lbl_s, jax.random.key(2), cfg)
    assert np.isfinite(float(loss))
    # params stay replicated after the update
    p = jax.tree.leaves(s8.params)[0]
    assert len(p.sharding.device_set) == 8


def test_batch_sharding_spec():
    mesh = make_mesh()
    sh = batch_sharding(mesh, ndim=5)
    assert sh.spec[0] == "data"
    assert all(s is None for s in sh.spec[1:])


def test_tensor_parallel_matches_single_device():
    """(data=4, model=2) mesh: params sharded on output channels, batch on
    data — GSPMD-partitioned step matches the single-device result."""
    from mvtb_tpu.parallel.tp import shard_state_tp, tp_param_sharding

    state, image, label = _setup(batch=4)
    key = jax.random.key(5)
    mesh = make_mesh(n_data=4, n_model=2)
    state_tp = shard_state_tp(mesh, replicate(mesh, state))  # before donation
    s1, loss1 = seg_train_step(state, jnp.asarray(image), jnp.asarray(label), key)
    # at least one conv kernel actually sharded over 'model'
    sharded = [p for p in jax.tree.leaves(state_tp.params)
               if "model" in str(p.sharding.spec)]
    assert sharded, "no parameter got model-sharded"
    img_s, lbl_s = shard_batch(mesh, image, label)
    with jax.set_mesh(mesh):
        s2, loss2 = seg_train_step(state_tp, img_s, lbl_s, key)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_spatially_sharded_train_step():
    """Full-volume spatial partitioning: image H-axis sharded over the mesh,
    params replicated — GSPMD inserts the conv halo exchanges. Loss matches
    the single-device step exactly; params match to reduction-order noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    state, image, label = _setup(batch=1, spatial=(32, 32, 8))
    key = jax.random.key(7)
    mesh = make_mesh()
    state_r = replicate(mesh, state)  # before the donating step
    s1, loss1 = seg_train_step(state, jnp.asarray(image), jnp.asarray(label), key)

    sp = NamedSharding(mesh, P(None, None, "data"))  # shard H of (B,C,H,W,D)
    with jax.set_mesh(mesh):
        s2, loss2 = seg_train_step(state_r,
                                   jax.device_put(image, sp),
                                   jax.device_put(label, sp), key)
    assert abs(float(loss1) - float(loss2)) < 1e-6
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
