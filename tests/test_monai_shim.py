"""The MONAI-name shim executes the reference's pipeline + eval halves
verbatim (VERDICT round-2 item 4).

The transform pipeline, dataset/loader construction, and validation loop
below are the reference's own code shapes (``baseline.py:116-189,258-310``,
only the roi/shape constants scaled down for test speed), running against
``mvtb_tpu.compat``'s ``monai`` package on a synthetic on-disk Decathlon
tree. The torch *training* loop is the documented boundary:
``DiceLoss(...)(...).backward()`` raises.
"""

import sys

import numpy as np
import pytest

from mvtb_tpu import compat
from mvtb_tpu.data.synthetic import build_decathlon_tree

compat.install()

from monai.apps import DecathlonDataset  # noqa: E402
from monai.data import DataLoader, partition_dataset  # noqa: E402
from monai.losses import DiceLoss  # noqa: E402
from monai.metrics import DiceMetric  # noqa: E402
from monai.networks.nets import UNet  # noqa: E402
from monai.transforms import (  # noqa: E402
    Activations,
    AsChannelFirstd,
    AsDiscrete,
    CenterSpatialCropd,
    Compose,
    LoadImaged,
    MapTransform,
    NormalizeIntensityd,
    Orientationd,
    Spacingd,
    ToTensord,
)
from monai.utils import set_determinism  # noqa: E402


@pytest.fixture(scope="module")
def root_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("decathlon")
    # affine matching the target pixdim -> Spacingd is a shape-preserving
    # no-op, keeping the 32x32x16 volumes stride-16 compatible for the UNet
    build_decathlon_tree(str(root), n=5, spatial=(32, 32, 16), kind="smooth",
                         affine=np.diag([1.5, 1.5, 2.0, 1.0]))
    return str(root)


class ConvertToMultiChannelBasedOnBratsClassesd(MapTransform):
    """Verbatim from ``baseline.py:87-113``s semantics."""

    def __call__(self, data):
        d = dict(data)
        for key in self.keys:
            result = [np.logical_or(d[key] == 2, d[key] == 3),
                      np.logical_or(np.logical_or(d[key] == 2, d[key] == 3),
                                    d[key] == 1),
                      d[key] == 2]
            d[key] = np.stack(result, axis=0).astype(np.float32)
        return d


def _val_transform():
    # the reference's val pipeline (baseline.py:139-156) at test scale
    return Compose([
        LoadImaged(keys=["image", "label"]),
        AsChannelFirstd(keys="image"),
        ConvertToMultiChannelBasedOnBratsClassesd(keys="label"),
        Spacingd(keys=["image", "label"], pixdim=(1.5, 1.5, 2.0),
                 mode=("bilinear", "nearest")),
        Orientationd(keys=["image", "label"], axcodes="RAS"),
        CenterSpatialCropd(keys=["image", "label"], roi_size=[32, 32, 16]),
        NormalizeIntensityd(keys="image", nonzero=True, channel_wise=True),
        ToTensord(keys=["image", "label"]),
    ])


def test_shim_importable_as_top_level_monai():
    import monai

    assert "mvtb_tpu/compat" in monai.__file__.replace("\\", "/")
    assert sys.modules["monai"].transforms is not None


def test_pipeline_and_dataset(root_dir):
    set_determinism(seed=0)
    val_ds = DecathlonDataset(root_dir=root_dir, task="Task01_BrainTumour",
                              transform=_val_transform(),
                              section="validation", download=False,
                              num_workers=4, cache_num=50)
    assert len(val_ds) == 1  # 20% of 5
    sample = val_ds[0]
    assert sample["image"].shape == (4, 32, 32, 16)
    assert sample["label"].shape == (3, 32, 32, 16)
    # label channels are the BraTS one-hot: TC subset of WT
    assert np.all(sample["label"][0] <= sample["label"][1])
    # cached deterministic prefix: second access identical
    np.testing.assert_array_equal(sample["image"], val_ds[0]["image"])


def test_eval_half_runs_verbatim(root_dir):
    import torch

    set_determinism(seed=0)
    train_ds = DecathlonDataset(root_dir=root_dir, task="Task01_BrainTumour",
                                transform=_val_transform(),
                                section="training", download=False,
                                cache_num=100)
    # the reference's deterministic split + loader (baseline.py:186-189)
    val_ds, test_ds = torch.utils.data.random_split(
        train_ds, [2, 2], torch.Generator().manual_seed(0))
    val_loader = DataLoader(val_ds, batch_size=2, shuffle=False,
                            num_workers=4)

    device = torch.device("cpu")
    model = UNet(dimensions=3, in_channels=4, out_channels=3,
                 channels=(4, 4, 4, 4, 4), strides=(2, 2, 2, 2),
                 num_res_units=1).to(device)
    n_params = sum(p.numel() for p in model.parameters() if p.requires_grad)
    assert n_params > 0

    model.eval()
    dice_metric = DiceMetric(include_background=True, reduction="mean")
    post_trans = Compose([Activations(sigmoid=True),
                          AsDiscrete(threshold_values=True)])
    metric_sum = 0.0
    metric_count = 0
    for val_data in val_loader:
        val_inputs, val_labels = (val_data["image"].to(device),
                                  val_data["label"].to(device))
        val_outputs = model(val_inputs)
        assert val_outputs.shape == val_labels.shape
        val_outputs = post_trans(val_outputs)
        assert set(np.unique(np.asarray(val_outputs))) <= {0.0, 1.0}
        value, not_nans = dice_metric(y_pred=val_outputs, y=val_labels)
        not_nans = not_nans.item()
        metric_count += not_nans
        metric_sum += value.item() * not_nans
        # per-class slices run too (baseline.py:283-301)
        value_tc, nn_tc = dice_metric(y_pred=val_outputs[:, 0:1],
                                      y=val_labels[:, 0:1])
        assert 0.0 <= value_tc.item() <= 1.0 or np.isnan(value_tc.item())
    assert metric_count > 0
    metric = metric_sum / metric_count
    assert 0.0 <= metric <= 1.0


def test_state_dict_roundtrip_changes_forward(root_dir):
    model = UNet(dimensions=3, in_channels=2, out_channels=1,
                 channels=(4, 4), strides=(2,), num_res_units=1)
    x = np.random.RandomState(0).randn(1, 2, 16, 16, 16).astype(np.float32)
    y0 = np.asarray(model(x))
    sd = model.state_dict()
    zeroed = {k: np.zeros_like(v) for k, v in sd.items()}
    model.load_state_dict(zeroed)
    assert np.allclose(np.asarray(model(x)), 0.0)
    model.load_state_dict(sd)
    np.testing.assert_allclose(np.asarray(model(x)), y0, rtol=1e-6)


def test_dice_loss_matches_framework_and_backward_is_boundary():
    from mvtb_tpu.train.losses import dice_loss
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 3, 8, 8, 4).astype(np.float32)
    target = (rng.rand(2, 3, 8, 8, 4) > 0.5).astype(np.float32)
    loss_function = DiceLoss(to_onehot_y=False, sigmoid=True,
                             squared_pred=True)
    loss = loss_function(logits, target)
    want = float(dice_loss(jnp.moveaxis(jnp.asarray(logits), 1, -1),
                           jnp.moveaxis(jnp.asarray(target), 1, -1),
                           sigmoid=True, squared_pred=True))
    assert abs(loss.item() - want) < 1e-6
    with pytest.raises(RuntimeError, match="TPU-native"):
        loss.backward()


def test_partition_dataset_matches_monai_ratios():
    data = list(range(10))
    parts = partition_dataset(data, ratios=[0.9, 0.1], shuffle=True, seed=42)
    assert len(parts) == 2
    assert len(parts[0]) == 9 and len(parts[1]) == 1
    assert sorted(parts[0] + parts[1]) == data
    # seeded shuffle is reproducible
    again = partition_dataset(data, ratios=[0.9, 0.1], shuffle=True, seed=42)
    assert parts == again


def test_cache_dataset_caches_prefix_but_rerolls_random_suffix():
    """MONAI CacheDataset semantics: the deterministic prefix runs once and
    is cached; the random suffix re-rolls per access on a deepcopy."""
    from monai.data import CacheDataset
    from monai.transforms import Compose, MapTransform
    from mvtb_tpu.transforms.base import Randomizable

    calls = {"prefix": 0}

    class CountingDouble(MapTransform):
        def __call__(self, d):
            calls["prefix"] += 1
            d = dict(d)
            for k in self.key_iterator(d):
                d[k] = np.asarray(d[k]) * 2.0
            return d

    class RandShift(MapTransform, Randomizable):
        def __call__(self, d):
            d = dict(d)
            off = self.R.rand()
            for k in self.key_iterator(d):
                d[k] = np.asarray(d[k]) + off
            return d

    data = [{"image": np.ones((2, 2), np.float32)} for _ in range(3)]
    ds = CacheDataset(data, Compose([CountingDouble(keys="image"),
                                     RandShift(keys="image")]), cache_num=3)
    a = ds[0]["image"]
    b = ds[0]["image"]
    assert calls["prefix"] == 1  # prefix ran once, cached
    assert (a >= 2.0).all() and (b >= 2.0).all()
    assert not np.allclose(a, b)  # random suffix re-rolled


def test_add_channeld_and_numpy_pad_mode_names_exist():
    from monai.transforms import AddChanneld
    from monai.utils import NumpyPadMode

    d = AddChanneld(keys="label")({"label": np.zeros((4, 4, 2))})
    assert d["label"].shape == (1, 4, 4, 2)
    assert str(NumpyPadMode.CONSTANT) == "constant"


def test_training_half_runs_verbatim_via_grad_bridge(root_dir):
    """Round-3 VERDICT item 3: the reference's TRAINING loop
    (``baseline.py:232-248``) now executes top-to-bottom through the shim —
    zero_grad / forward / DiceLoss / loss.backward() / optimizer.step() —
    with the grad bridge computing jax.value_and_grad under the hood and the
    stepped torch parameters synced back into the flax tree. Loss decreases."""
    import torch

    set_determinism(seed=0)
    train_ds = DecathlonDataset(root_dir=root_dir, task="Task01_BrainTumour",
                                transform=_val_transform(),
                                section="training", download=False,
                                cache_num=100)
    train_loader = DataLoader(train_ds, batch_size=2, shuffle=True,
                              num_workers=4)

    device = torch.device("cpu")
    model = UNet(dimensions=3, in_channels=4, out_channels=3,
                 channels=(4, 8), strides=(2,), num_res_units=1).to(device)
    loss_function = DiceLoss(to_onehot_y=False, sigmoid=True,
                             squared_pred=True)
    # reference: Adam(model.parameters(), 1e-4, weight_decay=1e-5,
    # amsgrad=True) (baseline.py:209-213); lr scaled up for test-speed
    # convergence like the shapes are scaled down
    optimizer = torch.optim.Adam(model.parameters(), 1e-2,
                                 weight_decay=1e-5, amsgrad=True)

    epoch_loss_values = []
    for epoch in range(3):
        model.train()
        epoch_loss = 0
        step = 0
        for batch_data in train_loader:
            step += 1
            inputs, labels = (
                batch_data["image"].to(device),
                batch_data["label"].to(device),
            )
            optimizer.zero_grad()
            outputs = model(inputs)
            loss = loss_function(outputs, labels)
            loss.backward()
            optimizer.step()
            epoch_loss += loss.item()
        epoch_loss /= step
        epoch_loss_values.append(epoch_loss)
    assert epoch_loss_values[-1] < epoch_loss_values[0]


def test_gd_family_runs_verbatim(tmp_path):
    """Round-4 VERDICT item 3: the learnable-layer (GD) script family runs
    verbatim through the shim. This test is line-shaped on
    ``gibbs0p7_layer_domain_GD.py:192-298,307-346,383-386``: a user-defined
    ``Gibbs_UNet(nn.Module)`` composing the torch-facade ``GibbsNoiseLayer``
    with the shim UNet; Adam backprop on ``model.parameters()`` through the
    grad bridge; ``@torch.no_grad()`` finite-difference updates that read
    ``model.gibbs.alpha.clone()`` and assign ``model.gibbs.alpha``; val Dice
    + ``torch.save(model.state_dict())``; ``np.savetxt`` trajectory. Only
    shapes/h/lr are scaled for test speed (like the T1 loop test scales the
    UNet)."""
    import os

    import torch
    import torch.nn as nn

    from stylization_layers import GibbsNoiseLayer

    set_determinism(seed=0)

    class Gibbs_UNet(nn.Module):
        """ResUnet with Gibbs layer (gibbs0p7_layer_domain_GD.py:192-212)"""

        def __init__(self, alpha=None):
            super().__init__()
            self.gibbs = GibbsNoiseLayer(alpha)
            self.ResUnet = UNet(
                dimensions=3,
                in_channels=1,
                out_channels=1,
                channels=(4, 8),
                strides=(2,),
                num_res_units=1,
            )

        def forward(self, img):
            img = self.gibbs(img)
            img = self.ResUnet(img)
            return img

    device = torch.device("cpu")
    alpha = 0.7
    model = Gibbs_UNet(alpha).to(device)
    assert model.gibbs.alpha.detach().item() == pytest.approx(0.7)

    loss_function = DiceLoss(to_onehot_y=False, sigmoid=True,
                             squared_pred=True)
    optimizer = torch.optim.Adam(
        model.parameters(), 1e-2, weight_decay=1e-5, amsgrad=True)
    n_params = sum(p.numel() for p in model.parameters() if p.requires_grad)
    assert n_params > 0

    # h/lr scaled up with the 16^3 test volume so the hard-mask radius step
    # h * dist_max crosses k-voxels (reference h=0.01 on 128x128x64 moves
    # the radius ~0.7 voxel; h=0.1 here moves it ~1.3)
    @torch.no_grad()
    def Gibbs_GD(inputs, labels, model, h=0.1, learning_rate=0.2):
        """Function to update Gibbs layer via finite different SG"""
        old_alpha = model.gibbs.alpha.clone()
        outputs_0 = model(inputs)
        loss_0 = loss_function(outputs_0, labels)
        model.gibbs.alpha = old_alpha + h
        outputs_h = model(inputs)
        loss_h = loss_function(outputs_h, labels)
        delta = (loss_h - loss_0) / h
        model.gibbs.alpha = old_alpha - learning_rate * delta
        return loss_0.item(), model.gibbs.alpha.item()

    rng = np.random.RandomState(0)
    batches = [
        {"image": rng.randn(2, 1, 16, 16, 16).astype(np.float32),
         "label": (rng.rand(2, 1, 16, 16, 16) > 0.6).astype(np.float32)}
        for _ in range(2)
    ]

    epoch_loss_values, metric_values, gibbs_values = [], [], []
    best_metric, best_metric_epoch = -1, -1
    for epoch in range(2):
        model.train()
        epoch_loss = 0
        step = 0
        for batch_data in batches:
            gibbs_values.append(model.gibbs.alpha.detach().item())
            step += 1
            inputs, labels = (
                torch.as_tensor(batch_data["image"]).to(device),
                torch.as_tensor(batch_data["label"]).to(device),
            )
            optimizer.zero_grad()
            outputs = model(inputs)
            loss = loss_function(outputs, labels)
            loss.backward()
            optimizer.step()
            epoch_loss += loss.item()
            gibbs_loss, gibbs_alpha = Gibbs_GD(inputs, labels, model)
            gibbs_values.append(gibbs_alpha)
        epoch_loss /= step
        epoch_loss_values.append(epoch_loss)

        # validation half (gibbs0p7_layer_domain_GD.py:307-346)
        model.eval()
        with torch.no_grad():
            dice_metric = DiceMetric(include_background=True,
                                     reduction="mean")
            post_trans = Compose([Activations(sigmoid=True),
                                  AsDiscrete(threshold_values=True)])
            metric_sum = 0.0
            metric_count = 0
            for val_data in batches:
                val_inputs, val_labels = (
                    torch.as_tensor(val_data["image"]).to(device),
                    torch.as_tensor(val_data["label"]).to(device),
                )
                val_outputs = post_trans(model(val_inputs))
                value, not_nans = dice_metric(y_pred=val_outputs,
                                              y=val_labels)
                not_nans = not_nans.item()
                metric_count += not_nans
                metric_sum += value.item() * not_nans
            metric = metric_sum / metric_count
            metric_values.append(metric)
            if metric > best_metric:
                best_metric = metric
                best_metric_epoch = epoch + 1
                torch.save(model.state_dict(),
                           os.path.join(tmp_path, "gd_best.pth"))

    assert all(np.isfinite(epoch_loss_values))
    assert epoch_loss_values[-1] <= epoch_loss_values[0]
    assert best_metric_epoch >= 1 and 0.0 <= best_metric <= 1.0
    # the FD routine genuinely moved alpha (two distinct trajectory values)
    assert len(set(np.round(gibbs_values, 6))) >= 2
    np.savetxt(os.path.join(tmp_path, "gibbs_trajectory_test.txt"),
               np.array(gibbs_values))

    # the composition state_dict round-trips through torch.save into a
    # fresh model (save the FINAL state so the forwards must agree)
    torch.save(model.state_dict(), os.path.join(tmp_path, "gd_final.pth"))
    fresh = Gibbs_UNet(float(model.gibbs.alpha))
    # bare torch.load, exactly as the reference's load paths call it —
    # the facade's state_dict emits torch tensors so the torch>=2.6
    # weights_only=True default accepts the pickle
    fresh.load_state_dict(torch.load(os.path.join(tmp_path,
                                                  "gd_final.pth")))
    x = torch.as_tensor(batches[0]["image"])
    np.testing.assert_allclose(np.asarray(fresh(x)),
                               np.asarray(model(x)), rtol=2e-4, atol=1e-5)


def test_domain_template_runs_verbatim(tmp_path):
    """Round-4 VERDICT item 5: the T2 (institutional-distribution) template
    runs verbatim through the shim — line-shaped on
    ``baseline_domain.py:86-320``: working-dir fallback, ReCompose train/val
    pipelines, per-modality JSON manifest -> ``partition_dataset`` ->
    4x ``CacheDataset`` -> ``torch.utils.data.ConcatDataset`` -> DataLoader,
    ``WholeTumorTCGA`` labels, UNet(1->1) + DiceLoss + Adam via the grad
    bridge, val Dice + best checkpoint, ``np.savetxt`` curves. Shapes/LR
    scaled for test speed."""
    import json
    import os

    import torch
    from torch.utils.data import ConcatDataset

    from monai.data import CacheDataset
    from monai.transforms import (AddChanneld, RandFlipd,
                                  RandScaleIntensityd, RandShiftIntensityd,
                                  RandSpatialCropd)
    from filters_and_operators import WholeTumorTCGA
    from utils import ReCompose
    from mvtb_tpu.data.synthetic import build_tcga_tree

    set_determinism(seed=0)
    root_dir = str(tmp_path)
    build_tcga_tree(root_dir, n_per_modality=3, spatial=(24, 24, 12),
                    affine=np.diag([1.5, 1.5, 2.0, 1.0]))

    JOB_NAME = "baseline_model_sourceDist_4mods_WT"
    working_dir = os.path.join(root_dir, JOB_NAME)
    try:
        os.mkdir(working_dir)
    except Exception:
        JOB_NAME = JOB_NAME + "_2"
        working_dir = os.path.join(root_dir, JOB_NAME)
        os.mkdir(working_dir)

    train_transform = ReCompose([
        LoadImaged(keys=["image", "label"]),
        AddChanneld(keys="image"),
        WholeTumorTCGA(keys="label"),
        Spacingd(keys=["image", "label"], pixdim=(1.5, 1.5, 2.0),
                 mode=("bilinear", "nearest")),
        Orientationd(keys=["image", "label"], axcodes="RAS"),
        RandSpatialCropd(keys=["image", "label"], roi_size=[16, 16, 8],
                         random_size=False),
        RandFlipd(keys=["image", "label"], prob=0.5, spatial_axis=0),
        NormalizeIntensityd(keys="image", nonzero=True, channel_wise=True),
        RandScaleIntensityd("image", factors=0.1, prob=0.5),
        RandShiftIntensityd("image", offsets=0.1, prob=0.5),
        ToTensord(keys=["image", "label"]),
    ])
    val_transform = ReCompose([
        LoadImaged(keys=["image", "label"]),
        AddChanneld(keys="image"),
        WholeTumorTCGA(keys="label"),
        Spacingd(keys=["image", "label"], pixdim=(1.5, 1.5, 2.0),
                 mode=("bilinear", "nearest")),
        Orientationd(keys=["image", "label"], axcodes="RAS"),
        CenterSpatialCropd(keys=["image", "label"], roi_size=[16, 16, 8]),
        NormalizeIntensityd(keys="image", nonzero=True, channel_wise=True),
        ToTensord(keys=["image", "label"]),
    ])

    with open(os.path.join(root_dir, "train_sequence_by_modality.json")) as f:
        data_seqs_4mods = json.load(f)

    train_seq_flair, val_seq_flair = partition_dataset(
        data_seqs_4mods["FLAIR"], [0.9, 0.1], shuffle=True, seed=0)
    train_seq_t1, val_seq_t1 = partition_dataset(
        data_seqs_4mods["T1"], [0.9, 0.1], shuffle=True, seed=0)
    train_seq_t1gd, val_seq_t1gd = partition_dataset(
        data_seqs_4mods["T1Gd"], [0.9, 0.1], shuffle=True, seed=0)
    train_seq_t2, val_seq_t2 = partition_dataset(
        data_seqs_4mods["T2"], [0.9, 0.1], shuffle=True, seed=0)

    CACHE_NUM = 100
    train_ds_flair = CacheDataset(train_seq_flair, train_transform,
                                  cache_num=CACHE_NUM)
    train_ds_t1 = CacheDataset(train_seq_t1, train_transform,
                               cache_num=CACHE_NUM)
    train_ds_t1gd = CacheDataset(train_seq_t1gd, train_transform,
                                 cache_num=CACHE_NUM)
    train_ds_t2 = CacheDataset(train_seq_t2, train_transform,
                               cache_num=CACHE_NUM)
    val_ds_flair = CacheDataset(val_seq_flair, val_transform, cache_num=50)
    val_ds_t1 = CacheDataset(val_seq_t1, val_transform, cache_num=50)
    val_ds_t1gd = CacheDataset(val_seq_t1gd, val_transform, cache_num=50)
    val_ds_t2 = CacheDataset(val_seq_t2, val_transform, cache_num=50)

    train_ds = ConcatDataset([train_ds_flair, train_ds_t1, train_ds_t1gd,
                              train_ds_t2])
    val_ds = ConcatDataset([val_ds_flair, val_ds_t1, val_ds_t1gd, val_ds_t2])
    assert len(train_ds) == 8 and len(val_ds) == 4  # 2+1 split per modality

    train_loader = DataLoader(train_ds, batch_size=2, shuffle=True,
                              num_workers=4)
    val_loader = DataLoader(val_ds, batch_size=2, shuffle=False,
                            num_workers=4)

    device = torch.device("cpu")
    model = UNet(dimensions=3, in_channels=1, out_channels=1,
                 channels=(4, 8), strides=(2,), num_res_units=1).to(device)
    loss_function = DiceLoss(to_onehot_y=False, sigmoid=True,
                             squared_pred=True)
    optimizer = torch.optim.Adam(model.parameters(), 1e-2,
                                 weight_decay=1e-5, amsgrad=True)

    max_epochs = 2
    val_interval = 1
    best_metric, best_metric_epoch = -1, -1
    epoch_loss_values, metric_values = [], []
    for epoch in range(max_epochs):
        model.train()
        epoch_loss = 0
        step = 0
        for batch_data in train_loader:
            step += 1
            inputs, labels = (batch_data["image"].to(device),
                              batch_data["label"].to(device))
            assert inputs.shape[1:] == (1, 16, 16, 8)
            assert set(np.unique(np.asarray(labels))) <= {0.0, 1.0}
            optimizer.zero_grad()
            outputs = model(inputs)
            loss = loss_function(outputs, labels)
            loss.backward()
            optimizer.step()
            epoch_loss += loss.item()
        epoch_loss /= step
        epoch_loss_values.append(epoch_loss)

        if (epoch + 1) % val_interval == 0:
            model.eval()
            with torch.no_grad():
                dice_metric = DiceMetric(include_background=True,
                                         reduction="mean")
                post_trans = Compose([Activations(sigmoid=True),
                                      AsDiscrete(threshold_values=True)])
                metric_sum, metric_count = 0.0, 0
                for val_data in val_loader:
                    val_inputs, val_labels = (val_data["image"].to(device),
                                              val_data["label"].to(device))
                    val_outputs = post_trans(model(val_inputs))
                    value, not_nans = dice_metric(y_pred=val_outputs,
                                                  y=val_labels)
                    not_nans = not_nans.item()
                    metric_count += not_nans
                    metric_sum += value.item() * not_nans
                metric = metric_sum / metric_count
                metric_values.append(metric)
                if metric > best_metric:
                    best_metric = metric
                    best_metric_epoch = epoch + 1
                    torch.save(model.state_dict(),
                               os.path.join(working_dir, JOB_NAME + ".pth"))

    np.savetxt(os.path.join(working_dir,
                            f"epoch_loss_values_{JOB_NAME}.txt"),
               np.array(epoch_loss_values))
    np.savetxt(os.path.join(working_dir, f"metric_values_{JOB_NAME}.txt"),
               np.array(metric_values))

    assert epoch_loss_values[-1] <= epoch_loss_values[0]
    assert best_metric_epoch >= 1 and 0.0 <= best_metric <= 1.0
    assert os.path.exists(os.path.join(working_dir, JOB_NAME + ".pth"))
    loaded = np.loadtxt(os.path.join(working_dir,
                                     f"epoch_loss_values_{JOB_NAME}.txt"))
    np.testing.assert_allclose(loaded, epoch_loss_values)


def test_spike_layer_facade_composes():
    """spikes GD family shape (``spikes11_layer_domain_GD.py:191-224``):
    spike_layer composes under nn.Module, ``intensity`` is a tensor the FD
    routine can reassign, and a fresh RandKSpaceSpikeNoise per forward."""
    import torch
    import torch.nn as nn

    from stylization_layers import spike_layer

    layer = spike_layer(11.0)
    assert isinstance(layer, nn.Module)
    x = np.random.RandomState(0).randn(2, 1, 8, 8, 8).astype(np.float32)
    y0 = np.asarray(layer(torch.as_tensor(x)))
    assert y0.shape == x.shape and np.isfinite(y0).all()
    old = layer.intensity.clone()
    layer.intensity = old + 2.0
    assert layer.intensity.item() == pytest.approx(13.0)
    y1 = np.asarray(layer(torch.as_tensor(x)))
    assert y1.shape == x.shape


def test_grad_bridge_mechanics():
    """backward() fills .grad on the facade's live parameters; a manual SGD
    step changes the next forward (torch->flax sync)."""
    import torch

    model = UNet(dimensions=3, in_channels=2, out_channels=1,
                 channels=(4, 4), strides=(2,), num_res_units=1)
    params = list(model.parameters())
    assert all(p.grad is None for p in params)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 16, 16, 16).astype(np.float32)
    y = (rng.rand(1, 1, 16, 16, 16) > 0.5).astype(np.float32)
    loss_function = DiceLoss(sigmoid=True, squared_pred=True)

    out0 = np.asarray(model(x))
    loss = loss_function(model(x), y)
    loss.backward()
    assert any(p.grad is not None and float(p.grad.abs().sum()) > 0
               for p in params)
    # grads accumulate like torch autograd
    g0 = params[0].grad.clone() if params[0].grad is not None else None
    loss_function(model(x), y).backward()
    if g0 is not None:
        np.testing.assert_allclose(params[0].grad.numpy(), 2 * g0.numpy(),
                                   rtol=1e-5)

    with torch.no_grad():
        for p in params:
            if p.grad is not None:
                p -= 0.1 * p.grad
    out1 = np.asarray(model(x))
    assert not np.allclose(out0, out1)
