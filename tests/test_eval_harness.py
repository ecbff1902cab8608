"""Evaluation harness: ModelEvaluation accumulation, sweep iteration,
persistence, and reference-order multi-label returns."""

import jax
import jax.numpy as jnp
import numpy as np

from mvtb_tpu.data.synthetic import decathlon_style_dicts, make_volume
from mvtb_tpu.eval.harness import ModelEvaluation, TransformSweep
from mvtb_tpu.models import UNet
from mvtb_tpu.transforms import GibbsNoise, WrapArtifactd


def _tiny_model(out_channels=3, in_channels=4):
    model = UNet(out_channels=out_channels, channels=(4, 8), strides=(2,),
                 num_res_units=1)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 16, 16, 8, in_channels)))
    return model, variables["params"]


def _loader(n=4, batch=2, channels=4, classes=3):
    rng = np.random.RandomState(0)
    for _ in range(n // batch):
        imgs, lbls = zip(*[make_volume(rng, channels, (16, 16, 8), classes)
                           for _ in range(batch)])
        yield {"image": np.stack(imgs), "label": np.stack(lbls)}


def test_multi_eval_returns_reference_order(tmp_path):
    model, params = _tiny_model()
    ev = ModelEvaluation(model.apply, params, instance_name=str(tmp_path / "ev"))
    metrics = ev.dataset_eval_multi(_loader())
    assert len(metrics) == 4  # (mean, ET, TC, WT)
    assert all(np.isfinite(m) for m in metrics)

    ev.add_eval("clean", _loader())
    path = ev.save()
    ev2 = ModelEvaluation(instance_name="reload")
    ev2.load_dict(path)
    assert "clean" in ev2.eval_dict
    assert len(ev2.eval_dict["clean"]) == 4


def test_single_eval_scalar():
    model, params = _tiny_model(out_channels=1, in_channels=1)
    ev = ModelEvaluation(model.apply, params, out_channels=1)
    m = ev.dataset_eval_single(_loader(channels=1, classes=1))
    assert np.isfinite(m) and 0 <= m <= 1


def test_transform_sweep_yields_named_loaders():
    samples = decathlon_style_dicts(0, 4, channels=1, spatial=(16, 16, 8),
                                    n_classes=1)
    sweep = TransformSweep(
        samples,
        {"gibbs0.3": lambda d: {**d, "image": np.asarray(GibbsNoise(0.3)(d["image"]))},
         "wrap0.5": WrapArtifactd(keys="image", alpha=0.5)},
        batch_size=2,
    )
    seen = {}
    for name, loader in sweep:
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (2, 1, 16, 16, 8)
        seen[name] = batches[0]["image"]
    assert set(seen) == {"gibbs0.3", "wrap0.5"}
    clean = samples[0]["image"]
    assert not np.allclose(seen["gibbs0.3"][0], clean)

    direct = list(sweep["wrap0.5"])
    assert len(direct) == 2
