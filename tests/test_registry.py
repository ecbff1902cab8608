"""Registry sanity: every experiment config is well-formed, and the
manifest proves name-for-name coverage of the reference script tree."""

import os

from mvtb_tpu.experiments import REGISTRY
from mvtb_tpu.experiments.manifest import LIBRARY_MAP, SCRIPT_MAP
from mvtb_tpu.ops.fused import StylizeConfig

REFERENCE_ROOT = "/root/reference"


def test_registry_covers_reference_scale():
    # the reference has ~90 script clones (SURVEY.md 2.3)
    assert len(REGISTRY) >= 90


def test_all_configs_well_formed():
    kinds = {"segmentation", "learnable_gibbs", "learnable_spikes", "dcgan",
             "recon_gan", "recon_gan_freq", "gibbs_gan"}
    for name, cfg in REGISTRY.items():
        assert cfg.name == name
        assert cfg.kind in kinds
        assert cfg.in_channels >= 1 and cfg.out_channels >= 1
        assert len(cfg.strides) == len(cfg.channels) - 1
        for sty in (cfg.train_stylize, cfg.val_stylize):
            if sty is not None:
                assert isinstance(sty, StylizeConfig)
                assert sty.any_enabled
        if cfg.select_channel is not None:
            ic, lc = cfg.select_channel
            assert 0 <= ic < 4 and 0 <= lc < 3
        assert 0 < cfg.epochs <= 400
        assert cfg.model_dtype in ("bfloat16", "float32")


def test_manifest_targets_resolve():
    for script, target in SCRIPT_MAP.items():
        assert target in REGISTRY, f"{script} -> {target} not in registry"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for script, target in LIBRARY_MAP.items():
        if target.startswith("mvtb_tpu"):
            path = os.path.join(repo, target.replace(".", os.sep))
            assert (os.path.isfile(path + ".py") or os.path.isdir(path)), \
                f"{script} -> module {target} missing"
        else:
            assert os.path.isfile(os.path.join(repo, target)), \
                f"{script} -> file {target} missing"


def test_manifest_covers_reference_tree():
    """When the reference checkout is present, the manifest must list every
    script under 10_scripts/ and 50_reconstruction/ — no silent gaps."""
    import glob

    import pytest

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference tree not present")
    found = set()
    for sub in ("10_scripts", "50_reconstruction"):
        for p in glob.glob(os.path.join(REFERENCE_ROOT, sub, "**", "*.py"),
                           recursive=True):
            found.add(os.path.relpath(p, REFERENCE_ROOT))
    # glob skips the hidden .ipynb_checkpoints entry; add it explicitly
    ckpt = "10_scripts/.ipynb_checkpoints/stylized_gibbs55-checkpoint.py"
    if os.path.isfile(os.path.join(REFERENCE_ROOT, ckpt)):
        found.add(ckpt)
    mapped = set(SCRIPT_MAP) | set(LIBRARY_MAP)
    missing = sorted(found - mapped)
    stale = sorted(mapped - found)
    assert not missing, f"unmapped reference scripts: {missing}"
    assert not stale, f"manifest entries with no reference file: {stale}"


def test_key_reference_families_present():
    names = set(REGISTRY)
    # one representative per SURVEY 2.3 family
    for required in ["baseline", "gibbs12p5", "planes14", "sap0p35", "wrap0",
                     "baseline_T2", "baseline_FLAIR", "gibbs12p5_FLAIR",
                     "gibbs12p5_spikes15_wrap0p5_sap0p05_FLAIR",
                     "baseline_domain", "gibbs35_spikes10_sap0p08_domain",
                     "domain_augment_alpha0p4", "gibbs0p7_layer_GD",
                     "spikes11_layer_GD", "dcgan", "recon_gan",
                     "recon_gan_freq", "gibbs_gan", "baseline_spleen",
                     "gibbs0p7_layer_GD_frozen"]:
        assert required in names, required


def test_fast_science_profile():
    """Round-3 VERDICT item 7: the measured fast profile for non-parity runs
    swaps batch->16 and fft_backend->plane_fast, leaving the parity config
    untouched."""
    from mvtb_tpu.experiments.registry import fast_science, get

    cfg = get("gibbs12p5")
    fcfg = fast_science(cfg)
    assert fcfg.batch_size == 16
    assert fcfg.name == "gibbs12p5_fast"
    assert fcfg.train_stylize.fft_backend == "plane_fast"
    assert fcfg.val_stylize.fft_backend == "plane_fast"
    # original untouched (frozen dataclass, but check anyway)
    assert cfg.batch_size == 2
    assert cfg.train_stylize.fft_backend == "auto"
    # configs without stylize stay valid
    base = fast_science(get("baseline"))
    assert base.train_stylize is None and base.batch_size == 16
