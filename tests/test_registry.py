"""Registry sanity: every experiment config is well-formed."""

from mvtb_tpu.experiments import REGISTRY
from mvtb_tpu.ops.fused import StylizeConfig


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
