"""Textured synthetic data: the label signal must live in high-k texture
(destroyed by Gibbs filtering), with only a weak low-k offset surviving —
the property that makes the robustness-gain experiment falsifiable
(round-1 VERDICT 'what's weak' #1)."""

import numpy as np

from mvtb_tpu.data.synthetic import make_textured_volume

SPATIAL = (64, 64, 32)


def _volume(seed=0):
    rng = np.random.RandomState(seed)
    return make_textured_volume(rng, channels=1, spatial=SPATIAL, n_classes=3)


def _gibbs_lowpass(img, r=6.25):
    """Disk low-pass at the 128-grid-equivalent of the reference's r=12.5
    (half the grid here), reference geometry (center floor(n/2))."""
    k = np.fft.fftshift(np.fft.fftn(img))
    grids = np.ogrid[tuple(slice(0, n) for n in SPATIAL)]
    dist_sq = sum((g - n // 2) ** 2 for g, n in zip(grids, SPATIAL))
    return np.fft.ifftn(np.fft.ifftshift(k * (dist_sq < r * r))).real


def _highband_energy(img, lo=0.22):
    """Per-voxel squared magnitude above index radius ``lo * max(shape)/2``
    (the generator's band geometry)."""
    k = np.fft.fftn(img)
    grids = np.meshgrid(*[np.fft.fftfreq(n) * n for n in SPATIAL],
                        indexing="ij")
    r = np.sqrt(sum(g * g for g in grids)) / (max(SPATIAL) / 2.0)
    k_hi = np.where(r >= lo, k, 0.0)
    return np.abs(np.fft.ifftn(k_hi)) ** 2


def test_texture_discriminates_on_clean_data():
    img, lbl = _volume()
    wt = lbl[1].astype(bool)
    e = _highband_energy(img[0])
    ratio = e[~wt].mean() / e[wt].mean()
    # healthy tissue is texture-rich, tumor suppressed: strong local cue
    assert ratio > 2.0, f"high-band energy ratio only {ratio:.2f}"


def test_gibbs_filtering_destroys_the_texture_cue():
    img, lbl = _volume()
    wt = lbl[1].astype(bool)
    filtered = _gibbs_lowpass(img[0])
    e = _highband_energy(filtered)
    ratio = e[~wt].mean() / max(e[wt].mean(), 1e-12)
    # after the disk low-pass the high-band carries (next to) nothing
    assert e.mean() < 1e-6 * _highband_energy(img[0]).mean() + 1e-12 or \
        abs(np.log(ratio)) < 0.7, "texture cue survived the low-pass"


def test_offset_cue_survives_lowpass():
    """The designed offset component (in normalized units) must survive the
    Gibbs low-pass as a usable step; measured on the component directly since
    the anatomy band adds a random per-volume local level of similar size."""
    rng = np.random.RandomState(0)
    img, lbl, parts = make_textured_volume(rng, 1, SPATIAL, 3,
                                           return_parts=True)
    wt = lbl[1].astype(bool)
    off = _gibbs_lowpass(parts[0]["offset"])
    gap = off[wt].mean() - off[~wt].mean()
    assert gap > 0.2, f"surviving mean-offset cue too weak: {gap:.3f}"
    # ... while the texture component loses essentially all its energy
    tex = parts[0]["texture"]
    kept = _gibbs_lowpass(tex)
    assert (kept ** 2).mean() < 0.02 * (tex ** 2).mean()


def test_nested_labels_and_shapes():
    img, lbl = _volume(3)
    assert img.shape == (1,) + SPATIAL and lbl.shape == (3,) + SPATIAL
    tc, wt, et = lbl[0].astype(bool), lbl[1].astype(bool), lbl[2].astype(bool)
    assert et.sum() > 0 and (et & ~tc).sum() == 0 and (tc & ~wt).sum() == 0
    assert np.isfinite(img).all()
    # per-channel normalization
    assert abs(img[0].mean()) < 1e-3 and abs(img[0].std() - 1.0) < 1e-2


def test_volumes_differ_per_draw():
    rng = np.random.RandomState(0)
    a, la = make_textured_volume(rng, 1, SPATIAL)
    b, lb = make_textured_volume(rng, 1, SPATIAL)
    assert np.abs(a - b).max() > 0.5
    assert not np.array_equal(la, lb)


# ---------------------------------------------------------------------------
# Textured hospital domains (institutional-distribution experiment)
# ---------------------------------------------------------------------------

def _band_energy(img, band, spatial):
    k = np.fft.fftn(img)
    grids = np.meshgrid(*[np.fft.fftfreq(n) * n for n in spatial],
                        indexing="ij")
    r = np.sqrt(sum(g * g for g in grids)) / (max(spatial) / 2.0)
    sel = (r >= band[0]) & (r < band[1])
    return (np.abs(k[sel]) ** 2).sum() / (np.abs(k) ** 2).sum()


def test_hospital_signature_lives_in_its_own_band():
    """Each hospital's texture energy concentrates in its own band, and the
    holdout band is disjoint from every training band — the domain shift the
    stylization is supposed to erase."""
    from mvtb_tpu.data.tcga import _HOSPITAL_BANDS, textured_hospital_samples

    spatial = (32, 32, 16)
    bands = _HOSPITAL_BANDS
    hi = max(b[1] for b in bands.values())
    assert all(bands["holdout"][0] >= b[1] for k, b in bands.items()
               if k != "holdout"), "holdout band overlaps a training band"
    for hospital, band in bands.items():
        s = textured_hospital_samples(hospital, 2, seed=3, spatial=spatial)[0]
        img = s["image"][0]
        own = _band_energy(img, band, spatial)
        others = [_band_energy(img, b, spatial)
                  for k, b in bands.items() if k != hospital]
        assert own > 2.5 * max(others), (hospital, own, others)
        assert s["label"].shape == (1,) + spatial
        assert s["label"].max() == 1.0


def test_disk_filter_erases_hospital_signature():
    """After the (scaled) flagship disk low-pass, the hospital band carries
    (next to) no energy — stylization removes the domain-specific cue."""
    from mvtb_tpu.data.tcga import _HOSPITAL_BANDS, textured_hospital_samples

    spatial = (32, 32, 16)
    for hospital in ("hospital_A", "holdout"):
        s = textured_hospital_samples(hospital, 1, seed=5, spatial=spatial)[0]
        img = s["image"][0]
        # r=12.5 on the 128 grid scales to 12.5 * (32/128) here
        k = np.fft.fftshift(np.fft.fftn(img))
        grids = np.ogrid[tuple(slice(0, n) for n in spatial)]
        d2 = sum((g - n // 2) ** 2 for g, n in zip(grids, spatial))
        filt = np.fft.ifftn(np.fft.ifftshift(k * (d2 < 3.125 ** 2))).real
        band = _HOSPITAL_BANDS[hospital]
        before = _band_energy(img, band, spatial)
        after = _band_energy(filt, band, spatial)
        assert after < 0.02 * before, (hospital, before, after)


def test_textured_domain_loaders_protocol():
    from mvtb_tpu.data.tcga import domain_loaders

    train, vals = domain_loaders(batch_size=2, n_per_hospital=4, seed=0,
                                 spatial=(16, 16, 8), kind="textured")
    assert set(vals) == {"hospital_A", "hospital_B", "hospital_C", "holdout"}
    batch = next(iter(train))
    assert batch["image"].shape == (2, 1, 16, 16, 8)
    assert batch["label"].shape == (2, 1, 16, 16, 8)
    hold = next(iter(vals["holdout"]))
    assert hold["image"].shape[1:] == (1, 16, 16, 8)


def test_generate_pool_disk_cache_roundtrip(tmp_path):
    """Pool generation is a pure function of its key; the disk cache returns
    bit-identical arrays and survives a second call (round-4: every launch
    was paying ~240 s of 1-core pool synthesis, resumes included)."""
    from mvtb_tpu.data.synthetic import generate_pool

    a = generate_pool(7, 3, 2, (16, 16, 8), 1, "textured",
                      cache_dir=str(tmp_path))
    # key carries a generator-source tag so cached pools invalidate when
    # the generator changes (round-4 ADVICE item 3)
    files = list(tmp_path.glob("textured_s7_n3_c2_16x16x8_k1_g*.npz"))
    assert len(files) == 1
    b = generate_pool(7, 3, 2, (16, 16, 8), 1, "textured",
                      cache_dir=str(tmp_path))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # uncached call gives the same volumes (cache is transparent)
    c = generate_pool(7, 3, 2, (16, 16, 8), 1, "textured", cache_dir=None)
    np.testing.assert_array_equal(a[0], c[0])


def test_generate_pool_cache_invalidates_on_generator_change(tmp_path, monkeypatch):
    """A changed generator source must MISS the old cache entry."""
    from mvtb_tpu.data import synthetic

    a = synthetic.generate_pool(7, 2, 1, (8, 8, 4), 1, "textured",
                                cache_dir=str(tmp_path))
    n0 = len(list(tmp_path.glob("*.npz")))

    def other_gen(rng, channels, spatial, n_classes):  # new source text
        return synthetic.make_textured_volume(rng, channels, spatial,
                                              n_classes)

    monkeypatch.setitem(synthetic._GENERATORS, "textured", other_gen)
    b = synthetic.generate_pool(7, 2, 1, (8, 8, 4), 1, "textured",
                                cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("*.npz"))) == n0 + 1  # fresh entry
    np.testing.assert_array_equal(a[0], b[0])  # same function -> same pool
