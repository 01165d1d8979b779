"""Perceptual (VGG/LPIPS) matcher tests.

Covers the TPU re-design of the reference notebook's perceptual window
search (perceptual_window_search/Perceptual_window_search.ipynb cells
6-10): feature tower shapes, LPIPS normalization, cost-volume validity
and shift recovery, the notebook's multiplicative smoothing, weight
save/load/convert, and the pipeline dispatch (MatcherConfig.cost ==
"perceptual").
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_reconstruction_tpu.config import PerceptualConfig, PipelineConfig
from stereo_reconstruction_tpu.perceptual import (
    get_params,
    init_vgg16_params,
    load_params_npz,
    lpips_cost_volume,
    perceptual_window_search,
    save_params_npz,
    vgg16_features,
)
from stereo_reconstruction_tpu.perceptual.cost import perceptual_smooth_argmin
from stereo_reconstruction_tpu.perceptual.vgg import (
    STAGE_CHANNELS,
    STAGE_STRIDES,
    convert_torch_lpips,
    normalize_features,
)


@pytest.fixture(scope="module")
def params():
    return init_vgg16_params(seed=0)


def test_vgg_feature_shapes(params):
    img = jnp.zeros((64, 96, 3))
    stages = vgg16_features(params, img)
    assert len(stages) == 5
    for feat, ch, stride in zip(stages, STAGE_CHANNELS, STAGE_STRIDES):
        assert feat.shape == (ch, 64 // stride, 96 // stride)


def test_normalize_features_unit_norm(rng):
    feat = jnp.asarray(rng.normal(size=(8, 5, 7)), jnp.float32)
    n = normalize_features(feat)
    norms = np.asarray(jnp.linalg.norm(n, axis=0))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_cost_volume_validity_mask(params, rng):
    h, w, D = 32, 48, 8
    left = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    cfg = PerceptualConfig(max_disparity=D, window_size=5)
    vol = np.asarray(lpips_cost_volume(params, left, right, cfg))
    assert vol.shape == (D, h, w)
    # candidates x + d beyond the left image are +inf (notebook's candidate
    # band is clipped at the image edge, cell 10)
    for d in range(D):
        assert np.all(np.isinf(vol[d, :, w - d:])) if d > 0 else True
        assert np.all(np.isfinite(vol[d, :, : w - d]))


def test_cost_volume_recovers_uniform_shift(params, rng):
    """right = left shifted by d0 -> plain argmin lands on d0."""
    h, w, d0, D = 40, 96, 8, 16
    base = rng.integers(0, 255, (h, w + D, 3)).astype(np.float32)
    left = jnp.asarray(base[:, :w])
    # right-image disparity candidates compare left[x + d] to right[x];
    # with right[x] = base[x + d0] = left[x + d0], the argmin is d0.
    right = jnp.asarray(base[:, d0 : w + d0])
    cfg = PerceptualConfig(max_disparity=D, window_size=5)
    vol = np.asarray(lpips_cost_volume(params, left, right, cfg))
    interior = vol[:, 4 : h - 4, 4 : w - D - 4]
    argmin = np.argmin(interior, axis=0)
    # allow boundary/interpolation stragglers; the bulk must hit d0
    assert np.mean(np.abs(argmin - d0) <= 1) > 0.9


def test_smoothing_matches_notebook_formula():
    """One row, two sweeps: the in-row term must reweight exactly by
    weight(i) = (1 - exp(-|i - prev| / sigma)) + bias (notebook cell 8)."""
    D, w = 4, 3
    bias, sigma = 0.85, 25.0
    cost = np.full((D, 1, w), 10.0, np.float32)
    # x=0 picks d=2 outright; x=1 has a near-tie that the in-row weight
    # around prev=2 must resolve toward d=2.
    cost[:, 0, 0] = [10.0, 10.0, 1.0, 10.0]
    cost[:, 0, 1] = [10.0, 2.0, 2.05, 10.0]
    cfg = PerceptualConfig(max_disparity=D, smoothing_bias=bias,
                           smoothing_sigma=sigma)
    disp = np.asarray(perceptual_smooth_argmin(jnp.asarray(cost), cfg, iters=2))
    assert disp[0, 0] == 2
    # hand evaluation: weight(d=1|prev 2) * 2.0 vs weight(d=2|prev 2) * 2.05
    w1 = (1 - np.exp(-1 / sigma)) + bias
    w2 = (1 - np.exp(0)) + bias
    assert (w2 * 2.05 < w1 * 2.0) and disp[0, 1] == 2


def test_perceptual_window_search_end_to_end(params, rng):
    h, w, D = 32, 64, 8
    left = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    cfg = PerceptualConfig(max_disparity=D, window_size=5)
    disp = np.asarray(perceptual_window_search(params, left, right, cfg))
    assert disp.shape == (h, w)
    assert np.all(np.isfinite(disp))
    assert disp.min() >= 0 and disp.max() < D


def test_params_npz_roundtrip(params, tmp_path):
    path = str(tmp_path / "vgg.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    assert len(loaded["convs"]) == 5
    for b_orig, b_load in zip(params["convs"], loaded["convs"]):
        for (w0, b0), (w1, b1) in zip(b_orig, b_load):
            np.testing.assert_array_equal(np.asarray(w0), w1)
            np.testing.assert_array_equal(np.asarray(b0), b1)
    for l0, l1 in zip(params["lins"], loaded["lins"]):
        np.testing.assert_array_equal(np.asarray(l0), l1)
    # get_params caches per path
    assert get_params(path) is get_params(path)


def test_convert_torch_lpips_layout(rng):
    conv_idx = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
    chans = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
    state = {}
    for bi, idxs in enumerate(conv_idx):
        in_ch, out_ch = chans[bi]
        for j, idx in enumerate(idxs):
            ic = in_ch if j == 0 else out_ch
            state[f"net.slice{bi+1}.{idx}.weight"] = rng.normal(
                size=(out_ch, ic, 3, 3)
            ).astype(np.float32)
            state[f"net.slice{bi+1}.{idx}.bias"] = np.zeros(out_ch, np.float32)
    for li, ch in enumerate(STAGE_CHANNELS):
        state[f"lins.{li}.model.1.weight"] = rng.uniform(
            size=(1, ch, 1, 1)
        ).astype(np.float32)
    params = convert_torch_lpips(state)
    assert [len(b) for b in params["convs"]] == [2, 2, 3, 3, 3]
    assert [lin.shape[0] for lin in params["lins"]] == list(STAGE_CHANNELS)
    np.testing.assert_array_equal(
        params["convs"][0][0][0], state["net.slice1.0.weight"]
    )


def test_pipeline_dispatch_perceptual(rng):
    """compute_disparity routes cost=='perceptual' through the LPIPS search."""
    from stereo_reconstruction_tpu.pipeline import compute_disparity

    config = PipelineConfig()
    config = config.replace(
        matcher=dataclasses.replace(config.matcher, cost="perceptual",
                                    max_disparity=8),
        perceptual=dataclasses.replace(config.perceptual, window_size=5),
    )
    left = jnp.asarray(rng.integers(0, 255, (32, 48, 3)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (32, 48, 3)), jnp.float32)
    disp = np.asarray(compute_disparity(left, right, config))
    assert disp.shape == (32, 48)
    assert disp.max() < 8


@pytest.mark.slow
def test_windowed_search_matches_notebook_oracle_exactly(params, rng):
    """windowed_lpips_search IS the notebook's per-window semantics as one
    device program (VERDICT r2 item 3): on a small pair with identical
    He-init weights it must track the literal notebook oracle to f32-vs-
    f64 score noise — gated at 100% 2px / >=98% exact agreement."""
    from stereo_reconstruction_tpu.perceptual import windowed_lpips_search
    from stereo_reconstruction_tpu.perceptual.notebook_oracle import (
        notebook_window_search,
    )

    h, w, D = 10, 44, 12
    left = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    # right = left shifted 4 px with noise (plausible candidates exist)
    right = np.roll(left, -4, axis=1)
    right += rng.normal(0, 4, right.shape).astype(np.float32)
    right = np.clip(right, 0, 255)

    cfg = PerceptualConfig(window_size=17, padding=8, max_disparity=D,
                           chunk=20, mode="windowed")
    got = np.asarray(windowed_lpips_search(
        params, jnp.asarray(left), jnp.asarray(right), cfg))
    want = notebook_window_search(
        params, left, right, window=17, padding=8, max_disparity=D,
        chunk=20)
    agree_exact = float((got == want).mean())
    agree_2px = float((np.abs(got - want) <= 2.0).mean())
    assert agree_2px == 1.0, f"2px agreement only {agree_2px:.4f}"
    assert agree_exact >= 0.98, f"exact agreement only {agree_exact:.4f}"


@pytest.mark.slow
def test_perceptual_mode_dispatch(params, rng):
    """perceptual_window_search routes on config.mode."""
    from stereo_reconstruction_tpu.perceptual import windowed_lpips_search

    h, w, D = 32, 48, 6
    left = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    right = jnp.asarray(rng.integers(0, 255, (h, w, 3)), jnp.float32)
    cfg_w = PerceptualConfig(max_disparity=D, mode="windowed")
    cfg_f = PerceptualConfig(max_disparity=D, mode="full_image")
    dw = np.asarray(perceptual_window_search(params, left, right, cfg_w))
    np.testing.assert_array_equal(
        dw, np.asarray(windowed_lpips_search(params, left, right, cfg_w)))
    df = np.asarray(perceptual_window_search(params, left, right, cfg_f))
    assert df.shape == dw.shape
