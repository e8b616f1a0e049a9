"""Native C++ image ops: build, parity vs the numpy paths, fallback."""
import numpy as np
import pytest

from painter_tpu import native
from painter_tpu.configs import IMAGENET_MEAN, IMAGENET_STD
from painter_tpu.data import transforms as T

RNG = np.random.RandomState(0)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_color_jitter_matches_numpy():
    arr = RNG.rand(37, 23, 3).astype(np.float32)
    order = np.asarray([3, 0, 2, 1], np.int32)
    factors = np.asarray([0.07, 1.2, 0.85, 1.1], np.float32)
    ref = arr.copy()
    fns = (T.adjust_brightness, T.adjust_contrast, T.adjust_saturation,
           T.adjust_hue)
    for o, f in zip(order, factors):
        ref = fns[o](ref, float(f))
    got = native.color_jitter_inplace(arr.copy(), order, factors)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_color_jitter_skip_slots():
    arr = RNG.rand(16, 16, 3).astype(np.float32)
    order = np.asarray([0, 1, 2, 3], np.int32)
    factors = np.asarray([np.nan, np.nan, np.nan, -0.09], np.float32)
    ref = T.adjust_hue(arr.copy(), -0.09)
    got = native.color_jitter_inplace(arr.copy(), order, factors)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_normalize_matches_numpy():
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    u8 = RNG.randint(0, 256, (19, 31, 3), np.uint8)
    ref = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(native.normalize(u8, mean, std), ref,
                               atol=1e-6)
    f32 = RNG.rand(19, 31, 3).astype(np.float32)
    ref = (f32 - mean) / std
    np.testing.assert_allclose(native.normalize(f32, mean, std), ref,
                               atol=1e-6)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("out_hw", [(17, 40), (64, 9)])
def test_resize_matches_dense_matmul(mode, out_hw):
    from painter_tpu.ops.resample import nearest_indices, resize_weights
    x = RNG.rand(29, 21, 3).astype(np.float32)
    got = native.resize_hwc(x, out_hw, mode)
    if mode == "nearest":
        ref = x[nearest_indices(29, out_hw[0])][:,
                                                nearest_indices(21, out_hw[1])]
    else:
        m = {"bicubic": "cubic", "bilinear": "linear"}[mode]
        wh = resize_weights(29, out_hw[0], m).astype(np.float32)
        ww = resize_weights(21, out_hw[1], m).astype(np.float32)
        y = np.tensordot(wh, x, axes=(1, 0))
        ref = np.tensordot(ww, y, axes=(1, 1)).transpose(1, 0, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_identity_size():
    x = RNG.rand(12, 12, 3).astype(np.float32)
    np.testing.assert_allclose(native.resize_hwc(x, (12, 12), "bicubic"),
                               x, atol=1e-6)


def test_pipeline_native_vs_fallback_identical_draws():
    """PairColorJitter with the same seed produces the same image (to
    rounding) through the native and numpy paths."""
    from PIL import Image
    img = Image.fromarray(RNG.randint(0, 256, (32, 32, 3), np.uint8))
    jit = T.PairColorJitter(0.4, 0.4, 0.2, 0.1, p=1.0)
    a1, _ = jit(img, img, np.random.default_rng(7))
    native.set_enabled(False)
    try:
        a2, _ = jit(img, img, np.random.default_rng(7))
    finally:
        native.set_enabled(True)
    d = np.abs(np.asarray(a1, np.int16) - np.asarray(a2, np.int16))
    assert d.max() <= 1  # one uint8 step of rounding skew at most


def test_array_rrc_native_matches_fallback():
    x = RNG.rand(64, 48, 3).astype(np.float32)
    rrc = T.ArrayRandomResizedCrop((32, 24), scale=(0.5, 1.0))
    a1, _ = rrc(x, x, np.random.default_rng(3))
    native.set_enabled(False)
    try:
        a2, _ = rrc(x, x, np.random.default_rng(3))
    finally:
        native.set_enabled(True)
    np.testing.assert_allclose(a1, a2, atol=1e-5)
