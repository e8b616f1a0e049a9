"""Golden-value unit tests for core ops against torch semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from painter_tpu.ops.patches import patchify, unpatchify
from painter_tpu.ops.pos_embed import get_abs_pos, get_rel_pos
from painter_tpu.ops.resample import resize1d, resize2d
from painter_tpu.ops.norm import layer_norm
from painter_tpu.ops.windows import window_partition, window_unpartition

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest"])
@pytest.mark.parametrize("out", [(56, 28), (7, 9), (70, 35), (14, 14)])
def test_resize2d_matches_torch(mode, out):
    x = RNG.randn(2, 3, 14, 14).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out, mode=mode).numpy()
    got = np.asarray(resize2d(jnp.asarray(x.transpose(0, 2, 3, 1)), out,
                              mode)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize1d_linear_matches_torch():
    rp = RNG.randn(111, 64).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(rp).reshape(1, 111, -1)
                        .permute(0, 2, 1), size=139,
                        mode="linear").reshape(-1, 139).permute(1, 0).numpy()
    got = np.asarray(resize1d(jnp.asarray(rp), 139, "linear", axis=0))
    # torch computes interpolation weights in fp32; we compute them in fp64
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_patchify_matches_reference_ordering():
    # reference ordering: nchpwq->nhwpqc (models_painter.py:355-368)
    imgs = RNG.randn(2, 3, 32, 16).astype(np.float32)
    p = 8
    t = torch.from_numpy(imgs)
    w = 16 // p
    h = w * 2
    ref = t.reshape(2, 3, h, p, w, p)
    ref = torch.einsum("nchpwq->nhwpqc", ref).reshape(2, h * w, p * p * 3)
    got = patchify(jnp.asarray(imgs.transpose(0, 2, 3, 1)), p)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-6)


def test_patchify_roundtrip():
    imgs = jnp.asarray(RNG.randn(2, 64, 32, 3).astype(np.float32))
    x = patchify(imgs, 16)
    back = unpatchify(x, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(imgs))


def test_window_partition_roundtrip_with_padding():
    x = jnp.asarray(RNG.randn(2, 9, 5, 4).astype(np.float32))
    win, pad_hw = window_partition(x, 4)
    assert pad_hw == (12, 8)
    assert win.shape == (2 * 3 * 2, 4, 4, 4)
    back = window_unpartition(win, 4, pad_hw, (9, 5))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_layer_norm_matches_torch():
    x = RNG.randn(2, 7, 33).astype(np.float32)
    scale = RNG.randn(33).astype(np.float32)
    bias = RNG.randn(33).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (33,), torch.from_numpy(scale),
                       torch.from_numpy(bias), eps=1e-6).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), 1e-6))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_get_abs_pos_matches_torch_bicubic():
    # pretrained 14x14 + cls table -> non-square (8, 4) grid
    table = RNG.randn(197, 32).astype(np.float32)
    t = torch.from_numpy(table)[None, 1:]
    ref = F.interpolate(t.reshape(1, 14, 14, -1).permute(0, 3, 1, 2),
                        size=(8, 4), mode="bicubic",
                        align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(get_abs_pos(jnp.asarray(table), True, (8, 4)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("q_size,k_size,table_len", [
    (56, 56, 111),   # native
    (70, 70, 111),   # eval-resolution interpolation (COCO @560)
    (14, 14, 111),   # window derived from full-grid table
])
def test_get_rel_pos_matches_torch(q_size, k_size, table_len):
    table = RNG.randn(table_len, 16).astype(np.float32)
    # torch oracle (vitdet_utils.py:63-93)
    dist = 2 * max(q_size, k_size) - 1
    t = torch.from_numpy(table)
    if table_len != dist:
        t = F.interpolate(t.reshape(1, table_len, -1).permute(0, 2, 1),
                          size=dist, mode="linear")
        t = t.reshape(-1, dist).permute(1, 0)
    qc = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    ref = t[rel.long()].numpy()
    got = np.asarray(get_rel_pos(q_size, k_size, jnp.asarray(table)))
    np.testing.assert_allclose(got, ref, atol=5e-5)
