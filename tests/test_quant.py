"""Int8 (w8a8) serving-path tests: quantizer contracts + model parity.

The int8 path is a beyond-reference serving mode (ops/quant.py); these
tests pin the quantization math and bound the model-level deviation the
mode introduces on CPU. The speed claim is measured on-chip (BASELINE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m
from painter_tpu.ops import quant

RNG = np.random.RandomState(7)


def test_weight_quant_roundtrip_error_bound():
    """Dequantized weights differ by at most half a step per element."""
    lp = {"kernel": jnp.asarray(RNG.randn(4, 16, 24), jnp.float32),
          "bias": jnp.zeros((4, 24), jnp.float32)}
    qp = quant.quantize_linear_params(lp)
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["kernel_q"].shape == (4, 16, 24)
    assert qp["scale"].shape == (4, 24)
    deq = np.asarray(qp["kernel_q"], np.float32) * \
        np.asarray(qp["scale"])[:, None, :]
    step = np.asarray(qp["scale"])[:, None, :]
    assert (np.abs(deq - np.asarray(lp["kernel"])) <= 0.5 * step + 1e-7).all()


def test_int8_linear_matches_fp_within_quant_noise():
    x = jnp.asarray(RNG.randn(32, 64), jnp.float32)
    lp = {"kernel": jnp.asarray(RNG.randn(64, 48) * 0.05, jnp.float32),
          "bias": jnp.asarray(RNG.randn(48) * 0.01, jnp.float32)}
    ref = np.asarray(quant.linear(lp, x))
    got = np.asarray(quant.linear(quant.quantize_linear_params(lp), x))
    # w8a8 with per-row/per-channel scales: ~1% relative Frobenius error
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    assert np.isfinite(got).all()


def test_int8_linear_zero_row_safe():
    """An all-zero activation row must not divide by zero."""
    x = jnp.zeros((4, 16), jnp.float32)
    lp = quant.quantize_linear_params(
        {"kernel": jnp.asarray(RNG.randn(16, 8), jnp.float32),
         "bias": jnp.asarray(RNG.randn(8), jnp.float32)})
    out = np.asarray(quant.int8_linear(x, lp))
    np.testing.assert_allclose(out, np.broadcast_to(
        np.asarray(lp["bias"]), out.shape), atol=1e-6)


def test_quantize_params_targets_and_sharing():
    cfg = configs.tiny_test_config()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    pq = quant.quantize_params(params)
    # default = measured-optimal mlp-only (quant.DEFAULT_TARGETS)
    assert "kernel_q" in pq["blocks"]["mlp"]["fc1"]
    assert "kernel_q" in pq["blocks"]["mlp"]["fc2"]
    assert "kernel_q" not in pq["blocks"]["attn"]["qkv"]
    assert "kernel_q" not in pq["decoder_embed"]
    # stacked depth axis preserved
    assert pq["blocks"]["mlp"]["fc1"]["kernel_q"].shape[0] == cfg.depth
    # untargeted leaves are shared (same object), original pytree intact
    assert pq["patch_embed"]["kernel"] is params["patch_embed"]["kernel"]
    assert "kernel" in params["blocks"]["mlp"]["fc1"]
    # explicit full targeting still available
    pq2 = quant.quantize_params(params, targets=("attn", "mlp", "dec"))
    assert "kernel_q" in pq2["blocks"]["attn"]["qkv"]
    assert "kernel_q" in pq2["decoder_embed"]
    with pytest.raises(ValueError):
        quant.quantize_params(params, targets=("bogus",))


@pytest.mark.parametrize("seg_type_tokens", [False, True])
def test_quantized_model_close_to_fp(seg_type_tokens):
    """Full tiny-model forward through the scanned trunk with int8 gemms:
    runs, finite, and stays near the fp forward (painted-pixel scale)."""
    cfg = configs.tiny_test_config(seg_type_tokens=seg_type_tokens)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    H, W = cfg.img_size
    L = cfg.num_patches
    imgs = jnp.asarray(RNG.randn(2, H, W, 3) * 0.5, jnp.float32)
    tgts = jnp.asarray(RNG.randn(2, H, W, 3) * 0.5, jnp.float32)
    mask = jnp.zeros((2, L)).at[:, L // 2:].set(1.0)

    ref = np.asarray(m.predict_image(params, cfg, imgs, tgts, mask))
    got = np.asarray(m.predict_image(quant.quantize_params(params), cfg,
                                     imgs, tgts, mask))
    assert np.isfinite(got).all()
    err = np.abs(got - ref).max()
    # normalized-pixel units; tiny random-init model, 6 blocks of int8
    # noise accumulation. Flagship-scale deviation is measured on-chip
    # and recorded in BASELINE.md.
    assert err < 0.15, err
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_quantized_query_half_batch_runs():
    cfg = configs.tiny_test_config()
    params = quant.quantize_params(m.init_params(jax.random.PRNGKey(1), cfg))
    H, W = cfg.img_size
    L = cfg.num_patches
    imgs = jnp.asarray(RNG.randn(3, H, W, 3), jnp.float32)
    mask = jnp.zeros((3, L)).at[:, L // 2:].set(1.0)
    out = m.predict_query_half_batch(params, cfg, imgs, imgs, mask)
    assert out.shape == (3, H // 2, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def _mk_mlp(k, n, wscale=0.05):
    fc1 = {"kernel": jnp.asarray(RNG.randn(k, n) * wscale, jnp.float32),
           "bias": jnp.asarray(RNG.randn(n) * 0.05, jnp.float32)}
    fc2 = {"kernel": jnp.asarray(RNG.randn(n, k) * wscale, jnp.float32),
           "bias": jnp.asarray(RNG.randn(k) * 0.05, jnp.float32)}
    return fc1, fc2


@pytest.mark.parametrize("block_m", [64, 96])  # 96: ragged 224 % 96 != 0
def test_fused_mlp_kernel_matches_unfused(block_m):
    """Interpret-mode fused kernel == the unfused int8 XLA path, up to
    the fp32-vs-bf16 intermediate difference (fused is the more exact)."""
    from painter_tpu.kernels.int8_mlp import int8_mlp
    k, n = 128, 256
    fc1, fc2 = _mk_mlp(k, n)
    q1 = quant.quantize_linear_params(fc1)
    q2 = quant.quantize_linear_params(fc2)
    x = jnp.asarray(RNG.randn(2, 112, k), jnp.bfloat16)  # 3D leading dims

    fused = np.asarray(
        int8_mlp(x, q1, q2, block_m=block_m, interpret=True), np.float32)
    h = quant.linear(q1, x)
    h = jax.nn.gelu(h, approximate=True)
    unfused = np.asarray(quant.linear(q2, h), np.float32)
    ref = jnp.asarray(x, jnp.float32) @ fc1["kernel"] + fc1["bias"]
    ref = jax.nn.gelu(ref, approximate=True)
    ref = np.asarray(ref @ fc2["kernel"] + fc2["bias"])

    assert fused.shape == (2, 112, k)
    assert np.isfinite(fused).all()
    scale = np.abs(ref).max()
    assert np.abs(fused - unfused).max() / scale < 0.02
    # fused (fp32 intermediates) must not be less accurate than unfused
    assert (np.abs(fused - ref).max() <=
            np.abs(unfused - ref).max() + 0.005 * scale)


def test_fused_mlp_zero_rows_safe():
    from painter_tpu.kernels.int8_mlp import int8_mlp
    k, n = 128, 256
    fc1, fc2 = _mk_mlp(k, n)
    q1 = quant.quantize_linear_params(fc1)
    q2 = quant.quantize_linear_params(fc2)
    x = jnp.zeros((64, k), jnp.bfloat16)
    out = np.asarray(int8_mlp(x, q1, q2, block_m=32, interpret=True),
                     np.float32)
    # zero input -> gelu(b1) @ W2 + b2, no NaN from the 0/absmax guards
    assert np.isfinite(out).all()
    ref = jax.nn.gelu(jnp.asarray(fc1["bias"]), approximate=True) \
        @ fc2["kernel"] + fc2["bias"]
    assert np.abs(out - np.asarray(ref)).max() < 0.05


def test_quant_mlp_dispatch_and_exact_gelu_fallback(monkeypatch):
    """quant.mlp: exact-erf GELU always takes the unfused path (the
    kernel is tanh-only), and the CPU backend never calls the kernel."""
    k, n = 64, 128
    fc1, fc2 = _mk_mlp(k, n)
    q1 = quant.quantize_linear_params(fc1)
    q2 = quant.quantize_linear_params(fc2)
    x = jnp.asarray(RNG.randn(8, k), jnp.float32)
    # force "fused": on CPU this would crash inside pallas_call if the
    # gelu_approx=False guard did not fall back to the unfused path
    monkeypatch.setattr(quant, "MLP_IMPL", "fused")
    out = quant.mlp(q1, q2, x, gelu_approx=False)
    h = quant.linear(q1, x)
    h = jax.nn.gelu(h, approximate=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(quant.linear(q2, h)), atol=1e-6)
    # "auto" on the CPU test backend -> unfused, tanh flavor
    monkeypatch.setattr(quant, "MLP_IMPL", "auto")
    out2 = quant.mlp(q1, q2, x, gelu_approx=True)
    assert np.isfinite(np.asarray(out2)).all()


def test_default_block_m_prefers_divisors():
    from painter_tpu.kernels.int8_mlp import default_block_m
    assert default_block_m(12544) == 896   # b8 flagship: 896 | 12544
    assert default_block_m(1568) == 784    # b1 flagship
    assert 12544 % default_block_m(12544) == 0
    assert default_block_m(12545) == 512   # ragged fallback


def test_engine_and_cli_quant_plumbing(tmp_path):
    """--quant int8 flows from the CLIs into a quantized engine that
    serves an image end-to-end (ensemble path included)."""
    from PIL import Image
    from painter_tpu.infer import engine
    from painter_tpu.infer.seggpt_cli import prepare_model

    model = prepare_model(None, "tiny_test", "semantic", quant="int8")
    assert quant.is_quantized(model.params["blocks"]["mlp"]["fc1"])

    rng = np.random.RandomState(0)
    def w(p, color=None):
        arr = (rng.rand(20, 24, 3) * 255).astype(np.uint8) if color is None \
            else np.full((20, 24, 3), color, np.uint8)
        Image.fromarray(arr).save(p)
        return str(p)

    img = w(tmp_path / "q.png")
    p1 = w(tmp_path / "p1.png")
    t1 = w(tmp_path / "t1.png", color=255)
    out = engine.inference_image(model, img, [p1], [t1],
                                 str(tmp_path / "o.png"),
                                 res=model.cfg.img_size[1])
    assert np.isfinite(out).all()
