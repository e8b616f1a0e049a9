"""Fused decoder-head kernel parity (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from painter_tpu.kernels.decoder_head import fused_decoder_tail
from painter_tpu.ops.norm import layer_norm

RNG = np.random.RandomState(0)


def _shuffle(t, gh, gw, p, dec):
    b = t.shape[0]
    return t.reshape(b, gh, gw, p, p, dec).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(b, gh * p, gw * p, dec)


def _xla_tail(x, c1k, c1b, lns, lnb, c2k, c2b, approx):
    x = jax.lax.conv_general_dilated(
        x, c1k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + c1b.astype(x.dtype)
    x = layer_norm(x, lns, lnb, eps=1e-6)
    x = jax.nn.gelu(x, approximate=approx)
    x = jax.lax.conv_general_dilated(
        x, c2k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + c2b.astype(x.dtype)
    return x


def _inputs(b=2, gh=4, gw=3, p=4, dec=8, dtype=jnp.float32):
    t = _shuffle(jnp.asarray(RNG.randn(b, gh, gw, p * p * dec), dtype),
                 gh, gw, p, dec)
    c1k = jnp.asarray(0.2 * RNG.randn(3, 3, dec, dec), jnp.float32)
    c1b = jnp.asarray(0.1 * RNG.randn(dec), jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * RNG.randn(dec), jnp.float32)
    lnb = jnp.asarray(0.1 * RNG.randn(dec), jnp.float32)
    c2k = jnp.asarray(0.2 * RNG.randn(1, 1, dec, 3), jnp.float32)
    c2b = jnp.asarray(0.1 * RNG.randn(3), jnp.float32)
    return t, c1k, c1b, lns, lnb, c2k, c2b


@pytest.mark.parametrize("approx", [False, True])
def test_fused_decoder_head_forward(approx):
    gh, gw, p, dec = 4, 3, 4, 8
    args = _inputs(gh=gh, gw=gw, p=p, dec=dec)
    ref = _xla_tail(*args, approx)
    got = fused_decoder_tail(*args, approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_fused_decoder_head_single_token_row_grid():
    # H=12 -> rows_blk falls back to 12; exercises the divisor chain
    gh, gw, p, dec = 3, 2, 4, 8
    args = _inputs(gh=gh, gw=gw, p=p, dec=dec)
    ref = _xla_tail(*args, True)
    got = fused_decoder_tail(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("approx", [False, True])
def test_fused_decoder_head_gradients(approx):
    gh, gw, p, dec = 4, 3, 4, 8
    args = _inputs(gh=gh, gw=gw, p=p, dec=dec)
    w = jnp.asarray(RNG.randn(2, gh * p, gw * p, 3), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(w * fused_decoder_tail(*a, approx))

    def loss_ref(*a):
        return jnp.sum(w * _xla_tail(*a, approx))

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dt", "dconv1_k", "dconv1_b", "dln_s", "dln_b", "dconv2_k",
             "dconv2_b"]
    for a, b, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, err_msg=name)


def test_fused_decoder_head_bf16_close_to_fp32():
    gh, gw, p, dec = 4, 3, 4, 8
    args = _inputs(gh=gh, gw=gw, p=p, dec=dec)
    ref = fused_decoder_tail(*args, True)
    args_b = (args[0].astype(jnp.bfloat16),) + args[1:]
    got = fused_decoder_tail(*args_b, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=0.15)


def test_train_step_fused_decoder_matches_xla():
    """Full train step with the fused decoder head == plain XLA."""
    from painter_tpu import configs
    from painter_tpu.train import optim, step as step_lib
    from painter_tpu.models import incontext_vit as m

    cfg = configs.tiny_test_config(drop_path_rate=0.0)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    oc = optim.OptimConfig(lr=1e-3, warmup_epochs=0, epochs=1,
                           steps_per_epoch=1, clip_grad=None)
    optimizer = optim.make_optimizer(params, cfg, oc)
    h, w = cfg.img_size
    length = cfg.num_patches
    mask = np.zeros((4, length), np.float32)
    mask[:, length // 2:] = 1
    batch = {
        "imgs": jnp.asarray(RNG.randn(4, h, w, 3), jnp.float32),
        "tgts": jnp.asarray(RNG.randn(4, h, w, 3), jnp.float32),
        "mask": jnp.asarray(mask),
        "valid": jnp.ones((4, h, w, 3), jnp.float32),
    }
    outs = {}
    for impl in ("xla", "fused", "packed"):
        state = step_lib.init_train_state(
            jax.tree_util.tree_map(jnp.copy, params), optimizer)
        step = jax.jit(step_lib.make_train_step(cfg, optimizer,
                                                decoder_impl=impl))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        outs[impl] = (float(metrics["loss"]), state["params"])
    for impl in ("fused", "packed"):
        np.testing.assert_allclose(outs["xla"][0], outs[impl][0],
                                   rtol=1e-5)
        fx = jax.tree_util.tree_leaves(outs["xla"][1])
        ff = jax.tree_util.tree_leaves(outs[impl][1])
        for a, b in zip(fx, ff):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_packed_decoder_matches_xla_fp32():
    """forward_decoder packed == xla, fp32 (tight) + grads."""
    from painter_tpu import configs
    from painter_tpu.models import incontext_vit as m

    cfg = configs.tiny_test_config(drop_path_rate=0.0, dtype="float32")
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    gh, gw = cfg.grid_size
    d = cfg.embed_dim
    feats = [jnp.asarray(RNG.randn(2, gh, gw, d), jnp.float32) * 0.2
             for _ in range(4)]
    wsum = jnp.asarray(RNG.randn(2, *cfg.img_size, 3), jnp.float32)

    def loss(p, impl):
        return jnp.sum(wsum * m.forward_decoder(p, cfg, feats,
                                                decoder_impl=impl))

    ref, gref = jax.value_and_grad(loss)(params, "xla")
    got, ggot = jax.value_and_grad(loss)(params, "packed")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gref),
                    jax.tree_util.tree_leaves(ggot)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
