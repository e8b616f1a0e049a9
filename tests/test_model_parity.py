"""End-to-end numerical parity of the JAX model vs the torch oracle.

The oracle (tests/torch_ref.py) implements the reference math
(models_painter.py / models_seggpt.py) in float64 over our param pytree;
the JAX model runs fp32, so we accept ~1e-4 absolute error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m
from painter_tpu.ops.patches import unpatchify

from torch_ref import torch_forward

RNG = np.random.RandomState(42)


def _mk(cfg, batch=2, img_size=None):
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    # randomize the zero-init rel-pos tables so the bias path is exercised
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    h, w = img_size or cfg.img_size
    imgs = RNG.randn(batch, h, w, 3).astype(np.float32)
    tgts = RNG.randn(batch, h, w, 3).astype(np.float32)
    num_patches = (h // cfg.patch_size) * (w // cfg.patch_size)
    mask = np.zeros((batch, num_patches), np.float32)
    mask[:, num_patches // 2:] = 1.0
    valid = np.ones((batch, h, w, 3), np.float32)
    return params, imgs, tgts, mask, valid


def _compare(cfg, params, imgs, tgts, mask, valid, seg_type=None,
             merge_between_batch=-1, atol=2e-4):
    loss, pred_patches, _ = m.forward(
        params, cfg, jnp.asarray(imgs), jnp.asarray(tgts), jnp.asarray(mask),
        jnp.asarray(valid),
        seg_type=None if seg_type is None else jnp.asarray(seg_type),
        merge_between_batch=merge_between_batch)
    pred = np.asarray(unpatchify(pred_patches, cfg.patch_size))
    ref_loss, ref_pred = torch_forward(params, cfg, imgs, tgts, mask, valid,
                                       seg_type=seg_type,
                                       merge_between_batch=merge_between_batch)
    np.testing.assert_allclose(pred, ref_pred, atol=atol)
    np.testing.assert_allclose(float(loss), ref_loss, atol=atol)


def test_painter_parity():
    cfg = configs.tiny_test_config(img_size=(128, 64), patch_size=16,
                                   embed_dim=64, num_heads=4,
                                   pretrain_img_size=64)
    _compare(cfg, *_mk(cfg))


def test_painter_parity_near_black_ignore():
    cfg = configs.tiny_test_config(img_size=(64, 32), pretrain_img_size=32)
    params, imgs, tgts, mask, valid = _mk(cfg)
    # make sample 0's unmasked target near-black after de-normalization
    mean = np.array(configs.IMAGENET_MEAN)
    std = np.array(configs.IMAGENET_STD)
    tgts[0] = (0.0 - mean) / std
    _compare(cfg, params, imgs, tgts, mask, valid)


def test_seggpt_parity_with_type_tokens():
    cfg = configs.tiny_test_config(seg_type_tokens=True, loss_denom_eps=0.0,
                                   near_black_check=False)
    params, imgs, tgts, mask, valid = _mk(cfg)
    seg_type = np.array([[0], [1]], np.int32)
    _compare(cfg, params, imgs, tgts, mask, valid, seg_type=seg_type)


def test_seggpt_parity_feature_ensemble():
    # multi-prompt ensemble: merge_between_batch=0 (seggpt_engine.py:46)
    cfg = configs.tiny_test_config(seg_type_tokens=True, loss_denom_eps=0.0,
                                   near_black_check=False)
    params, imgs, tgts, mask, valid = _mk(cfg, batch=3)
    seg_type = np.zeros((3, 1), np.int32)
    _compare(cfg, params, imgs, tgts, mask, valid, seg_type=seg_type,
             merge_between_batch=0)


def test_parity_windowed_blocks():
    cfg = configs.tiny_test_config(window_block_indexes=(1, 3, 4),
                                   window_size=3)
    _compare(cfg, *_mk(cfg))


def test_parity_eval_resolution_change():
    # model trained at (64,32), evaluated at (96,48): abs-pos bicubic and
    # rel-pos linear interpolation paths (vitdet_utils.py:75-93,128-157)
    cfg = configs.tiny_test_config(img_size=(64, 32), pretrain_img_size=32)
    params, *_ = _mk(cfg)
    cfg_eval = cfg.with_img_size((96, 48))
    _, imgs, tgts, mask, valid = _mk(cfg_eval, img_size=(96, 48))
    _compare(cfg_eval, params, imgs, tgts, mask, valid)


def test_train_mode_runs_and_remat_matches():
    cfg = configs.tiny_test_config(drop_path_rate=0.2)
    params, imgs, tgts, mask, valid = _mk(cfg)
    args = (params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
            jnp.asarray(mask), jnp.asarray(valid))
    rng = jax.random.PRNGKey(5)
    l1, _, _ = m.forward(*args, train=True, rng=rng)
    l2, _, _ = m.forward(*args, train=True, rng=rng, remat=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # deterministic across calls with the same key
    l3, _, _ = m.forward(*args, train=True, rng=rng)
    assert float(l1) == float(l3)


def test_predict_query_half_equals_full_decode_slice():
    cfg = configs.tiny_test_config(seg_type_tokens=True)
    params, imgs, tgts, mask, valid = _mk(cfg, batch=3)
    st = jnp.zeros((3, 1), jnp.int32)
    args = (params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
            jnp.asarray(mask))
    full = m.predict_image(*args, seg_type=st, merge_between_batch=0)
    half = m.predict_query_half(*args, seg_type=st, merge_between_batch=0)
    h = full.shape[1]
    np.testing.assert_allclose(np.asarray(half),
                               np.asarray(full[0, h // 2:]), atol=1e-6)


@pytest.mark.parametrize("loss_func", ["l1", "l2", "l1l2"])
def test_loss_variants_match_torch_formulas(loss_func):
    """models_painter.py:453-460 alternative losses."""
    import torch
    cfg = configs.tiny_test_config(loss_func=loss_func)
    params, imgs, tgts, mask, valid = _mk(cfg)
    loss, _, _ = m.forward(params, cfg, jnp.asarray(imgs),
                           jnp.asarray(tgts), jnp.asarray(mask),
                           jnp.asarray(valid))
    # recompute with torch formulas on the jax prediction
    _, pred_patches, _ = m.forward(params, cfg, jnp.asarray(imgs),
                                   jnp.asarray(tgts), jnp.asarray(mask),
                                   jnp.asarray(valid))
    pred = torch.from_numpy(np.asarray(
        unpatchify(pred_patches, cfg.patch_size))).double()
    t = torch.from_numpy(tgts).double()
    diff = pred - t
    if loss_func == "l1":
        ref = diff.abs()
    elif loss_func == "l2":
        ref = diff ** 2
    else:
        ref = (diff.abs() + diff ** 2) * 0.5
    mask_pix = torch.from_numpy(np.asarray(
        m.pixel_mask_from_patch_mask(jnp.asarray(mask), cfg,
                                     tgts.shape[1:3]))).double()
    v = torch.from_numpy(valid).double()
    mean_t = torch.tensor(configs.IMAGENET_MEAN).double()
    std_t = torch.tensor(configs.IMAGENET_STD).double()
    denorm = t * std_t + mean_t
    ign = (denorm * (1 - mask_pix)).sum((1, 2, 3)) < 300
    v[ign] = 0.0
    w = mask_pix * v
    ref_loss = (ref * w).sum() / (w.sum() + cfg.loss_denom_eps)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=2e-4)


def test_windowed_blocks_pallas_interpret():
    """window attention through the pallas kernel (interpret mode)."""
    cfg = configs.tiny_test_config(window_block_indexes=(1, 3, 4),
                                   window_size=3)
    params, imgs, tgts, mask, valid = _mk(cfg)
    args = (params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
            jnp.asarray(mask), jnp.asarray(valid))
    l_xla, p_xla, _ = m.forward(*args, attn_impl="xla")
    l_pal, p_pal, _ = m.forward(*args, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_xla),
                               atol=1e-4)
    np.testing.assert_allclose(float(l_pal), float(l_xla), atol=1e-5)


def test_attn_impl_auto_dispatch():
    """attn_impl='auto' (windowed-train->xla, else pallas) matches the
    uniform impls: fwd+loss in train mode, and grads vs xla. The split
    is a measured v5e rule (ROUND5.md); numerics must be impl-invariant
    at kernel tolerance regardless of the dispatch."""
    cfg = configs.tiny_test_config(window_block_indexes=(1, 3, 4),
                                   window_size=3)
    params, imgs, tgts, mask, valid = _mk(cfg)
    args = (params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
            jnp.asarray(mask), jnp.asarray(valid))
    l_xla, p_xla, _ = m.forward(*args, train=True)
    l_auto, p_auto, _ = m.forward(*args, train=True, attn_impl="auto")
    np.testing.assert_allclose(np.asarray(p_auto), np.asarray(p_xla),
                               atol=1e-4)
    np.testing.assert_allclose(float(l_auto), float(l_xla), atol=1e-5)

    def loss_of(impl):
        def f(p):
            l, _, _ = m.forward(p, *args[1:], train=True, attn_impl=impl)
            return l
        return jax.grad(f)(params)

    g_xla = loss_of("xla")
    g_auto = loss_of("auto")
    for ga, gx in zip(jax.tree_util.tree_leaves(g_auto),
                      jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gx),
                                   atol=2e-4)


def test_parity_residual_bottleneck_blocks():
    """ResBottleneckBlock path (models_painter.py:92-150,232-233) —
    dead config in the reference factories but part of the model API."""
    cfg = configs.tiny_test_config(residual_block_indexes=(1, 4))
    params, imgs, tgts, mask, valid = _mk(cfg)
    # randomize the zero-init norm3 so the block contributes
    import jax as j
    rb = params["residual_blocks"]
    for i in rb:
        rb[i]["norm3"]["scale"] = 0.5 + 0.1 * j.random.normal(
            j.random.PRNGKey(int(i)), rb[i]["norm3"]["scale"].shape)
    _compare(cfg, params, imgs, tgts, mask, valid)


def test_gelu_auto_resolution_and_bf16_equivalence():
    """gelu='auto' -> tanh only in bf16; the tanh flavor's deviation from
    exact erf stays below bf16 resolution through the full model."""
    assert not configs.tiny_test_config().gelu_approximate
    assert configs.tiny_test_config(dtype="bfloat16").gelu_approximate
    assert configs.tiny_test_config(gelu="tanh").gelu_approximate
    assert not configs.tiny_test_config(dtype="bfloat16",
                                        gelu="exact").gelu_approximate

    cfg16 = configs.tiny_test_config(dtype="bfloat16")
    cfg16_exact = configs.tiny_test_config(dtype="bfloat16", gelu="exact")
    params, imgs, tgts, mask, valid = _mk(cfg16)
    args = (params, jnp.asarray(imgs), jnp.asarray(tgts),
            jnp.asarray(mask), jnp.asarray(valid))
    l_t, p_t, _ = m.forward(args[0], cfg16, *args[1:])
    l_e, p_e, _ = m.forward(args[0], cfg16_exact, *args[1:])
    # bf16 compute noise level for this tiny model is ~1e-2; the gelu
    # flavor must not add to it
    np.testing.assert_allclose(np.asarray(p_t), np.asarray(p_e), atol=2e-2)
    np.testing.assert_allclose(float(l_t), float(l_e), atol=2e-3)
