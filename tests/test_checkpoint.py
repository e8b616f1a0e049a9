"""Checkpoint converter round-trip + torch-weights parity + orbax resume."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m
from painter_tpu.train import checkpoint as ckpt_lib
from painter_tpu.train import optim, step as step_lib

from torch_ref import torch_forward


def _cfg():
    return configs.tiny_test_config(img_size=(64, 32), pretrain_img_size=32,
                                    seg_type_tokens=True)


def test_torch_roundtrip():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    sd = ckpt_lib.params_to_torch_state_dict(params, cfg)
    back = ckpt_lib.convert_torch_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


def test_load_torch_pth_and_forward_matches(tmp_path):
    """Save a torch .pth in reference format, load, compare forwards."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    # randomize so rel-pos is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in ckpt_lib.params_to_torch_state_dict(params, cfg).items()}
    path = os.path.join(tmp_path, "ckpt.pth")
    torch.save({"model": sd}, path)

    loaded = ckpt_lib.load_torch_params(path, cfg)
    rng = np.random.RandomState(0)
    h, w = cfg.img_size
    imgs = rng.randn(2, h, w, 3).astype(np.float32)
    tgts = rng.randn(2, h, w, 3).astype(np.float32)
    L = cfg.num_patches
    mask = np.zeros((2, L), np.float32)
    mask[:, L // 2:] = 1
    valid = np.ones((2, h, w, 3), np.float32)
    st = np.zeros((2, 1), np.int32)

    loss, _, _ = m.forward(loaded, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
                           jnp.asarray(mask), jnp.asarray(valid),
                           seg_type=jnp.asarray(st))
    ref_loss, _ = torch_forward(params, cfg, imgs, tgts, mask, valid,
                                seg_type=st)
    np.testing.assert_allclose(float(loss), ref_loss, atol=2e-4)


def test_strict_false_merge_skips_mismatches(tmp_path):
    """MAE-surgery semantics: mismatched shapes keep init values."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    sd = ckpt_lib.params_to_torch_state_dict(params, cfg)
    # corrupt decoder_embed shape (like an MAE ckpt missing the decoder)
    sd["decoder_embed.weight"] = np.zeros((7, 5), np.float32)
    del sd["mask_token"]
    path = os.path.join(tmp_path, "mae.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)
    init = m.init_params(jax.random.PRNGKey(9), cfg)
    out = ckpt_lib.load_torch_params(path, cfg, init=init)
    np.testing.assert_array_equal(out["decoder_embed"]["kernel"],
                                  np.asarray(init["decoder_embed"]["kernel"]))
    np.testing.assert_array_equal(out["mask_token"],
                                  np.asarray(init["mask_token"]))
    np.testing.assert_array_equal(out["norm"]["scale"],
                                  np.asarray(params["norm"]["scale"]))


def test_orbax_save_and_auto_resume(tmp_path):
    cfg = configs.tiny_test_config()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    oc = optim.OptimConfig(steps_per_epoch=2)
    optimizer = optim.make_optimizer(params, cfg, oc)
    state = step_lib.init_train_state(params, optimizer)

    mgr = ckpt_lib.checkpoint_manager(str(tmp_path / "ckpts"))
    # no checkpoint yet -> returns input, None
    _, step = ckpt_lib.restore_state(mgr, state)
    assert step is None
    state["step"] = jnp.asarray(5, jnp.int32)
    ckpt_lib.save_state(mgr, 5, state)
    mgr.wait_until_finished()
    restored, step = ckpt_lib.restore_state(mgr, state)
    assert step == 5 and int(restored["step"]) == 5
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["norm"]["scale"]),
        np.asarray(state["params"]["norm"]["scale"]))


def test_pos_embed_interpolation_surgery(tmp_path):
    """ckpt with 14x14+cls table loads into an 8x8+cls model via bicubic
    interpolation (util/pos_embed.py:75-96 semantics)."""
    import torch.nn.functional as F
    cfg = configs.tiny_test_config(img_size=(64, 32), patch_size=8,
                                   pretrain_img_size=64)  # 8x8 grid
    src_table = np.random.RandomState(0).randn(197, cfg.embed_dim).astype(
        np.float32)
    sd = {"pos_embed": torch.from_numpy(src_table[None])}
    path = os.path.join(tmp_path, "pos.pth")
    torch.save({"model": sd}, path)
    init = m.init_params(jax.random.PRNGKey(0), cfg)
    out = ckpt_lib.load_torch_params(path, cfg, init=init)
    assert out["pos_embed"].shape == (65, cfg.embed_dim)
    # torch oracle for the grid part
    ref = F.interpolate(
        torch.from_numpy(src_table[1:]).reshape(1, 14, 14, -1)
        .permute(0, 3, 1, 2), size=(8, 8), mode="bicubic",
        align_corners=False).permute(0, 2, 3, 1).reshape(64, -1).numpy()
    np.testing.assert_allclose(out["pos_embed"][1:], ref, atol=1e-5)
    np.testing.assert_allclose(out["pos_embed"][0], src_table[0])


def test_export_torch_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    out = os.path.join(tmp_path, "export.pth")
    ckpt_lib.export_torch_checkpoint(params, cfg, out)
    loaded = ckpt_lib.load_torch_params(out, cfg)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        got = dict(jax.tree_util.tree_leaves_with_path(loaded))[path]
        np.testing.assert_array_equal(np.asarray(leaf), got)


def test_residual_block_converter_roundtrip():
    cfg = configs.tiny_test_config(residual_block_indexes=(1, 4),
                                   seg_type_tokens=True)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    sd = ckpt_lib.params_to_torch_state_dict(params, cfg)
    assert "blocks.1.residual.conv2.weight" in sd
    assert sd["blocks.1.residual.conv2.weight"].shape == (16, 16, 3, 3)
    back = ckpt_lib.convert_torch_state_dict(sd, cfg)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        got = dict(jax.tree_util.tree_leaves_with_path(back))[path]
        np.testing.assert_array_equal(np.asarray(leaf), got)
