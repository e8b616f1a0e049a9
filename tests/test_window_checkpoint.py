"""Window-trained checkpoint round trip + forward parity (VERDICT r3 #6).

A genuinely window-trained reference checkpoint stores each block's
rel-pos tables at that block's own attention extent
(``models_painter.py:309``: ``input_size=(window_size, window_size)``
for windowed blocks -> tables sized ``2*window_size-1`` via
``vitdet_utils.py:63-93``) — HETEROGENEOUS with the global blocks'
full-grid tables. With ``window_rel_pos_tables=True`` the param tree
carries exact window-sized stacked leaves; these tests prove:

1. the torch converter round-trips such a checkpoint exactly, and
2. the forward matches the fp64 torch oracle at the usual tolerance
   (the oracle reads the same exact window tables the reference would).

The released checkpoints are all-global (the window_block_indexes tuple
quirk, configs.py docstring) — this covers the *other* case so window
support is checkpoint-real, not just forward-pass-real.
"""
import jax
import jax.numpy as jnp
import numpy as np

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m
from painter_tpu.ops.patches import unpatchify
from painter_tpu.train import checkpoint as ckpt

from torch_ref import torch_forward

RNG = np.random.RandomState(11)

WIN_CFG = dict(window_block_indexes=(1, 3, 4), window_size=3,
               window_rel_pos_tables=True)


def _randomized_params(cfg):
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_init_has_window_tables():
    cfg = configs.tiny_test_config(**WIN_CFG)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    attn = params["blocks"]["attn"]
    ws = cfg.window_size
    gh, gw = cfg.grid_size
    assert attn["rel_pos_h_win"].shape == (cfg.depth, 2 * ws - 1,
                                           cfg.head_dim)
    assert attn["rel_pos_w_win"].shape == (cfg.depth, 2 * ws - 1,
                                           cfg.head_dim)
    assert attn["rel_pos_h"].shape == (cfg.depth, 2 * gh - 1, cfg.head_dim)
    assert attn["rel_pos_w"].shape == (cfg.depth, 2 * gw - 1, cfg.head_dim)


def test_windowed_preset():
    """The de-bugged windowed flagship preset (configs.py): 16 windowed
    blocks at ws=14 with the 8 intended globals (models_painter.py:481-482
    as written before the misplaced comma), exact window tables on."""
    cfg = configs.get_config("painter_vit_large_patch16_input896x448_windowed")
    globals_ = set(range(cfg.depth)) - set(cfg.window_block_indexes)
    assert globals_ == {2, 5, 8, 11, 14, 17, 20, 23}
    assert len(cfg.window_block_indexes) == 16
    assert cfg.window_size == 14
    assert cfg.window_rel_pos_tables
    # same trunk geometry as the flagship all-global preset
    flag = configs.get_config(
        "painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1")
    assert (cfg.img_size, cfg.depth, cfg.embed_dim, cfg.num_heads) == \
        (flag.img_size, flag.depth, flag.embed_dim, flag.num_heads)


def test_heterogeneous_state_dict_round_trip():
    """Export emits per-block table sizes exactly as the reference stores
    them; convert recovers the window tables bit-exactly."""
    cfg = configs.tiny_test_config(**WIN_CFG)
    params = _randomized_params(cfg)
    sd = ckpt.params_to_torch_state_dict(params, cfg)

    ws, (gh, gw) = cfg.window_size, cfg.grid_size
    for i in range(cfg.depth):
        want = 2 * ws - 1 if i in cfg.window_block_indexes else 2 * gh - 1
        assert sd[f"blocks.{i}.attn.rel_pos_h"].shape[0] == want, i
        want_w = 2 * ws - 1 if i in cfg.window_block_indexes else 2 * gw - 1
        assert sd[f"blocks.{i}.attn.rel_pos_w"].shape[0] == want_w, i

    back = ckpt.convert_torch_state_dict(sd, cfg)
    attn = back["blocks"]["attn"]
    src = jax.tree_util.tree_map(np.asarray, params["blocks"]["attn"])
    for i in range(cfg.depth):
        if i in cfg.window_block_indexes:
            np.testing.assert_array_equal(attn["rel_pos_h_win"][i],
                                          src["rel_pos_h_win"][i])
            np.testing.assert_array_equal(attn["rel_pos_w_win"][i],
                                          src["rel_pos_w_win"][i])
        else:
            np.testing.assert_array_equal(attn["rel_pos_h"][i],
                                          src["rel_pos_h"][i])
            np.testing.assert_array_equal(attn["rel_pos_w"][i],
                                          src["rel_pos_w"][i])


def test_window_checkpoint_load_and_oracle_parity(tmp_path):
    """Full load path (torch .pth -> merge over init) then fp64 oracle
    parity — the synthetic window-trained checkpoint the VERDICT asked
    for."""
    import torch

    cfg = configs.tiny_test_config(**WIN_CFG)
    donor = _randomized_params(cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in ckpt.params_to_torch_state_dict(donor, cfg).items()}
    path = str(tmp_path / "window_trained.pth")
    torch.save({"model": sd}, path)

    init = m.init_params(jax.random.PRNGKey(1), cfg)
    params = ckpt.load_torch_params(path, cfg, init=init)

    # the loaded window tables are the donor's, exactly
    np.testing.assert_array_equal(
        np.asarray(params["blocks"]["attn"]["rel_pos_h_win"])[
            list(cfg.window_block_indexes)],
        np.asarray(donor["blocks"]["attn"]["rel_pos_h_win"])[
            list(cfg.window_block_indexes)])

    batch = 2
    h, w = cfg.img_size
    imgs = RNG.randn(batch, h, w, 3).astype(np.float32)
    tgts = RNG.randn(batch, h, w, 3).astype(np.float32)
    num_patches = cfg.num_patches
    mask = np.zeros((batch, num_patches), np.float32)
    mask[:, num_patches // 2:] = 1.0
    valid = np.ones((batch, h, w, 3), np.float32)

    loss, pred_patches, _ = m.forward(
        params, cfg, jnp.asarray(imgs), jnp.asarray(tgts),
        jnp.asarray(mask), jnp.asarray(valid))
    pred = np.asarray(unpatchify(pred_patches, cfg.patch_size))
    ref_loss, ref_pred = torch_forward(params, cfg, imgs, tgts, mask, valid)
    np.testing.assert_allclose(pred, ref_pred, atol=2e-4)
    np.testing.assert_allclose(float(loss), ref_loss, atol=2e-4)


def test_window_tables_are_read_not_interpolated():
    """Changing ONLY a windowed block's _win table changes the output;
    changing that block's full-grid table row does not — proving windowed
    blocks read the exact window tables, not an interpolation of the
    full-grid leaf."""
    cfg = configs.tiny_test_config(**WIN_CFG)
    params = _randomized_params(cfg)
    h, w = cfg.img_size
    imgs = jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32)
    tgts = jnp.asarray(RNG.randn(1, h, w, 3), jnp.float32)
    mask = jnp.zeros((1, cfg.num_patches))

    def run(p):
        return np.asarray(m.predict_image(p, cfg, imgs, tgts, mask))

    base = run(params)
    wb = cfg.window_block_indexes[0]

    # a UNIFORM shift would be softmax-invariant (it moves every logit in
    # a row equally), so perturb with position-dependent noise
    def bump(name):
        out = jax.tree_util.tree_map(lambda a: a, params)
        out["blocks"] = dict(out["blocks"])
        out["blocks"]["attn"] = dict(out["blocks"]["attn"])
        tbl = params["blocks"]["attn"][name]
        noise = jax.random.normal(jax.random.PRNGKey(3), tbl.shape[1:])
        out["blocks"]["attn"][name] = tbl.at[wb].add(noise)
        return out

    assert np.abs(run(bump("rel_pos_h_win")) - base).max() > 1e-5

    np.testing.assert_array_equal(run(bump("rel_pos_h")), base)
