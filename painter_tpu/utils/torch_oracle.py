"""Torch oracle for numerical parity (tests + the parity CLI).

A compact torch implementation of the in-context ViT math as specified by
the reference (`/root/reference/Painter/models_painter.py`,
`models_seggpt.py`, `util/vitdet_utils.py`) — written against *our* param
pytree so the JAX model can be checked end-to-end with shared random
weights. Used by the test suite and by ``python -m painter_tpu.utils.parity``
(checkpoint-parity harness, SURVEY.md §7 step 2); torch is CPU-only here.
"""
import numpy as np
import torch
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.asarray(a)).double()


def _linear(x, kernel, bias):
    return x @ _t(kernel) + _t(bias)


def _ln(x, scale, bias, eps):
    return F.layer_norm(x, (x.shape[-1],), _t(scale), _t(bias), eps)


def _abs_pos(table, has_cls, hw):
    tbl = _t(table)
    if has_cls:
        tbl = tbl[1:]
    size = int(round(tbl.shape[0] ** 0.5))
    grid = tbl.reshape(1, size, size, -1).permute(0, 3, 1, 2)
    if (size, size) != tuple(hw):
        grid = F.interpolate(grid, size=tuple(hw), mode="bicubic",
                             align_corners=False)
    return grid.permute(0, 2, 3, 1)


def _rel_table(q, k, table):
    dist = 2 * max(q, k) - 1
    tbl = _t(table)
    if tbl.shape[0] != dist:
        tbl = F.interpolate(tbl.reshape(1, tbl.shape[0], -1).permute(0, 2, 1),
                            size=dist, mode="linear")
        tbl = tbl.reshape(-1, dist).permute(1, 0)
    qc = torch.arange(q)[:, None] * max(k / q, 1.0)
    kc = torch.arange(k)[None, :] * max(q / k, 1.0)
    rel = (qc - kc) + (k - 1) * max(q / k, 1.0)
    return tbl[rel.long()]


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp))


def _window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _attn(bp, x, num_heads, use_rel_pos, windowed=False):
    b, h, w, c = x.shape
    length = h * w
    hd = c // num_heads
    qkv = _linear(x.reshape(b, length, c), bp["qkv"]["kernel"],
                  bp["qkv"]["bias"])
    qkv = qkv.reshape(b, length, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, b * num_heads, length, hd).unbind(0)
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    if use_rel_pos:
        # window-trained checkpoints carry exact window-sized tables for
        # windowed blocks (configs.window_rel_pos_tables)
        suffix = "_win" if windowed and "rel_pos_h_win" in bp else ""
        rh = _rel_table(h, h, bp["rel_pos_h" + suffix])
        rw = _rel_table(w, w, bp["rel_pos_w" + suffix])
        rq = q.reshape(b * num_heads, h, w, hd)
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = (attn.view(b * num_heads, h, w, h, w)
                + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(b * num_heads, length, length)
    attn = attn.softmax(dim=-1)
    x = (attn @ v).view(b, num_heads, h, w, hd).permute(0, 2, 3, 1, 4)
    x = x.reshape(b, h, w, c)
    return _linear(x, bp["proj"]["kernel"], bp["proj"]["bias"])


def _residual_block(rp, x, eps=1e-5):
    # x NHWC -> NCHW convs with channel-wise LN (models_painter.py:92-150)
    h = x.permute(0, 3, 1, 2)
    out = torch.nn.functional.conv2d(
        h, _t(rp["conv1"]["kernel"]).permute(3, 2, 0, 1))

    def ln2d(z, scale, bias):
        u = z.mean(1, keepdim=True)
        s2 = (z - u).pow(2).mean(1, keepdim=True)
        z = (z - u) / torch.sqrt(s2 + eps)
        return _t(scale)[:, None, None] * z + _t(bias)[:, None, None]

    out = ln2d(out, rp["norm1"]["scale"], rp["norm1"]["bias"])
    out = F.gelu(out)
    out = torch.nn.functional.conv2d(
        out, _t(rp["conv2"]["kernel"]).permute(3, 2, 0, 1), padding=1)
    out = ln2d(out, rp["norm2"]["scale"], rp["norm2"]["bias"])
    out = F.gelu(out)
    out = torch.nn.functional.conv2d(
        out, _t(rp["conv3"]["kernel"]).permute(3, 2, 0, 1))
    out = ln2d(out, rp["norm3"]["scale"], rp["norm3"]["bias"])
    return x + out.permute(0, 2, 3, 1)


def _block(bp, x, cfg, window_size, merge=0):
    shortcut = x
    x = _ln(x, bp["norm1"]["scale"], bp["norm1"]["bias"], cfg.ln_eps)
    if window_size > 0:
        h, w = x.shape[1], x.shape[2]
        x, pad_hw = _window_partition(x, window_size)
    x = _attn(bp["attn"], x, cfg.num_heads, cfg.use_rel_pos,
              windowed=window_size > 0)
    if window_size > 0:
        x = _window_unpartition(x, window_size, pad_hw, (h, w))
    if merge > 0:
        prompt, inputs = x.split(x.shape[1] // 2, dim=1)
        if merge == 1:
            num_prompts = x.shape[0] // 2
            inputs = inputs.reshape(2, num_prompts, -1)
            inputs = inputs.mean(dim=1, keepdim=True).expand_as(inputs)
            inputs = inputs.reshape(*prompt.shape)
        else:
            inputs = inputs.mean(dim=0, keepdim=True).expand_as(inputs)
        x = torch.cat([prompt, inputs], dim=1)
    x = shortcut + x
    y = _ln(x, bp["norm2"]["scale"], bp["norm2"]["bias"], cfg.ln_eps)
    y = _linear(y, bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"])
    y = F.gelu(y)
    y = _linear(y, bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"])
    return x + y


def torch_forward(params, cfg, imgs, tgts, bool_masked_pos, valid,
                  seg_type=None, merge_between_batch=-1):
    """NHWC numpy inputs -> (loss, pred image NHWC numpy)."""
    imgs = _t(imgs).permute(0, 3, 1, 2)
    tgts_im = _t(tgts).permute(0, 3, 1, 2)
    p = cfg.patch_size

    def embed(im):
        y = F.conv2d(im, _t(params["patch_embed"]["kernel"]).permute(
            3, 2, 0, 1), _t(params["patch_embed"]["bias"]), stride=p)
        return y.permute(0, 2, 3, 1)

    x = embed(imgs)
    y = embed(tgts_im)
    b, hp, wp, _ = x.shape
    m = _t(bool_masked_pos).reshape(b, hp, wp, 1)
    y = y * (1 - m) + _t(params["mask_token"]).reshape(1, 1, 1, -1) * m
    x = x + _t(params["segment_token_x"]).reshape(1, 1, 1, -1)
    y = y + _t(params["segment_token_y"]).reshape(1, 1, 1, -1)
    if cfg.use_abs_pos:
        pos = _abs_pos(params["pos_embed"], cfg.pretrain_use_cls_token,
                       (hp, wp))
        x = x + pos
        y = y + pos
    if cfg.seg_type_tokens:
        st = _t(seg_type).reshape(b).long()
        emb = torch.where(
            (st == 1)[:, None],
            _t(params["type_token_ins"])[None],
            _t(params["type_token_cls"])[None])[:, None, None, :]
        x = x + emb
        y = y + emb
    x = torch.cat([x, y], dim=0)

    def bp_at(i):
        import jax
        return jax.tree_util.tree_map(lambda a: np.asarray(a[i]),
                                      params["blocks"])

    outs = []
    for i in range(cfg.depth):
        ws = cfg.window_size if i in cfg.window_block_indexes else 0
        merge = 0
        if merge_between_batch >= 0 and i >= merge_between_batch:
            merge = 1 if cfg.merge_idx >= i else 2
        x = _block(bp_at(i), x, cfg, ws, merge)
        if i in getattr(cfg, "residual_block_indexes", ()):
            import jax as _jax
            rp = _jax.tree_util.tree_map(
                np.asarray, params["residual_blocks"][str(i)])
            x = _residual_block(rp, x)
        if i == cfg.merge_idx:
            x = (x[:x.shape[0] // 2] + x[x.shape[0] // 2:]) * 0.5
        if i in cfg.out_indices:
            outs.append(_ln(x, params["norm"]["scale"],
                            params["norm"]["bias"], cfg.ln_eps))

    x = torch.cat(outs, dim=-1)
    x = _linear(x, params["decoder_embed"]["kernel"],
                params["decoder_embed"]["bias"])
    h, w = x.shape[1], x.shape[2]
    dec = cfg.decoder_embed_dim
    x = x.reshape(x.shape[0], h, w, p, p, dec)
    x = torch.einsum("nhwpqc->nchpwq", x).reshape(x.shape[0], dec,
                                                  h * p, w * p)
    dp = params["decoder_pred"]
    x = F.conv2d(x, _t(dp["conv1"]["kernel"]).permute(3, 2, 0, 1),
                 _t(dp["conv1"]["bias"]), padding=1)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    x = _t(dp["ln"]["scale"])[:, None, None] * x + \
        _t(dp["ln"]["bias"])[:, None, None]
    x = F.gelu(x)
    x = F.conv2d(x, _t(dp["conv2"]["kernel"]).permute(3, 2, 0, 1),
                 _t(dp["conv2"]["bias"]))
    pred = x  # (B, 3, H, W)

    # loss
    mask = _t(bool_masked_pos).reshape(b, hp, wp)
    mask = mask.repeat_interleave(p, 1).repeat_interleave(p, 2)[:, None]
    valid = _t(valid).permute(0, 3, 1, 2).clone()
    if cfg.near_black_check:
        mean = torch.tensor([0.485, 0.456, 0.406]).double()[None, :, None,
                                                            None]
        std = torch.tensor([0.229, 0.224, 0.225]).double()[None, :, None,
                                                           None]
        ign = ((tgts_im * std + mean) * (1 - mask)).sum((1, 2, 3)) < 300
        valid[ign] = 0.0
    mask = mask * valid
    loss = F.smooth_l1_loss(pred, tgts_im, reduction="none", beta=0.01)
    loss = (loss * mask).sum() / (mask.sum() + cfg.loss_denom_eps)
    return (loss.item(),
            pred.permute(0, 2, 3, 1).numpy())
