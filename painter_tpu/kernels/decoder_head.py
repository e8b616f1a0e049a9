"""Fused decoder tail: Conv3x3 + LayerNorm + GELU + Conv1x1 (Pallas).

Role: the training-path full decode of ``forward_decoder``
(``Painter/models_painter.py:326-333, 420-431``: Linear -> PixelShuffle ->
Conv2d(3x3) -> LayerNorm2D -> GELU -> Conv2d(1x1)). The decoder_embed
Linear and the pixel shuffle stay in XLA — measured on a v5e at B=8
ViT-L 896x448, the gemm runs at ~191 TFLOPS and the shuffle adds 0.3 ms;
everything after them is what hurts: conv3x3 +7.8 ms (a C=64 conv fills
half the MXU's lanes, ~30 TFLOPS) and LN+GELU +6.4 ms (fp32 stat passes
and HBM round trips over a (8, 896, 448, 64) intermediate). This kernel
fuses that tail into one VMEM-resident pass per row block.

TPU-first structure (shaped by what Mosaic supports — lane->sublane
reshapes are not lowerable, so everything stays in the native
(rows, W, C) layout):
- The 3x3 conv runs as one MXU contraction per row chunk: the input is
  dx-packed (x-shifts via sublane slice+concat with a zero column, then
  lane-concat to K = 3C) and the weight is dy-packed to N = 3C, so a
  single (rows*W, 3C) @ (3C, 3C) matmul computes all nine taps' partial
  sums. The dy combine is two VPU adds of *aligned* row-range slices:
  ``u = cmat[0:sW, 0:C] + cmat[W:(s+1)W, C:2C] + cmat[2W:(s+2)W, 2C:3C]``.
- LN (fp32 stats, torch-biased variance), GELU (exact or tanh per
  config) and the 1x1 conv run in-register; only the (B, H, W, 3)
  result goes back to HBM.
- The conv's one-row vertical halos are one/two-row neighbour blocks
  (clamped at the image edge, zero-masked in-kernel: SAME padding).

Backward: a mirror kernel with a two-row halo recomputes the forward
chain per block, so every block emits the *complete* input gradient for
its own rows (no cross-block accumulation); weight/bias/LN gradients
are emitted as per-block partials and summed in XLA. The input-gradient
conv reuses the same dx/dy-packed contraction with the rotated kernel,
and dW1 reuses the dx-packed activations against three row-shifted
``du`` windows. XLA's autodiff carries the gradient on through the
pixel shuffle and the decoder_embed gemm.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6
# Mosaic's default scoped-VMEM budget is 16 MB; the bwd kernel's fp32
# recompute chain peaks above it at useful tile sizes. v5e has 128 MB.
_VMEM_LIMIT = 100 * 1024 * 1024
# DMA of blocks whose minor dim is below the 128-lane tile runs at a
# fraction of HBM bandwidth (measured: an 8.25 ms IO floor for reading
# (..., 64) blocks of a 411 MB array). The wrappers therefore zero-pad
# the channel dim to the full lane tile before the kernel and slice it
# back off inside; XLA fuses the pad into the producing transpose.
_LANE = 128


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _gelu_grad(x, approximate: bool):
    """d gelu(x) / dx, elementwise fp32."""
    if approximate:
        c = 0.7978845608028654  # sqrt(2/pi)
        a = 0.044715
        u = c * (x + a * x ** 3)
        th = jnp.tanh(u)
        return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * c \
            * (1.0 + 3.0 * a * x * x)
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327  # standard normal pdf
    cdf = 0.5 * (1.0 + jax.lax.erf(x * 0.7071067811865476))
    return cdf + x * phi


def _dx_pack(p3, c: int):
    """(rows, W, C) pixels -> (rows*W, 3C) dx-packed conv operand.

    Lane block dxi in {0,1,2} holds the pixel shifted by dxi-1 along x
    (zero at the image's left/right edge: SAME padding).
    """
    rows, w, _ = p3.shape
    z = jnp.zeros((rows, 1, c), p3.dtype)
    left = jnp.concatenate([z, p3[:, :w - 1]], axis=1).reshape(rows * w, c)
    right = jnp.concatenate([p3[:, 1:], z], axis=1).reshape(rows * w, c)
    return jnp.concatenate([left, p3.reshape(rows * w, c), right], axis=1)


def _dy_combine(cmat, rows_out: int, w: int, c: int):
    """(rows_in*W, 3C) dy partials -> (rows_out*W, C) conv output.

    rows_in = rows_out + 2 (one halo row each side): the dyi partial of
    input row h feeds output row y = h - dyi, i.e. aligned row-range
    slices of the flat matmul output.
    """
    n = rows_out * w
    return (cmat[0:n, 0:c] + cmat[w:n + w, c:2 * c]
            + cmat[2 * w:n + 2 * w, 2 * c:3 * c])


def _layer_norm_fwd(u, lns, lnb):
    """fp32 LN over the last axis; returns (normed, xhat, rstd)."""
    mean = u.mean(axis=-1, keepdims=True)
    var = ((u - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (u - mean) * rstd
    return xhat * lns + lnb, xhat, rstd


def _with_halo(main_ref, top_ref, bot_ref, blk_r, n_blk, halo: int):
    """(rows_blk + 2*halo, W, C) rows; zeros outside the image."""
    top = top_ref[0]
    bot = bot_ref[0]
    top = jnp.where(blk_r == 0, jnp.zeros_like(top), top)
    bot = jnp.where(blk_r == n_blk - 1, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, main_ref[0], bot], axis=0)


def _halo_specs(rows_blk, w, c, h, halo):
    """Neighbour-row halo blocks (clamped at edges; kernel masks)."""
    assert rows_blk % halo == 0 and h % halo == 0
    per = rows_blk // halo
    return [
        pl.BlockSpec((1, halo, w, c),
                     lambda bi, r: (bi, jnp.maximum(r * per - 1, 0),
                                    0, 0)),
        pl.BlockSpec((1, halo, w, c),
                     lambda bi, r: (bi,
                                    jnp.minimum((r + 1) * per,
                                                h // halo - 1), 0, 0)),
    ]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _make_fwd_kernel(w, c, rows_blk, sub_rows, approximate):
    def kernel(pix_ref, top_ref, bot_ref, wp_ref, b1_ref, lns_ref,
               lnb_ref, w2_ref, b2_ref, o_ref):
        blk_r = pl.program_id(1)
        pfull = _with_halo(pix_ref, top_ref, bot_ref, blk_r,
                           pl.num_programs(1), halo=1)[..., :c]
        wp = wp_ref[...]
        b1 = b1_ref[0].astype(jnp.float32)
        lns = lns_ref[0].astype(jnp.float32)
        lnb = lnb_ref[0].astype(jnp.float32)
        w2 = w2_ref[...]
        b2 = b2_ref[0].astype(jnp.float32)
        for y0 in range(0, rows_blk, sub_rows):
            sr = min(sub_rows, rows_blk - y0)
            psub = pfull[y0:y0 + sr + 2]  # rows [y0-1, y0+sr]
            a3 = _dx_pack(psub, c)
            cmat = jnp.dot(a3, wp, preferred_element_type=jnp.float32)
            u = _dy_combine(cmat, sr, w, c) + b1
            n, _, _ = _layer_norm_fwd(u, lns, lnb)
            g = jax.nn.gelu(n, approximate=approximate).astype(w2.dtype)
            o = jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2
            o_ref[0, pl.ds(y0 * w, sr * w), :] = o.astype(o_ref.dtype)
    return kernel


def _scalar_specs(c):
    return [
        pl.BlockSpec((1, c), lambda *_: (0, 0)),
        pl.BlockSpec((1, c), lambda *_: (0, 0)),
        pl.BlockSpec((1, c), lambda *_: (0, 0)),
        pl.BlockSpec((c, 3), lambda *_: (0, 0)),
        pl.BlockSpec((1, 3), lambda *_: (0, 0)),
    ]


def _choose_rows(h: int, want: int = 16) -> int:
    r = min(want, h)
    while h % r or r % 2 and r > 1:
        r -= 1
    return max(r, 1)


def _fwd_impl(pix, c, wp, b1, lns, lnb, w2, b2, approximate, rows_blk,
              sub_rows, interpret):
    b, h, w, cp = pix.shape
    grid = (b, h // rows_blk)
    kw = {"interpret": True} if interpret else {}
    out = pl.pallas_call(
        _make_fwd_kernel(w, c, rows_blk, sub_rows, approximate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows_blk, w, cp),
                         lambda bi, r: (bi, r, 0, 0)),
            *_halo_specs(rows_blk, w, cp, h, 1),
            pl.BlockSpec((3 * c, 3 * c), lambda bi, r: (0, 0)),
            *_scalar_specs(c),
        ],
        out_specs=pl.BlockSpec((1, rows_blk * w, 3),
                               lambda bi, r: (bi, r, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, 3), pix.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (9 * c + 3),
            bytes_accessed=(pix.size + b * h * w * 3) * pix.dtype.itemsize,
            transcendentals=b * h * w * c,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        **kw,
    )(pix, pix, pix, wp, b1, lns, lnb, w2, b2)
    return out.reshape(b, h, w, 3)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel(w, c, rows_blk, sub_rows, approximate):
    def kernel(pix_ref, top_ref, bot_ref, go_ref, gtop_ref, gbot_ref,
               wp_ref, wpb_ref, b1_ref, lns_ref, lnb_ref, w2_ref,
               dpix_ref, dwp_ref, db1_ref, dlns_ref, dlnb_ref, dw2_ref,
               db2_ref):
        blk_r = pl.program_id(1)
        n_blk = pl.num_programs(1)
        cdt = pix_ref.dtype
        # pixels with a 2-row halo: du spans rows [-1, R], whose conv
        # inputs span rows [-2, R+1]
        pfull = _with_halo(pix_ref, top_ref, bot_ref, blk_r, n_blk,
                           halo=2)[..., :c]
        gofull = _with_halo(go_ref, gtop_ref, gbot_ref, blk_r, n_blk,
                            halo=1)[..., :3].astype(jnp.float32)
        wp = wp_ref[...]
        wpb = wpb_ref[...]
        b1 = b1_ref[0].astype(jnp.float32)
        lns = lns_ref[0].astype(jnp.float32)
        lnb = lnb_ref[0].astype(jnp.float32)
        w2 = w2_ref[...]
        w2f = w2.astype(jnp.float32)

        accs = [jnp.zeros((3 * c, 3 * c), jnp.float32),  # dwp
                jnp.zeros((1, c), jnp.float32),          # db1
                jnp.zeros((1, c), jnp.float32),          # dlns
                jnp.zeros((1, c), jnp.float32),          # dlnb
                jnp.zeros((c, 3), jnp.float32),          # dw2
                jnp.zeros((1, 3), jnp.float32)]          # db2

        for y0 in range(0, rows_blk, sub_rows):
            sr = min(sub_rows, rows_blk - y0)
            ndur = sr + 2  # du rows [y0-1, y0+sr]
            # forward recompute for those rows: pixels [y0-2, y0+sr+1]
            # -> pfull[y0 : y0+sr+4] (halo offset +2)
            psub = pfull[y0:y0 + sr + 4]
            a3 = _dx_pack(psub, c)
            cmat = jnp.dot(a3, wp, preferred_element_type=jnp.float32)
            u = _dy_combine(cmat, ndur, w, c) + b1
            n, xhat, rstd = _layer_norm_fwd(u, lns, lnb)
            g = jax.nn.gelu(n, approximate=approximate)
            # dout rows [y0-1, y0+sr]: gofull rows offset +1
            go3 = gofull[y0:y0 + ndur].reshape(ndur * w, 3)
            dg = jnp.dot(go3, w2f.T, preferred_element_type=jnp.float32)
            dn = dg * _gelu_grad(n, approximate)
            dxhat = dn * lns
            mx = dxhat.mean(axis=-1, keepdims=True)
            mxx = (dxhat * xhat).mean(axis=-1, keepdims=True)
            du = rstd * (dxhat - mx - xhat * mxx)

            # parameter-grad partials from owned rows only (the du halo
            # rows belong to the neighbouring chunk/block and would
            # double-count)
            own = slice(w, (sr + 1) * w)
            accs[1] += jnp.sum(du[own], axis=0, keepdims=True)
            accs[2] += jnp.sum((dn * xhat)[own], axis=0, keepdims=True)
            accs[3] += jnp.sum(dn[own], axis=0, keepdims=True)
            accs[4] += jnp.dot(g[own].astype(cdt).T,
                               go3[own].astype(cdt),
                               preferred_element_type=jnp.float32)
            accs[5] += jnp.sum(go3[own], axis=0, keepdims=True)

            # complete dpix rows [y0, y0+sr): conv of du with the
            # rotated kernel
            du3 = du.astype(cdt).reshape(ndur, w, c)
            a3b = _dx_pack(du3, c)
            cmatb = jnp.dot(a3b, wpb, preferred_element_type=jnp.float32)
            dp = _dy_combine(cmatb, sr, w, c)
            dpc = dp.reshape(sr, w, c).astype(cdt)
            zpad = jnp.zeros((sr, w, dpix_ref.shape[3] - c), cdt)
            dpix_ref[0, pl.ds(y0, sr)] = jnp.concatenate([dpc, zpad],
                                                         axis=2)

            # dW1: dwp[(dxi,c_in),(dyi,o)] += sum_y a3[pix row y+dyi-1]
            # (x) du[y] over owned rows; a3 row h2 = pixel row y0-2+h2
            du_own = du[own].astype(cdt)
            dwp_cols = [
                jnp.dot(a3[(dyi + 1) * w:(dyi + 1 + sr) * w].T, du_own,
                        preferred_element_type=jnp.float32)
                for dyi in range(3)]
            accs[0] += jnp.concatenate(dwp_cols, axis=1)

        dwp_ref[0, 0] = accs[0]
        db1_ref[0, 0] = accs[1]
        dlns_ref[0, 0] = accs[2]
        dlnb_ref[0, 0] = accs[3]
        dw2_ref[0, 0] = accs[4]
        db2_ref[0, 0] = accs[5]
    return kernel


def _bwd_impl(pix, c, go, wp, wpb, b1, lns, lnb, w2, approximate,
              rows_blk, sub_rows, interpret):
    b, h, w, cp = pix.shape
    gp = go.shape[3]
    n_blk = h // rows_blk
    grid = (b, n_blk)
    kw = {"interpret": True} if interpret else {}
    outs = pl.pallas_call(
        _make_bwd_kernel(w, c, rows_blk, sub_rows, approximate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows_blk, w, cp),
                         lambda bi, r: (bi, r, 0, 0)),
            *_halo_specs(rows_blk, w, cp, h, 2),
            pl.BlockSpec((1, rows_blk, w, gp),
                         lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, w, gp),
                         lambda bi, r: (bi,
                                        jnp.maximum(r * rows_blk - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, 1, w, gp),
                         lambda bi, r: (bi,
                                        jnp.minimum((r + 1) * rows_blk,
                                                    h - 1), 0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda bi, r: (0, 0)),
            pl.BlockSpec((3 * c, 3 * c), lambda bi, r: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, r: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, r: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, r: (0, 0)),
            pl.BlockSpec((c, 3), lambda bi, r: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, rows_blk, w, cp),
                         lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, 3 * c, 3 * c),
                         lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, c, 3), lambda bi, r: (bi, r, 0, 0)),
            pl.BlockSpec((1, 1, 1, 3), lambda bi, r: (bi, r, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cp), pix.dtype),
            jax.ShapeDtypeStruct((b, n_blk, 3 * c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blk, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blk, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blk, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blk, c, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blk, 1, 3), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        **kw,
    )(pix, pix, pix, go, go, go, wp, wpb, b1, lns, lnb, w2)
    return outs


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

def _pack_w1(conv1_k):
    """(3,3,C,O) HWIO -> (3C, 3O): rows (dxi, c_in), cols (dyi, c_out)."""
    return conv1_k.transpose(1, 2, 0, 3).reshape(
        3 * conv1_k.shape[2], 3 * conv1_k.shape[3])


def _unpack_dw1(dwp, c):
    """(3C, 3O) -> (3, 3, C, O), inverse of :func:`_pack_w1`."""
    return dwp.reshape(3, c, 3, -1).transpose(2, 0, 1, 3)


def _pack_w1_bwd(conv1_k):
    """Rotated kernel for the input gradient: conv3x3 of du with
    Wb[dyi, dxi, o, c] = W[2-dyi, 2-dxi, c, o]."""
    return _pack_w1(conv1_k[::-1, ::-1].transpose(0, 1, 3, 2))


def _prep(pix, conv1_k, conv2_k):
    c = conv1_k.shape[2]
    wp = _pack_w1(conv1_k).astype(pix.dtype)
    w2 = conv2_k.reshape(c, conv2_k.shape[-1]).astype(pix.dtype)
    return c, wp, w2


def _as_row(v, dt):
    return v.reshape(1, -1).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_decoder_tail(pix, conv1_k, conv1_b, ln_s, ln_b, conv2_k,
                       conv2_b, approximate: bool):
    """pixels (B, H, W, C) -> painted (B, H, W, 3).

    Drop-in for the post-shuffle tail of
    :func:`incontext_vit.forward_decoder` (conv3x3+bias -> LN(eps 1e-6)
    -> GELU -> conv1x1+bias), differentiable in all seven tensor args.
    conv1_k is HWIO (3, 3, C, C); conv2_k (1, 1, C, 3).
    """
    out, _ = _tail_fwd(pix, conv1_k, conv1_b, ln_s, ln_b, conv2_k,
                       conv2_b, approximate)
    return out


def _pad_lanes(x, to=None):
    want = to or max(_LANE, x.shape[-1])
    if x.shape[-1] == want:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, want - x.shape[-1])])


def _tail_fwd(pix, conv1_k, conv1_b, ln_s, ln_b, conv2_k, conv2_b,
              approximate):
    c, wp, w2 = _prep(pix, conv1_k, conv2_k)
    rows_blk = _choose_rows(pix.shape[1])
    out = _fwd_impl(_pad_lanes(pix), c, wp, _as_row(conv1_b, pix.dtype),
                    _as_row(ln_s, pix.dtype), _as_row(ln_b, pix.dtype),
                    w2, _as_row(conv2_b, pix.dtype), approximate,
                    rows_blk, min(8, rows_blk), _use_interpret())
    return out, (pix, conv1_k, conv1_b, ln_s, ln_b, conv2_k)


def _tail_bwd(approximate, res, g):
    pix, conv1_k, conv1_b, ln_s, ln_b, conv2_k = res
    c, wp, w2 = _prep(pix, conv1_k, conv2_k)
    wpb = _pack_w1_bwd(conv1_k).astype(pix.dtype)
    rows_blk = _choose_rows(pix.shape[1])
    go = _pad_lanes(g.astype(pix.dtype))
    dpix, dwp, db1, dlns, dlnb, dw2, db2 = _bwd_impl(
        _pad_lanes(pix), c, go, wp, wpb, _as_row(conv1_b, pix.dtype),
        _as_row(ln_s, pix.dtype), _as_row(ln_b, pix.dtype), w2,
        approximate, rows_blk, min(8, rows_blk), _use_interpret())
    sum_bl = lambda v: v.sum(axis=(0, 1))
    return (dpix[..., :c],
            _unpack_dw1(sum_bl(dwp), c).astype(conv1_k.dtype),
            sum_bl(db1).reshape(-1).astype(conv1_b.dtype),
            sum_bl(dlns).reshape(-1).astype(ln_s.dtype),
            sum_bl(dlnb).reshape(-1).astype(ln_b.dtype),
            sum_bl(dw2).reshape(conv2_k.shape).astype(conv2_k.dtype),
            sum_bl(db2).reshape(-1).astype(conv2_k.dtype))


fused_decoder_tail.defvjp(_tail_fwd, _tail_bwd)
