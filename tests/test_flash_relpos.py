"""Pallas fused-attention parity (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from painter_tpu.kernels.flash_relpos import flash_attention_relpos
from painter_tpu.ops.attention import rel_pos_bias

RNG = np.random.RandomState(0)


def _xla_ref(q, k, v, rph, rpw, q_size, scale):
    b, nh, L, hd = q.shape
    qh, qw = q_size
    attn = jnp.einsum("bnqd,bnkd->bnqk", q * scale, k)
    rel_h, rel_w = rel_pos_bias(q, rph, rpw, q_size, q_size)
    attn = attn.reshape(b, nh, qh, qw, qh, qw) \
        + rel_h[..., None] + rel_w[..., None, :]
    attn = jax.nn.softmax(attn.reshape(b, nh, L, L).astype(jnp.float32),
                          axis=-1)
    return jnp.einsum("bnqk,bnkd->bnqd", attn.astype(q.dtype), v)


@pytest.mark.parametrize("block_q", [8, 24])  # divisible + ragged tail
def test_flash_relpos_matches_xla(block_q):
    b, nh, qh, qw, hd = 2, 3, 8, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    ref = _xla_ref(q, k, v, rph, rpw, (qh, qw), scale)
    got = flash_attention_relpos(q, k, v, rph, rpw, (qh, qw), (qh, qw),
                                 scale, block_q=block_q,
                                 exp2_impl="native")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_relpos_resolution_interpolation():
    """Tables sized for an 8x4 grid used at 12x6 (rel-pos interp path)."""
    b, nh, qh, qw, hd = 1, 2, 12, 6, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * 8 - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * 4 - 1, hd), jnp.float32)
    scale = hd ** -0.5
    ref = _xla_ref(q, q, q, rph, rpw, (qh, qw), scale)
    got = flash_attention_relpos(q, q, q, rph, rpw, (qh, qw), (qh, qw),
                                 scale, block_q=16, exp2_impl="native")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_relpos_rw_tile_matches_xla():
    """The VPU lane-tile expansion of rel_w == the one-hot matmul path."""
    b, nh, qh, qw, hd = 1, 2, 8, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    ref = _xla_ref(q, k, v, rph, rpw, (qh, qw), scale)
    got = flash_attention_relpos(q, k, v, rph, rpw, (qh, qw), (qh, qw),
                                 scale, block_q=8, rw_tile=True,
                                 exp2_impl="native")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_relpos_folds_w_axis_when_h_overflows():
    """hd + k_h > 128 lanes but hd + k_w fits -> the w term is folded
    (the 70x35 COCO-eval regime for head_dim 64)."""
    from painter_tpu.kernels.flash_relpos import _fold_axis
    assert _fold_axis(64, (56, 28)) == "h"
    assert _fold_axis(64, (70, 35)) == "w"
    assert _fold_axis(120, (16, 8)) == "w"

    b, nh, qh, qw, hd = 1, 1, 16, 8, 120
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    ref = _xla_ref(q, q, q, rph, rpw, (qh, qw), scale)
    got = flash_attention_relpos(q, q, q, rph, rpw, (qh, qw), (qh, qw),
                                 scale, block_q=32, exp2_impl="native")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("block_q,rw_tile", [(8, False), (10, False),
                                             (8, True)])
def test_flash_relpos_gradients_match_xla(block_q, rw_tile):
    b, nh, qh, qw, hd = 2, 2, 6, 4, 8
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    gref = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)

    def loss_ref(*a):
        return jnp.sum(_xla_ref(*a[:3], a[3], a[4], (qh, qw), scale) * gref)

    def loss_pal(*a):
        return jnp.sum(flash_attention_relpos(
            *a, (qh, qw), (qh, qw), scale, block_q=block_q,
            rw_tile=rw_tile, exp2_impl="native") * gref)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for name, a, b_ in zip("q k v rph rpw".split(), g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, err_msg=name)


@pytest.mark.parametrize("max_mode", ["fixed", "exact"])
def test_flash_relpos_max_modes_match(max_mode):
    """Fixed-max softmax (no per-row max pass) is exact for bounded
    logits; both modes must match the XLA reference, including with a
    large uniform logit offset that the fixed mode absorbs unshifted."""
    b, nh, qh, qw, hd = 1, 2, 8, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    # push logits to ~±25 nats via a shared direction: well inside the
    # documented |logit| <= 79-nat validity envelope
    q = q.at[..., 0].add(5.0)
    k = k.at[..., 0].add(5.0 * hd ** 0.5)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    ref = _xla_ref(q, k, v, rph, rpw, (qh, qw), scale)
    got = flash_attention_relpos(q, k, v, rph, rpw, (qh, qw), (qh, qw),
                                 scale, max_mode=max_mode,
                                 exp2_impl="native")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_flash_relpos_fixed_max_gradients():
    b, nh, qh, qw, hd = 1, 2, 6, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5

    def loss(mode):
        def f(q_, k_, v_, rph_, rpw_):
            return jnp.sum(flash_attention_relpos(
                q_, k_, v_, rph_, rpw_, (qh, qw), (qh, qw), scale,
                max_mode=mode, exp2_impl="native") ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)

    # the two modes differ only in fp32 rounding of the saved lse
    for gf, ge, name in zip(loss("fixed"), loss("exact"),
                            ["dq", "dk", "dv", "drph", "drpw"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   atol=1e-4, err_msg=name)


def test_flash_relpos_fixed_max_all_underflow_row_is_finite():
    """A row whose logits all sit below the fp32 exp2 floor degrades to
    zeros under the fixed-max softmax (denominator floor), never NaN."""
    b, nh, qh, qw, hd = 1, 1, 4, 2, 16
    L = qh * qw
    q = jnp.full((b, nh, L, hd), -50.0, jnp.float32)  # logits ~ -3200
    k = jnp.full((b, nh, L, hd), 50.0, jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.zeros((2 * qh - 1, hd), jnp.float32)
    rpw = jnp.zeros((2 * qw - 1, hd), jnp.float32)
    out = flash_attention_relpos(q, k, v, rph, rpw, (qh, qw), (qh, qw),
                                 hd ** -0.5, max_mode="fixed")
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0, atol=1e-30)


def test_flash_relpos_fixed_max_overflow_gradients_finite():
    """Logits beyond the +EXP2_CLAMP envelope: the forward clamps and
    stays finite; the backward must mirror the clamp (ADVICE r2) so
    gradients are finite too, instead of exp2(s - lse) overflowing."""
    b, nh, qh, qw, hd = 1, 1, 4, 2, 16
    L = qh * qw
    # logits ~ +3200 in the exp2 domain — far past EXP2_CLAMP=114
    q = jnp.full((b, nh, L, hd), 50.0, jnp.float32)
    k = jnp.full((b, nh, L, hd), 50.0, jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.zeros((2 * qh - 1, hd), jnp.float32)
    rpw = jnp.zeros((2 * qw - 1, hd), jnp.float32)

    def f(q_, k_, v_):
        return jnp.sum(flash_attention_relpos(
            q_, k_, v_, rph, rpw, (qh, qw), (qh, qw), hd ** -0.5,
            max_mode="fixed") ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for g, name in zip(grads, ["dq", "dk", "dv"]):
        assert np.isfinite(np.asarray(g)).all(), name


def test_dkv_fused_gradients_match_unfused(monkeypatch):
    """The fused [dk|dv] accumulator layout (DKV_FUSED) is numerically
    identical to the two-buffer layout — same dots, one lane-concat
    (measured a perf tie on-chip; kept selectable)."""
    from painter_tpu.kernels import flash_relpos as fr

    b, nh, qh, qw, hd = 1, 2, 8, 4, 64
    L = qh * qw
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(b, nh, L, hd) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(b, nh, L, hd) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(b, nh, L, hd) * 0.1, jnp.float32)
    rph = jnp.asarray(rng.randn(2 * qh - 1, hd) * 0.1, jnp.float32)
    rpw = jnp.asarray(rng.randn(2 * qw - 1, hd) * 0.1, jnp.float32)

    def loss(q_, k_, v_, rph_, rpw_):
        return jnp.sum(fr.flash_attention_relpos(
            q_, k_, v_, rph_, rpw_, (qh, qw), (qh, qw), hd ** -0.5) ** 2)

    grads = {}
    for fused in (False, True):
        monkeypatch.setattr(fr, "DKV_FUSED", fused)
        grads[fused] = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            q, k, v, rph, rpw)
    for a, b_ in zip(grads[False], grads[True]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6)


def test_default_selection_shape_aware(monkeypatch):
    """Pin the measured default rules: flagship 448 grid -> bq784,
    ragged long-L (COCO-eval 560, L=2450) -> bq616 capping block_q*L at
    the flagship working set; fixed-max -> num_sub 1 on both fold axes."""
    from painter_tpu.kernels import flash_relpos as fr

    captured = {}

    def fake_core(q, k, v, rph, rpw, q_size, k_size, scale, block_q,
                  rw_tile, num_sub, max_mode, bwd_num_sub, exp2_impl):
        captured.update(block_q=block_q, rw_tile=rw_tile,
                        num_sub=num_sub, bwd_num_sub=bwd_num_sub)
        return q

    monkeypatch.setattr(fr, "_flash_core", fake_core)

    def call(qh, qw, hd=64):
        L = qh * qw
        q = jnp.zeros((1, 1, L, hd), jnp.float32)
        rph = jnp.zeros((2 * qh - 1, hd), jnp.float32)
        rpw = jnp.zeros((2 * qw - 1, hd), jnp.float32)
        fr.flash_attention_relpos(q, q, q, rph, rpw, (qh, qw), (qh, qw),
                                  1.0)
        return dict(captured)

    got = call(56, 28)  # flagship 448: L=1568, fold-h
    assert got == {"block_q": 784, "rw_tile": True, "num_sub": 1,
                   "bwd_num_sub": 1}
    got = call(70, 35)  # COCO-eval 560: L=2450, fold-w, ragged
    assert got == {"block_q": 616, "rw_tile": False, "num_sub": 1,
                   "bwd_num_sub": 2}
    got = call(14, 14)  # short L: one whole block, 8-aligned
    assert got["block_q"] == 200 and got["rw_tile"] is True

    # bwd tile: flagship fold-h gets the measured unsplit full-L
    # backward tile (645.2 vs 650.3 ms/step); other shapes keep the
    # forward tile
    assert fr._bwd_block_q_default(1568, 784, True) == 1568
    assert fr._bwd_block_q_default(1568, 784, False) == 784
    assert fr._bwd_block_q_default(2450, 616, False) == 616
    assert fr._bwd_block_q_default(200, 200, True) == 200


def test_exp2_poly3_matches_native():
    """The integer-trick exp2 (softmax attempt #4): rel err <= 1e-4 over
    the kernel's whole operating envelope, exact zero below -126."""
    from painter_tpu.kernels.flash_relpos import _exp2

    x = jnp.asarray(np.linspace(-130.0, 114.0, 200001), jnp.float32)
    got = np.asarray(_exp2(x, "poly3"))
    ref = np.asarray(_exp2(x, "native"))
    live = np.asarray(x) >= -125.0  # above the denormal flush point
    rel = np.abs(got[live] / ref[live] - 1.0)
    assert rel.max() < 1e-4
    assert (got[np.asarray(x) < -126.0] == 0.0).all()
    assert np.isfinite(got).all()


@pytest.mark.parametrize("max_mode", ["fixed", "exact"])
def test_flash_relpos_poly3_exp2_matches_native(max_mode):
    """poly3 softmax exp2 == native within bf16-level tolerance, forward
    and gradients, both max modes."""
    b, nh, qh, qw, hd = 1, 2, 8, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5

    def f(q_, k_, v_, impl):
        return flash_attention_relpos(q_, k_, v_, rph, rpw, (qh, qw),
                                      (qh, qw), scale, max_mode=max_mode,
                                      exp2_impl=impl)

    out_n = f(q, k, v, "native")
    out_p = f(q, k, v, "poly3")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               atol=2e-4)

    loss = lambda impl: (lambda q_, k_, v_:
                         jnp.sum(f(q_, k_, v_, impl) ** 2))
    gn = jax.grad(loss("native"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss("poly3"), argnums=(0, 1, 2))(q, k, v)
    # the 7.5e-5 exp2 error amplifies through the (dp - delta)
    # cancellation in ds to ~0.25% relative on the worst grad element —
    # still at the bf16 noise scale production injects at the very same
    # spot (ds/p are cast to bf16 for the gradient matmuls)
    for a, b_, name in zip(gp, gn, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, err_msg=name)


def test_flash_relpos_bf16_gradients_near_fp32_xla():
    """bf16 kernel grads vs the fp32 XLA path, within the bf16 operand-
    rounding envelope.

    Pins the delta-in-matmul-lane backward design: delta = rowsum(do*o)
    rides appended to do against v's appended minus-ones column, so it
    enters the dp matmul bf16-rounded exactly like the do/v operands.
    This bound (rel Frobenius ~1e-2 per leaf) would catch a precision
    regression if delta's rounding were ever amplified beyond operand
    rounding."""
    b, nh, qh, qw, hd = 2, 2, 6, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    gref = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)

    def loss_ref(q_, k_, v_, rph_, rpw_):
        return jnp.sum(_xla_ref(q_, k_, v_, rph_, rpw_, (qh, qw),
                                scale) * gref)

    def loss_bf16(q_, k_, v_, rph_, rpw_):
        out = flash_attention_relpos(
            q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
            v_.astype(jnp.bfloat16), rph_, rpw_, (qh, qw), (qh, qw),
            scale, block_q=8, exp2_impl="native")
        return jnp.sum(out.astype(jnp.float32) * gref)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, rph, rpw)
    g_bf = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, v, rph, rpw)
    for name, a, b_ in zip("dq dk dv".split(), g_ref, g_bf):
        ref_n = np.linalg.norm(np.asarray(a))
        err_n = np.linalg.norm(np.asarray(a) - np.asarray(b_,
                                                          np.float32))
        assert err_n / ref_n < 2e-2, (name, err_n / ref_n)


@pytest.mark.parametrize("tiles", [{"dp"}, {"s", "dp"}])
def test_flash_relpos_bwd_bf16_tiles_within_envelope(tiles):
    """BWD_TILE_BF16 grads stay inside the bf16 operand-rounding envelope.

    The round-5 perf A/B (VERDICT item 1) emits the backward's (bq, L)
    logit / dp tiles in bf16 (fp32 MXU accumulation, immediate upcast).
    The numeric contract: with bf16 INPUTS the variant grads must stay
    within the same rel-Frobenius envelope vs the fp32 XLA path as the
    production fp32-tile kernel (test above), and must be close to the
    production kernel's own grads — one extra bf16 rounding of a tile
    whose operands were already bf16.
    """
    import painter_tpu.kernels.flash_relpos as fr

    b, nh, qh, qw, hd = 2, 2, 6, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    gref = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_xla_ref(q_, k_, v_, rph, rpw, (qh, qw),
                                scale) * gref)

    def loss_bf16(q_, k_, v_):
        out = flash_attention_relpos(
            q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
            v_.astype(jnp.bfloat16), rph, rpw, (qh, qw), (qh, qw),
            scale, block_q=8, exp2_impl="native")
        return jnp.sum(out.astype(jnp.float32) * gref)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_base = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, v)
    orig = fr.BWD_TILE_BF16
    fr.BWD_TILE_BF16 = frozenset(tiles)
    try:
        g_var = jax.grad(loss_bf16, argnums=(0, 1, 2))(q, k, v)
    finally:
        fr.BWD_TILE_BF16 = orig
    for name, r, bse, var in zip("dq dk dv".split(), g_ref, g_base,
                                 g_var):
        r, bse, var = (np.asarray(x, np.float32) for x in (r, bse, var))
        ref_n = np.linalg.norm(r)
        # same envelope as the production bf16 kernel vs fp32 XLA
        assert np.linalg.norm(r - var) / ref_n < 2e-2, name
        # and close to the production kernel's own grads
        assert np.linalg.norm(bse - var) / np.linalg.norm(bse) < 1e-2, \
            name


@pytest.mark.parametrize("knob,val", [("BWD_FOLD_DQ_DRX", True),
                                      ("BWD_EXP2_IMPL", "poly3")])
def test_flash_relpos_bwd_knobs_gradient_parity(knob, val):
    """Round-5 backward knobs keep gradient parity.

    BWD_FOLD_DQ_DRX computes the same dq/drx products through one
    lane-concat MXU pass — gradients must match the base kernel to fp32
    noise. BWD_EXP2_IMPL='poly3' swaps only the backward's exp2
    lowering (7.5e-5 rel err on p) — gradients must stay inside the
    kernel's bf16-vs-fp32-XLA envelope and near the base kernel.
    """
    import painter_tpu.kernels.flash_relpos as fr

    b, nh, qh, qw, hd = 2, 2, 6, 4, 16
    L = qh * qw
    q = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    k = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    v = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)
    rph = jnp.asarray(RNG.randn(2 * qh - 1, hd), jnp.float32)
    rpw = jnp.asarray(RNG.randn(2 * qw - 1, hd), jnp.float32)
    scale = hd ** -0.5
    gref = jnp.asarray(RNG.randn(b, nh, L, hd), jnp.float32)

    def loss(q_, k_, v_):
        out = flash_attention_relpos(
            q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
            v_.astype(jnp.bfloat16), rph, rpw, (qh, qw), (qh, qw),
            scale, block_q=8, exp2_impl="native")
        return jnp.sum(out.astype(jnp.float32) * gref)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_xla_ref(q_, k_, v_, rph, rpw, (qh, qw),
                                scale) * gref)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    orig = getattr(fr, knob)
    setattr(fr, knob, val)
    try:
        g_var = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        setattr(fr, knob, orig)
    for name, r, bse, var in zip("dq dk dv".split(), g_ref, g_base,
                                 g_var):
        r, bse, var = (np.asarray(x, np.float32) for x in (r, bse, var))
        assert np.linalg.norm(r - var) / np.linalg.norm(r) < 2e-2, name
        tol = 1e-6 if knob == "BWD_FOLD_DQ_DRX" else 1e-3
        assert np.linalg.norm(bse - var) / np.linalg.norm(bse) < tol, \
            (name, np.linalg.norm(bse - var) / np.linalg.norm(bse))


def test_windowed_blocks_pallas_vs_xla_parity():
    """Windowed blocks (window_partition -> L=ws^2 tiles -> kernel) keep
    forward AND gradient parity between the Pallas kernel and the XLA
    attention path — the genuinely-windowed architecture the flagship
    model name advertises (models_painter.py:481-482), measured on-chip
    in docs/measurements/ROUND5.md."""
    from painter_tpu import configs
    from painter_tpu.models import incontext_vit as m

    cfg = configs.tiny_test_config(
        img_size=(64, 32), pretrain_img_size=32, window_size=2,
        window_block_indexes=(0, 1, 3), window_rel_pos_tables=True)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    L = cfg.num_patches
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
    mask = jnp.zeros((2, L)).at[:, L // 2:].set(1.0)
    outs = {}
    for impl in ("xla", "pallas"):
        f = jax.jit(lambda p, i, _im=impl: m.predict_query_half(
            p, cfg, i, i, mask, attn_impl=_im))
        outs[impl] = np.asarray(f(params, imgs))
    assert np.isfinite(outs["xla"]).all()
    assert np.abs(outs["xla"] - outs["pallas"]).max() < 3e-2

    def loss(p, impl):
        l, _, _ = m.forward(p, cfg, imgs, imgs, mask, train=False,
                            attn_impl=impl)
        return l

    g1 = jax.grad(lambda p: loss(p, "xla"))(params)
    g2 = jax.grad(lambda p: loss(p, "pallas"))(params)
    n1 = np.sqrt(sum(float(jnp.vdot(x, x).real)
                     for x in jax.tree.leaves(g1)))
    rel = np.sqrt(sum(float(jnp.vdot(a - b, a - b).real)
                      for a, b in zip(jax.tree.leaves(g1),
                                      jax.tree.leaves(g2)))) / n1
    assert rel < 3e-2, rel
