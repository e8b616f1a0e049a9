"""ViT-L-shape multichip evidence (VERDICT r1 item 7).

The dryrun smoke uses a tiny config; these tests pin the FLAGSHIP
ViT-L shapes: (a) ``param_spec`` shards the intended axes of the real
param tree under fsdp, (b) the sharded train step AOT-compiles on the
8-virtual-device CPU mesh at full ViT-L shapes (abstract inputs — no
1.2 GB of real params needed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from painter_tpu import configs
from painter_tpu.models import incontext_vit as m
from painter_tpu.parallel import mesh as mesh_lib

VITL = "painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1"


@pytest.fixture(scope="module")
def vitl_abstract_params():
    cfg = configs.get_config(VITL)
    params = jax.eval_shape(lambda k: m.init_params(k, cfg),
                            jax.random.PRNGKey(0))
    return cfg, params


def test_param_spec_picks_intended_axes_vitl(vitl_abstract_params):
    cfg, params = vitl_abstract_params
    spec = jax.tree_util.tree_map(
        lambda leaf: mesh_lib.param_spec(leaf, fsdp_size=2), params)

    b = spec["blocks"]
    # stacked (depth, 1024, 3072) qkv kernel: shard the 3072 output axis
    assert b["attn"]["qkv"]["kernel"] == P(None, None, "fsdp")
    assert b["mlp"]["fc1"]["kernel"] == P(None, None, "fsdp")
    assert b["mlp"]["fc2"]["kernel"] == P(None, "fsdp", None)
    # rel-pos tables (depth, 111, 64): 111 odd, 64 < 128 -> replicated
    assert b["attn"]["rel_pos_h"] == P()
    # biases (depth, 3072): divisible and >=128 -> sharded
    assert b["attn"]["qkv"]["bias"] == P(None, "fsdp")
    # LN scales (depth, 1024) shard too (ZeRO-style param sharding)
    assert b["norm1"]["scale"] == P(None, "fsdp")
    # patch embed conv kernel (16, 16, 3, 1024): shard the channel axis
    assert spec["patch_embed"]["kernel"] == P(None, None, None, "fsdp")
    # pos embed (1, L+1, 1024): shard the feature axis
    assert spec["pos_embed"][-1] == "fsdp"

    # every large leaf (>= 1 MB fp32) must actually be sharded
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in leaves:
        if np.prod(leaf.shape) * 4 >= 1 << 20:
            s = mesh_lib.param_spec(leaf, 2)
            assert any(ax == "fsdp" for ax in s), (path, leaf.shape)


def test_kernel_shard_wrapper_parity_and_grads():
    """shard_batch0_kernel: forward parity AND exact grads for both the
    batch-sharded and the replicated (rel-pos-table-like) inputs.

    Mosaic calls cannot be GSPMD-partitioned (jax tpu_custom_call
    raises under a >1-device ShardingContext), so every kernel site
    wraps itself with this helper on a mesh; check_vma=False must not
    drop the psum on the replicated input's cotangent."""
    mesh = mesh_lib.make_mesh(4, 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 6, 16), jnp.float32)   # batch-sharded
    w = jnp.asarray(rng.randn(16), jnp.float32)          # replicated

    def core(xl, wl):
        return jnp.tanh(xl * wl)

    wrapped = mesh_lib.shard_batch0_kernel(
        core, n_batch_args=1, n_rep_args=1,
        kernel_mesh=(mesh, ("dp", "fsdp")))

    np.testing.assert_allclose(np.asarray(wrapped(x, w)),
                               np.asarray(core(x, w)), atol=1e-6)

    def loss(f, x, w):
        return jnp.sum(f(x, w) ** 2)

    g_ref = jax.grad(loss, argnums=(1, 2))(core, x, w)
    g_sm = jax.jit(jax.grad(loss, argnums=(1, 2)),
                   static_argnums=0)(wrapped, x, w)
    np.testing.assert_allclose(np.asarray(g_sm[0]), np.asarray(g_ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sm[1]), np.asarray(g_ref[1]),
                               atol=1e-5)

    # no-op on a single device
    assert mesh_lib.shard_batch0_kernel(core, 1, 1, None) is core


def test_fused_int8_mlp_under_shard_map():
    """The serving engine's kernel_mesh path: the fused int8 MLP runs
    inside shard_map over a dp mesh (interpret mode on the CPU devices)
    and matches the unsharded kernel."""
    from painter_tpu.kernels.int8_mlp import int8_mlp
    from painter_tpu.ops import quant

    mesh = mesh_lib.make_mesh(4, 2)
    rng = np.random.RandomState(1)
    k, n = 64, 128
    q1 = quant.quantize_linear_params(
        {"kernel": jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32),
         "bias": jnp.asarray(rng.randn(n) * 0.05, jnp.float32)})
    q2 = quant.quantize_linear_params(
        {"kernel": jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32),
         "bias": jnp.asarray(rng.randn(k) * 0.05, jnp.float32)})
    x = jnp.asarray(rng.randn(8, 12, k), jnp.bfloat16)

    def kern(x_, k1, s1, b1, k2, s2, b2):
        return int8_mlp(x_, {"kernel_q": k1, "scale": s1, "bias": b1},
                        {"kernel_q": k2, "scale": s2, "bias": b2},
                        block_m=8, interpret=True)

    wrapped = mesh_lib.shard_batch0_kernel(
        kern, n_batch_args=1, n_rep_args=6, kernel_mesh=(mesh, ("dp",)))
    got = np.asarray(wrapped(x, q1["kernel_q"], q1["scale"], q1["bias"],
                             q2["kernel_q"], q2["scale"], q2["bias"]),
                     np.float32)
    ref = np.asarray(int8_mlp(x, q1, q2, block_m=8, interpret=True),
                     np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_vitl_sharded_train_step_compiles(vitl_abstract_params):
    """AOT-lower + compile the FULL ViT-L train step (accum + AdamW +
    layer decay + remat) over the dp=4 x fsdp=2 CPU mesh."""
    from painter_tpu.train import optim, step as step_lib

    cfg, abstract_params = vitl_abstract_params
    mesh = mesh_lib.make_mesh(4, 2)
    oc = optim.OptimConfig(steps_per_epoch=10)

    def abstract_state():
        params = jax.eval_shape(lambda k: m.init_params(k, cfg),
                                jax.random.PRNGKey(0))
        optimizer = optim.make_optimizer(params, cfg, oc)
        return jax.eval_shape(
            lambda p: step_lib.init_train_state(p, optimizer), params)

    params = jax.eval_shape(lambda k: m.init_params(k, cfg),
                            jax.random.PRNGKey(0))
    optimizer = optim.make_optimizer(params, cfg, oc)
    state = jax.eval_shape(
        lambda p: step_lib.init_train_state(p, optimizer), params)

    state_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, mesh_lib.param_spec(leaf, 2)),
        state)
    state = jax.tree_util.tree_map(
        lambda leaf, sh: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                              sharding=sh),
        state, state_sh)

    h, w = cfg.img_size
    bsz, accum = 8, 2
    batch_sh = NamedSharding(mesh, P(None, ("dp", "fsdp")))
    L = cfg.num_patches

    def arr(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=batch_sh)

    batch = {"imgs": arr((accum, bsz, h, w, 3)),
             "tgts": arr((accum, bsz, h, w, 3)),
             "mask": arr((accum, bsz, L)),
             "valid": arr((accum, bsz, h, w, 3))}
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32,
                               sharding=NamedSharding(mesh, P()))

    train_step = jax.jit(
        step_lib.make_train_step(cfg, optimizer, accum_iter=accum,
                                 remat=True, attn_impl="xla", mesh=mesh),
        donate_argnums=(0,))
    compiled = train_step.lower(state, batch, rng).compile()
    # compiled with fsdp-sharded param outputs on the 8-device mesh
    out_state_sh = jax.tree_util.tree_leaves(
        compiled.output_shardings[0]["params"])
    assert any(s.spec != P() for s in out_state_sh)
    assert all(s.mesh.devices.size == 8 for s in out_state_sh)
