"""Inference engines: image, multi-prompt, video, painter task specs."""
import os

import jax
import numpy as np
import pytest
from PIL import Image

from painter_tpu import configs
from painter_tpu.infer import engine
from painter_tpu.models import incontext_vit as m


@pytest.fixture(scope="module")
def tiny_model():
    cfg = configs.tiny_test_config(img_size=(64, 32), pretrain_img_size=32,
                                   seg_type_tokens=True)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    return engine.InContextModel(cfg, params, attn_impl="xla")


def _write_img(path, size=(50, 40), color=None):
    rng = np.random.RandomState(0)
    arr = (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8) \
        if color is None else np.full((size[1], size[0], 3), color, np.uint8)
    Image.fromarray(arr).save(path)
    return path


def test_inference_image_single_and_multi_prompt(tiny_model, tmp_path):
    img = _write_img(str(tmp_path / "q.png"))
    p1 = _write_img(str(tmp_path / "p1.png"))
    t1 = _write_img(str(tmp_path / "t1.png"), color=255)
    p2 = _write_img(str(tmp_path / "p2.png"))
    t2 = _write_img(str(tmp_path / "t2.png"), color=0)
    out = str(tmp_path / "out.png")

    res = tiny_model.cfg.img_size[1]
    o1 = engine.inference_image(tiny_model, img, [p1], [t1], out, res=res)
    assert o1.shape == (40, 50, 3) and os.path.exists(out)
    assert np.isfinite(o1).all() and o1.min() >= 0 and o1.max() <= 255

    # multi-prompt hits the feature-ensemble path (merge_between_batch=0)
    o2 = engine.inference_image(tiny_model, img, [p1, p2], [t1, t2], out,
                                res=res)
    assert o2.shape == (40, 50, 3)


def test_prompt_padding_bucket_parity(tiny_model):
    """n=3 prompts pad to the 4-bucket with weights [1/3,1/3,1/3,0]; the
    weighted ensemble must reproduce the exact-shape (unpadded) mean."""
    cfg = tiny_model.cfg
    exact = engine.InContextModel(cfg, tiny_model.params, attn_impl="xla",
                                  pad_prompts=False)
    rng = np.random.RandomState(3)
    h, w = cfg.img_size
    img = rng.rand(3, h, w, 3).astype(np.float32)
    tgt = rng.rand(3, h, w, 3).astype(np.float32)
    o_pad = tiny_model.run_one_image(img, tgt)
    o_exact = exact.run_one_image(img, tgt)
    assert o_pad.shape == o_exact.shape
    np.testing.assert_allclose(o_pad, o_exact, atol=1e-4, rtol=1e-4)


def test_prompt_bucket_compile_reuse(tiny_model):
    """Prompt counts 3 and 4 share the 4-bucket compile."""
    cfg = tiny_model.cfg
    rng = np.random.RandomState(4)
    h, w = cfg.img_size
    before = None
    for n in (3, 4):
        img = rng.rand(n, h, w, 3).astype(np.float32)
        tgt = rng.rand(n, h, w, 3).astype(np.float32)
        out = tiny_model.run_one_image(img, tgt)
        assert out.shape == (h // 2, w, 3) and np.isfinite(out).all()
        if before is None:
            before = tiny_model._predict._cache_size()
    # n=4 reuses the 4-bucket entry compiled for n=3: no cache growth
    assert tiny_model._predict._cache_size() == before


def test_inference_video_rolling_cache(tiny_model, tmp_path):
    import cv2
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (48, 36))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write((rng.rand(36, 48, 3) * 255).astype(np.uint8))
    w.release()
    tgt = _write_img(str(tmp_path / "t.png"), color=255)
    out = str(tmp_path / "out.mp4")
    res = tiny_model.cfg.img_size[1]
    n = engine.inference_video(tiny_model, vid, num_frames=2,
                               img2_paths=None, tgt2_paths=[tgt],
                               out_path=out, res=res)
    # first frame consumed as the anchor prompt (seggpt_engine.py:116-118)
    assert n == 3 and os.path.exists(out)


def test_video_binarization_threshold(tiny_model, tmp_path, monkeypatch):
    """A bright prediction must yield a nonzero cached re-prompt target
    (regression: an early port applied the reference's >128 threshold
    to the [0,1]-scale output without the x255, silently producing
    all-black re-prompts; the exact reference math is pinned by
    test_video_binarize_reference_threshold below)."""
    import cv2
    vid = str(tmp_path / "in2.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (48, 36))
    rng = np.random.RandomState(1)
    for _ in range(3):
        w.write((rng.rand(36, 48, 3) * 255).astype(np.uint8))
    w.release()
    tgt = _write_img(str(tmp_path / "t2.png"), color=255)

    bright = np.full((tiny_model.cfg.img_size[1],
                      tiny_model.cfg.img_size[1], 3), 0.9, np.float32)
    monkeypatch.setattr(tiny_model, "run_one_image",
                        lambda imgs, tgts: bright)
    captured = []
    orig_build = engine.build_prompt_batch

    def spy(query, prompts):
        captured.append([t for _, t in prompts])
        return orig_build(query, prompts)

    monkeypatch.setattr(engine, "build_prompt_batch", spy)
    engine.inference_video(tiny_model, vid, num_frames=2, img2_paths=None,
                           tgt2_paths=[tgt], out_path=str(tmp_path / "o.mp4"),
                           res=tiny_model.cfg.img_size[1],
                           cache_impl="host")  # the spied path
    # by the second frame the cache holds a binarized previous prediction
    cached_targets = captured[-1][1:]
    assert cached_targets and all(t.max() == 1.0 for t in cached_targets)


def test_video_device_engine_matches_host_cache(tiny_model):
    """The device-resident rolling-cache engine (VideoEngine) must paint
    the same frames as the host-cache path: same normalize math (fp32),
    same FIFO semantics, same weight-0 bucket padding. Runs enough
    frames to exercise bucket growth 1->2->4 AND the circular overwrite
    of a full cache."""
    rng = np.random.RandomState(3)
    res = tiny_model.cfg.img_size[1]
    frames = [(rng.rand(40, 52, 3) * 255).astype(np.uint8)
              for _ in range(7)]
    tgt2 = (rng.rand(res, res, 1) > 0.5).astype(np.float32) \
        .repeat(3, axis=-1)
    host = list(engine.run_video_frames(tiny_model, frames, tgt2,
                                        num_frames=2, res=res))
    dev = list(engine.run_video_frames_device(tiny_model, frames, tgt2,
                                              num_frames=2, res=res))
    assert len(host) == len(dev) == 6
    for i, (a, b) in enumerate(zip(host, dev)):
        # uint8 composites; allow the odd +-1 rounding step from fp32
        # reassociation between the host and in-graph normalize
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01, \
            (i, diff.max(), (diff > 0).mean())


def test_painter_task_specs(tiny_model, tmp_path):
    img = _write_img(str(tmp_path / "q.png"), size=(30, 26))
    p = _write_img(str(tmp_path / "p.png"))
    t = _write_img(str(tmp_path / "t.png"))
    res = tiny_model.cfg.img_size[1]
    # depth: channel-mean, x10000
    d = engine.painter_task_inference(tiny_model, img, p, t, "depth",
                                      res=res)
    assert d.shape == (26, 30) and d.max() <= 10000.0 and d.min() >= 0
    # restoration: float, unclipped scale 1
    r = engine.painter_task_inference(tiny_model, img, p, t, "restoration",
                                      res=res)
    assert r.shape == (26, 30, 3)
    # segmentation: x255 clipped
    s = engine.painter_task_inference(tiny_model, img, p, t,
                                      "ade20k_semseg", res=res)
    assert s.shape == (26, 30, 3) and s.max() <= 255.0


def test_run_queries_matches_per_image(tiny_model):
    """Batched independent queries == the per-image loop."""
    rng = np.random.RandomState(3)
    res = tiny_model.cfg.img_size[1]
    img2 = rng.rand(res, res, 3)
    tgt2 = rng.rand(res, res, 3)
    queries = [rng.rand(res, res, 3) for _ in range(3)]
    imgs, tgts = engine.build_query_batch(queries, img2, tgt2)
    batched = tiny_model.run_queries(imgs, tgts)
    for q, got in zip(queries, batched):
        i1, t1 = engine.build_prompt_batch(q, [(img2, tgt2)])
        ref = tiny_model.run_one_image(i1, t1)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_run_queries_shared_matches_stacked(tiny_model):
    """The shared-prompt fast path (queries-only upload, in-graph
    normalize/stitch) == the stacked-batch path == the per-image loop."""
    rng = np.random.RandomState(5)
    res = tiny_model.cfg.img_size[1]
    img2 = rng.rand(res, res, 3)
    tgt2 = rng.rand(res, res, 3)
    queries = [rng.rand(res, res, 3) for _ in range(3)]
    imgs, tgts = engine.build_query_batch(queries, img2, tgt2)
    stacked = tiny_model.run_queries(imgs, tgts)
    shared = tiny_model.run_queries_shared(
        np.stack(queries).astype(np.float32), img2, tgt2)
    np.testing.assert_allclose(shared, stacked, atol=1e-5)
    # prompt device cache: same arrays -> cache hit, new arrays -> miss
    dev = tiny_model._prompt_dev_cache[2]
    tiny_model.run_queries_shared(
        np.stack(queries).astype(np.float32), img2, tgt2)
    assert tiny_model._prompt_dev_cache[2] is dev
    tiny_model.run_queries_shared(
        np.stack(queries).astype(np.float32), img2.copy(), tgt2)
    assert tiny_model._prompt_dev_cache[2] is not dev
    # the cache must HOLD the host prompt arrays: an id()-only key let
    # CPython recycle a freed array's address for a same-shaped new
    # prompt and silently served the stale device tensors (round-4
    # code-review finding; the panoptic rehearsal's inst->semseg prompt
    # swap is the realistic trigger)
    assert tiny_model._prompt_dev_cache[0] is not img2  # the copy
    assert tiny_model._prompt_dev_cache[1] is tgt2


def test_run_queries_mesh_sharded(tiny_model):
    """dp-mesh-sharded serving path == unsharded (pads ragged batches)."""
    from jax.sharding import Mesh
    cfg = tiny_model.cfg
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
    sharded = engine.InContextModel(cfg, tiny_model.params,
                                    attn_impl="xla", mesh=mesh)
    rng = np.random.RandomState(4)
    res = cfg.img_size[1]
    img2 = rng.rand(res, res, 3)
    tgt2 = rng.rand(res, res, 3)
    queries = [rng.rand(res, res, 3) for _ in range(6)]  # ragged vs dp=4
    imgs, tgts = engine.build_query_batch(queries, img2, tgt2)
    got = sharded.run_queries(imgs, tgts, real_count=6)
    assert got.shape[0] == 6
    ref = tiny_model.run_queries(imgs, tgts)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_uint8_io_exactness_lattice():
    """The uint8 I/O helpers are exact vs the host chains they replace.

    from_uint8: fp32(u)/fp32(255) == fp32(f64(u)/255.0) for ALL 256
    values (both correctly-rounded divisions of exact operands), so a
    uint8 query upload is bit-identical downstream.  to_uint8_255 ==
    np.clip(out*255, 0, 255).astype(np.uint8) (the run_eval PNG write
    chain) including out-of-gamut and exact-lattice inputs.
    """
    import jax.numpy as jnp
    from painter_tpu.ops import image as image_ops

    u = np.arange(256, dtype=np.uint8).reshape(16, 16)
    host = (u.astype(np.float64) / 255.0).astype(np.float32)
    dev = np.asarray(jax.jit(image_ops.from_uint8)(jnp.asarray(u)))
    assert np.array_equal(host.view(np.uint32), dev.view(np.uint32))

    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.randn(1024).astype(np.float32),
        rng.rand(1024).astype(np.float32),
        np.linspace(-0.25, 1.25, 1024, dtype=np.float32),
        (np.arange(256) / 255.0).astype(np.float32),
    ])
    host_u8 = np.clip(x * np.float32(255.0), 0, 255).astype(np.uint8)
    dev_u8 = np.asarray(jax.jit(image_ops.to_uint8_255)(jnp.asarray(x)))
    assert np.array_equal(host_u8, dev_u8)


def test_run_queries_shared_uint8_io(tiny_model):
    """uint8 queries paint bit-identically to the fp32 [0,1] path, and
    out_dtype=uint8 returns exactly the host-side write-path values."""
    rng = np.random.RandomState(5)
    res = tiny_model.cfg.img_size[1]
    q_u8 = (rng.rand(2, res, res, 3) * 255).astype(np.uint8)
    img2 = rng.rand(res, res, 3).astype(np.float32)
    tgt2 = rng.rand(res, res, 3).astype(np.float32)

    out_f = tiny_model.run_queries_shared(
        (q_u8 / 255.0).astype(np.float32), img2, tgt2)
    out_f_u8in = tiny_model.run_queries_shared(q_u8, img2, tgt2)
    assert out_f_u8in.dtype == np.float32
    assert np.array_equal(out_f, out_f_u8in)

    out_u8 = tiny_model.run_queries_shared(q_u8, img2, tgt2,
                                           out_dtype=np.uint8)
    host_u8 = np.clip(out_f_u8in * np.float32(255.0), 0,
                      255).astype(np.uint8)
    assert out_u8.dtype == np.uint8
    assert np.array_equal(out_u8, host_u8)


def test_video_engine_uint8_query_and_out(tiny_model):
    """VideoEngine paints identically for uint8 vs fp32 queries (in-graph
    /255 is bit-exact) and its uint8 fetch matches the host cast; the
    rolling cache evolves identically (in-graph binarize both ways)."""
    rng = np.random.RandomState(7)
    res = tiny_model.cfg.img_size[1]
    img2 = rng.rand(res, res, 3)
    tgt2 = (rng.rand(res, res, 1) > 0.5).astype(np.float32) \
        .repeat(3, axis=-1)
    ve_f = engine.VideoEngine(tiny_model, 2, img2, tgt2)
    ve_u = engine.VideoEngine(tiny_model, 2, img2, tgt2)
    ve_u8out = engine.VideoEngine(tiny_model, 2, img2, tgt2)
    for _ in range(4):
        fr8 = (rng.rand(res, res, 3) * 255).astype(np.uint8)
        of = ve_f.paint_frame((fr8 / 255.0).astype(np.float32))
        ou = ve_u.paint_frame(fr8)
        o8 = ve_u8out.paint_frame(fr8, out_dtype=np.uint8)
        assert np.array_equal(of, ou)
        assert o8.dtype == np.uint8
        assert np.array_equal(
            o8, np.clip(ou * np.float32(255.0), 0, 255).astype(np.uint8))


def test_video_binarize_reference_threshold(tiny_model, tmp_path,
                                            monkeypatch):
    """The rolling-cache binarization is the reference's
    ``clip(out*255, 0, 255).mean(-1) > 128`` (seggpt_engine.py:52 +
    :167-171) — note 128/255 > 0.5, so a painted value of 0.501 must
    produce an all-ZERO cached mask (a plain 0.5 threshold on the [0,1]
    scale, as shipped before round 5, wrongly binarized it to 1)."""
    import cv2
    res = tiny_model.cfg.img_size[1]
    vid = str(tmp_path / "thr.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (48, 36))
    rng = np.random.RandomState(1)
    for _ in range(3):
        w.write((rng.rand(36, 48, 3) * 255).astype(np.uint8))
    w.release()
    tgt = _write_img(str(tmp_path / "thr_t.png"), color=255)

    orig_build = engine.build_prompt_batch
    for val, expect in ((0.501, 0.0), (0.503, 1.0)):
        out_const = np.full((res, res, 3), val, np.float32)
        monkeypatch.setattr(tiny_model, "run_one_image",
                            lambda imgs, tgts, _o=out_const: _o)
        captured = []

        def spy(query, prompts, _c=captured, _orig=orig_build):
            _c.append([t for _, t in prompts])
            return _orig(query, prompts)

        monkeypatch.setattr(engine, "build_prompt_batch", spy)
        engine.inference_video(
            tiny_model, vid, num_frames=2, img2_paths=None,
            tgt2_paths=[tgt], out_path=str(tmp_path / "thr_o.mp4"),
            res=res, cache_impl="host")
        cached = captured[-1][1:]
        assert cached and all(float(t.max()) == expect for t in cached), \
            (val, expect, [float(t.max()) for t in cached])
