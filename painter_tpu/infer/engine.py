"""In-context inference engines (SegGPT + Painter protocols).

Behavioral contract from ``SegGPT/SegGPT_inference/seggpt_engine.py`` and
``Painter/eval/*/painter_inference_*.py``:

- resize prompt/query to 448^2 (targets NEAREST for SegGPT), stack
  prompt-over-query into 896x448, ImageNet-normalize; the masked target's
  bottom half is a copy of the prompt target (:64-91);
- bottom-half patch mask; multi-prompt -> prompt batch with feature
  ensemble (``feat_ensemble = 0 iff num_prompts > 1``, :46);
- output = bottom half of the unpatchified prediction, de-normalized,
  scaled per task and resized to the original size with a per-task
  interpolation mode (seggpt: x255 nearest; ade20k/coco-semseg: x255
  bilinear; depth: x10000 bilinear then channel-mean; pose/inst: x255
  nearest; restoration: [0,1] bicubic) — see `painter_inference_*.py`;
- video: rolling cache of recent frames + binarized predictions as extra
  prompts; predictions are serially dependent frame-to-frame (:106-181).

TPU-native notes: the forward + bottom-half extraction + de-normalization
run as one jitted function (recompiled per prompt-count bucket); the
host side does its own normalize and torch-exact output resize in numpy
(native C ops when available) so the driver loops never serialize on
eager per-image device dispatches. The dispatcher prefers the Pallas
fused attention on TPU.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from painter_tpu.configs import ModelConfig
from painter_tpu.models import incontext_vit as model_lib
from painter_tpu.ops import image as image_ops


def default_attn_impl() -> str:
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """Per-task output decoding protocol (painter_inference_*.py)."""
    name: str
    out_scale: float = 255.0
    clip: Optional[Tuple[float, float]] = (0.0, 255.0)
    resize_mode: str = "bilinear"
    channel_mean: bool = False  # depth: mean over RGB after resize


TASK_SPECS = {
    # seggpt_engine.py:48-53,97-103
    "seggpt": TaskSpec("seggpt", 255.0, (0.0, 255.0), "nearest"),
    # eval/ade20k_semantic/painter_inference_segm.py:88-91
    "ade20k_semseg": TaskSpec("ade20k_semseg", 255.0, (0.0, 255.0),
                              "bilinear"),
    # eval/coco_panoptic/painter_inference_pano_semseg.py
    "coco_semseg": TaskSpec("coco_semseg", 255.0, (0.0, 255.0), "bilinear"),
    # eval/coco_panoptic/painter_inference_pano_inst.py:89-90
    "coco_inst": TaskSpec("coco_inst", 255.0, (0.0, 255.0), "nearest"),
    # eval/mmpose_custom/painter_inference_pose.py:87-88
    "pose": TaskSpec("pose", 255.0, (0.0, 255.0), "nearest"),
    # eval/nyuv2_depth/painter_inference_depth.py:69-74
    "depth": TaskSpec("depth", 10000.0, (0.0, 10000.0), "bilinear",
                      channel_mean=True),
    # eval/{derain,sidd,lol}/painter_inference_*.py: float output, bicubic
    "restoration": TaskSpec("restoration", 1.0, None, "bicubic"),
}


def _array_digest(a: np.ndarray) -> bytes:
    """Content digest of a host array (prompt-cache key component)."""
    import hashlib
    a = np.ascontiguousarray(a)
    h = hashlib.blake2b(a.tobytes(), digest_size=16)
    h.update(str((a.shape, a.dtype)).encode())
    return h.digest()


def _prompt_bucket(n: int) -> int:
    """Next power of two >= n: the prompt-count compile buckets."""
    b = 1
    while b < n:
        b *= 2
    return b


class InContextModel:
    """Bundles (config, params) with jitted in-context predict functions."""

    def __init__(self, cfg: ModelConfig, params,
                 attn_impl: Optional[str] = None,
                 seg_type: str = "semantic",
                 pad_prompts: bool = True,
                 mesh=None):
        self.cfg = cfg
        self.params = params
        self.attn_impl = attn_impl or default_attn_impl()
        self.seg_type = seg_type  # 'semantic' | 'instance' (SegGPT CLI)
        # Bucket prompt counts to powers of two with a weighted ensemble
        # (weight 0 on padded samples == the reference's mean over the real
        # samples), so the video engine's growing rolling cache triggers
        # O(log K) compiles instead of one per frame count.
        self.pad_prompts = pad_prompts
        # Optional device mesh for data-parallel *serving*: run_queries
        # shards the independent-query batch over the mesh's devices
        # (XLA inserts no collectives — pure DP — so throughput scales
        # with chip count; params are replicated). None = single device.
        # The mesh may span OS processes (multi-host serving): batch
        # arrays are then assembled with make_array_from_process_local_
        # data — every process passes the same full host batch and
        # contributes its dp rows — and outputs are re-materialized on
        # every host via process_allgather (misc.py:217-249 role).
        self.mesh = mesh
        self._multiproc = mesh is not None and any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat)

        @functools.partial(jax.jit, static_argnames=("merge",))
        def _predict(params, imgs, tgts, mask, seg_type_arr, merge,
                     weights=None):
            # query-half fast path: decodes only sample 0's bottom-half
            # tokens (bitwise == slicing the full decode); de-normalize
            # fused (seggpt_engine.py:48-53)
            out = model_lib.predict_query_half(
                params, self.cfg, imgs, tgts, mask,
                seg_type=seg_type_arr, merge_between_batch=merge,
                attn_impl=self.attn_impl, ensemble_weights=weights)
            return image_ops.denormalize(out)

        self._predict = _predict

        batch_kwargs = {}
        # Pallas kernel sites must shard_map over the dp batch on a
        # multi-device mesh (GSPMD can't partition Mosaic custom calls;
        # parallel.mesh.shard_batch0_kernel). Only the batched path is
        # mesh-sharded; the ensemble path stays single-device.
        kernel_mesh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if len(mesh.devices.flat) > 1:
                kernel_mesh = (mesh, ("dp",))
            data = NamedSharding(mesh, P("dp"))
            rep = NamedSharding(mesh, P())
            params_s = jax.tree_util.tree_map(lambda _: rep, self.params)
            # explicit replication onto the serving mesh (params may
            # arrive sharded on a training mesh; jit will not reshard
            # across meshes on its own)
            self.params = jax.device_put(self.params, params_s)
            batch_kwargs = dict(
                in_shardings=(params_s, data, data, data, data),
                out_shardings=data)

        @functools.partial(jax.jit, **batch_kwargs)
        def _predict_batch(params, imgs, tgts, mask, seg_type_arr):
            out = model_lib.predict_query_half_batch(
                params, self.cfg, imgs, tgts, mask,
                seg_type=seg_type_arr, attn_impl=self.attn_impl,
                kernel_mesh=kernel_mesh)
            return image_ops.denormalize(out)

        self._predict_batch = _predict_batch

        shared_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(mesh, P("dp"))
            rep = NamedSharding(mesh, P())
            params_s = jax.tree_util.tree_map(lambda _: rep, self.params)
            shared_kwargs = dict(
                in_shardings=(params_s, rep, rep, data, data),
                out_shardings=data)

        # out_u8 is static and POSITIONAL (arg 5): pjit rejects kwargs
        # outright when in_shardings is specified (the --n_dp mesh path)
        @functools.partial(jax.jit, static_argnums=(5,), **shared_kwargs)
        def _predict_batch_shared(params, img2_top, tgt2_pair, queries,
                                  seg_type_arr, out_u8=False):
            # fixed-prompt sweep fast path: every query shares one
            # prompt, so only the (Q, R, R, 3) query halves cross the
            # host->device link — the prompt top half and the target
            # pair ship once and broadcast in-graph (the stacked-batch
            # path re-uploads ~2*(Q, 2R, R, 3) float32 per batch, which
            # dominates on transfer-limited links). Normalization
            # happens in-graph (same fp32 math as the host path);
            # uint8 queries additionally do the /255 in-graph (bit-exact,
            # image_ops.from_uint8) so the upload is 4x smaller.
            q = queries
            if jnp.issubdtype(q.dtype, jnp.integer):
                q = image_ops.from_uint8(q)
            q = image_ops.normalize(q)
            imgs = jnp.concatenate(
                [jnp.broadcast_to(img2_top, q.shape), q], axis=1)
            tgts = jnp.broadcast_to(tgt2_pair,
                                    (q.shape[0],) + tgt2_pair.shape)
            n = q.shape[0]
            num_patches = (imgs.shape[1] // self.cfg.patch_size) * \
                          (imgs.shape[2] // self.cfg.patch_size)
            mask = image_ops.bottom_half_mask(n, num_patches)
            out = model_lib.predict_query_half_batch(
                params, self.cfg, imgs, tgts, mask,
                seg_type=seg_type_arr, attn_impl=self.attn_impl,
                kernel_mesh=kernel_mesh)
            out = image_ops.denormalize(out)
            return image_ops.to_uint8_255(out) if out_u8 else out

        self._predict_batch_shared = _predict_batch_shared
        self._prompt_dev_cache = None

    def _put_dp(self, arr, dtype=None):
        """Batch-dim host array -> device array sharded on the dp axis.

        Single-process meshes upload locally (jit reshards); a mesh that
        spans processes assembles the global array from this process's
        dp rows (every process passes the SAME full host batch —
        train.py put_batch / misc.py:217-249 convention).
        """
        a = np.asarray(arr) if dtype is None else np.asarray(arr, dtype)
        if not self._multiproc:
            return jnp.asarray(a)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("dp", *([None] * (a.ndim - 1))))
        devs = list(self.mesh.devices.flat)
        rp = a.shape[0] // len(devs)
        mine = np.concatenate(
            [a[i * rp:(i + 1) * rp] for i, d in enumerate(devs)
             if d.process_index == jax.process_index()])
        return jax.make_array_from_process_local_data(sh, mine)

    def _put_rep(self, arr):
        """Replicated host array -> device (same value on every host)."""
        if not self._multiproc:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(np.asarray(arr),
                              NamedSharding(self.mesh, P()))

    def _fetch(self, out):
        """Device output -> full host array on every process."""
        if not self._multiproc:
            return np.asarray(out)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(out,
                                                            tiled=True))

    def run_queries_shared(self, queries: np.ndarray, img2: np.ndarray,
                           tgt2: np.ndarray,
                           real_count: Optional[int] = None,
                           out_dtype=np.float32) -> np.ndarray:
        """Fixed-prompt batched queries (Q, R, R, 3) -> painted halves.

        Transfer-aware variant of :meth:`run_queries` for the eval/
        serving sweeps where every query shares one (img2, tgt2) prompt:
        uploads only the raw query halves; the normalized prompt halves
        are uploaded once and cached on device across calls. Numerics:
        in-graph fp32 normalize == the host path's (same constants);
        the batched path is already documented +-1 uint8 vs the
        per-image loop (docs/EVAL.md).

        I/O dtypes (both 4x the link bytes of the fp32 default when the
        relay is the bottleneck):
        - ``queries`` may be uint8 (raw resized pixels); the /255 runs
          in-graph and is bit-exact vs the host divide
          (:func:`ops.image.from_uint8`).
        - ``out_dtype=np.uint8`` returns 0-255 uint8 (the PNG write
          path's values, :func:`ops.image.to_uint8_255`) instead of the
          default [0,1] float32 — protocol-exact only for nearest/
          identity-resize tasks; callers that bilinear/bicubic-resize
          the output must keep float32.
        """
        q = queries.shape[0]
        if self.mesh is not None:
            n_dp = self.mesh.shape["dp"]
            if q % n_dp:
                pad = n_dp - q % n_dp
                queries = np.concatenate(
                    [queries, np.repeat(queries[:1], pad, axis=0)])
        # Identity-keyed cache that HOLDS the host arrays: a plain
        # (id(img2), id(tgt2)) key can collide when CPython recycles a
        # freed object's address for a same-shaped successor (e.g. the
        # panoptic rehearsal's instance->semseg prompt swap), silently
        # serving the stale prompt. Keeping strong references makes the
        # `is` checks sound; a content digest additionally catches
        # IN-PLACE mutation of the cached arrays (identity unchanged) —
        # its ~1 ms cost is noise against the model call it guards.
        fp = (_array_digest(img2), _array_digest(tgt2))
        cache = self._prompt_dev_cache
        if (cache is None or cache[0] is not img2 or cache[1] is not tgt2
                or cache[2] != fp):
            tgt_pair = _np_normalize(np.concatenate([tgt2, tgt2], axis=0))
            self._prompt_dev_cache = (
                img2, tgt2, fp, self._put_rep(_np_normalize(img2)),
                self._put_rep(tgt_pair))
        img2_dev, tgt2_dev = self._prompt_dev_cache[3:]
        n = queries.shape[0]
        st_val = 1 if self.seg_type == "instance" else 0
        st = self._put_dp(np.full((n, 1), st_val, np.int32)) \
            if self.cfg.seg_type_tokens else None
        q_dev = self._put_dp(
            queries, None if queries.dtype == np.uint8 else np.float32)
        out = self._predict_batch_shared(
            self.params, img2_dev, tgt2_dev, q_dev, st,
            np.dtype(out_dtype) == np.uint8)
        return self._fetch(out)[:real_count if real_count else q]

    def run_queries(self, imgs: np.ndarray, tgts: np.ndarray,
                    real_count: Optional[int] = None) -> np.ndarray:
        """Batched independent queries (Q, 2R, R, 3) -> (Q, R, R, 3).

        Every sample is its own (prompt, query) pair — the throughput
        path for eval sweeps and serving. With a ``mesh``, the batch is
        sharded over the ``dp`` axis (Q must divide evenly; callers pad
        and pass ``real_count``). Returns de-normalized [0,1]-scale
        bottom halves for the first ``real_count`` samples.
        """
        q = imgs.shape[0]
        if self.mesh is not None:
            n_dp = self.mesh.shape["dp"]
            if q % n_dp:
                pad = n_dp - q % n_dp
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[:1], pad, axis=0)])
                tgts = np.concatenate(
                    [tgts, np.repeat(tgts[:1], pad, axis=0)])
        n = imgs.shape[0]
        num_patches = (imgs.shape[1] // self.cfg.patch_size) * \
                      (imgs.shape[2] // self.cfg.patch_size)
        mask_np = np.zeros((n, num_patches), np.float32)
        mask_np[:, num_patches // 2:] = 1.0
        st_val = 1 if self.seg_type == "instance" else 0
        st = self._put_dp(np.full((n, 1), st_val, np.int32)) \
            if self.cfg.seg_type_tokens else None
        out = self._predict_batch(self.params,
                                  self._put_dp(imgs, np.float32),
                                  self._put_dp(tgts, np.float32),
                                  self._put_dp(mask_np), st)
        return self._fetch(out)[:real_count if real_count else q]

    def run_one_image(self, img: np.ndarray, tgt: np.ndarray) -> np.ndarray:
        """img/tgt: (N, 2R, R, 3) normalized stitched batch (prompt dim N).

        Returns the painted bottom half (R, R, 3), de-normalized float
        (unscaled). Mirrors ``seggpt_engine.run_one_image`` (:26-53).
        """
        n = img.shape[0]
        merge = 0 if n > 1 else -1  # seggpt_engine.py:46
        weights = None
        if self.pad_prompts and n > 1:
            nb = _prompt_bucket(n)
            # ensemble weights: 1/n on real prompts, 0 on padding (exact
            # match of the unpadded mean); pads repeat sample 0 so every
            # intermediate stays finite
            weights = jnp.concatenate(
                [jnp.full((n,), 1.0 / n, jnp.float32),
                 jnp.zeros((nb - n,), jnp.float32)])
            if nb != n:
                img = np.concatenate(
                    [img, np.repeat(img[:1], nb - n, axis=0)])
                tgt = np.concatenate(
                    [tgt, np.repeat(tgt[:1], nb - n, axis=0)])
                n = nb
        num_patches = (img.shape[1] // self.cfg.patch_size) * \
                      (img.shape[2] // self.cfg.patch_size)
        mask = image_ops.bottom_half_mask(n, num_patches)
        st_val = 1 if self.seg_type == "instance" else 0
        st = jnp.full((n, 1), st_val, jnp.int32) \
            if self.cfg.seg_type_tokens else None
        out = self._predict(self.params, jnp.asarray(img, jnp.float32),
                            jnp.asarray(tgt, jnp.float32), mask, st, merge,
                            weights)
        return np.asarray(out)


def scale_and_resize(output: np.ndarray, size_wh: Tuple[int, int],
                     spec: TaskSpec) -> np.ndarray:
    """De-normalized bottom half -> task output at the original size.

    Host-side: the per-image resize is tiny and torch-exact either way
    (`transforms._np_resize2d` shares `ops/resample`'s weights, with
    the native banded C kernel when available); an eager device
    dispatch per output would serialize the eval loop on transfer
    latency.
    """
    from painter_tpu.data.transforms import _np_resize2d
    out = np.asarray(output, np.float32) * spec.out_scale
    if spec.clip is not None:
        out = np.clip(out, spec.clip[0], spec.clip[1])
    out = _np_resize2d(out, (size_wh[1], size_wh[0]), spec.resize_mode)
    if spec.channel_mean:
        out = out.mean(axis=-1)
    return out


# ---------------------------------------------------------------------------
# Host-side file drivers (PIL/cv2 IO, matching reference protocols)
# ---------------------------------------------------------------------------

def _load_rgb(path: str, res: int, nearest: bool = False) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    img = img.resize((res, res), Image.NEAREST if nearest else None)
    return np.array(img) / 255.0


def _np_normalize(x: np.ndarray) -> np.ndarray:
    """Host-side ImageNet normalize (== ops/image.normalize) — eager
    device dispatches per image would serialize on transfer latency."""
    from painter_tpu.configs import IMAGENET_MEAN, IMAGENET_STD
    return ((np.asarray(x, np.float32) - np.asarray(IMAGENET_MEAN,
                                                    np.float32))
            / np.asarray(IMAGENET_STD, np.float32))


def build_prompt_batch(query: np.ndarray,
                       prompts: Sequence[Tuple[np.ndarray, np.ndarray]]):
    """query (R,R,3) [0,1]; prompts: [(img2, tgt2)] -> normalized batch."""
    imgs, tgts = [], []
    for img2, tgt2 in prompts:
        imgs.append(_np_normalize(
            np.concatenate([img2, query], axis=0)))
        tgts.append(_np_normalize(
            np.concatenate([tgt2, tgt2], axis=0)))
    return np.stack(imgs), np.stack(tgts)


def build_query_batch(queries: Sequence[np.ndarray], img2: np.ndarray,
                      tgt2: np.ndarray):
    """Independent queries sharing one prompt -> stacked normalized
    (Q, 2R, R, 3) input/target batches for :meth:`run_queries`."""
    tgt = _np_normalize(np.concatenate([tgt2, tgt2], axis=0))
    imgs = [_np_normalize(np.concatenate([img2, q], axis=0))
            for q in queries]
    return np.stack(imgs), np.broadcast_to(
        tgt, (len(imgs),) + tgt.shape).copy()


def inference_image(model: InContextModel, img_path: str,
                    img2_paths: Sequence[str], tgt2_paths: Sequence[str],
                    out_path: str, res: int = 448) -> np.ndarray:
    """SegGPT single-image driver (seggpt_engine.py:56-103)."""
    from PIL import Image
    image = Image.open(img_path).convert("RGB")
    input_image = np.array(image)
    size = image.size
    query = np.array(image.resize((res, res))) / 255.0

    prompts = [(_load_rgb(p, res), _load_rgb(t, res, nearest=True))
               for p, t in zip(img2_paths, tgt2_paths)]
    imgs, tgts = build_prompt_batch(query, prompts)
    output = model.run_one_image(imgs, tgts)
    output = scale_and_resize(output, size, TASK_SPECS["seggpt"])
    composite = (input_image * (0.6 * output / 255 + 0.4)).astype(np.uint8)
    if out_path:
        Image.fromarray(composite).save(out_path)
    return output


def run_video_frames(model: InContextModel, frames_rgb,
                     tgt2: np.ndarray, num_frames: int,
                     img2: Optional[np.ndarray] = None, res: int = 448):
    """Rolling-prompt-cache video engine over in-memory RGB frames.

    The core of ``seggpt_engine.py:106-181`` decoupled from cv2/file IO
    so both :func:`inference_video` and the HTTP ``/paint_video`` route
    share it. ``frames_rgb`` is an iterable of uint8 RGB arrays; with
    ``img2=None`` the FIRST frame becomes the prompt image and is not
    painted (the reference's first-frame-as-prompt mode). Yields one
    uint8 RGB composite per painted frame.
    """
    from PIL import Image

    frames_cache: List[np.ndarray] = []
    targets_cache: List[np.ndarray] = []
    for input_image in frames_rgb:
        if img2 is None:
            img2 = np.array(Image.fromarray(input_image)
                            .resize((res, res))) / 255.0
            continue
        image = Image.fromarray(input_image)
        size = image.size
        query = np.array(image.resize((res, res))) / 255.0

        prompts = list(zip([img2] + frames_cache, [tgt2] + targets_cache))
        imgs, tgts = build_prompt_batch(query, prompts)
        output = model.run_one_image(imgs, tgts)

        if num_frames > 0:
            frames_cache.append(query)
            # reference math exactly (seggpt_engine.py:52 + :167-171):
            # clip the x255 output per-channel, channel-mean, then >128
            # — note 128/255 != 0.5, so thresholding the [0,1] output at
            # 0.5 (an earlier version here) deviates for predictions in
            # (0.5, 128/255]
            binarized = (np.clip(output * 255.0, 0, 255).mean(-1) > 128) \
                .astype(np.float32)
            targets_cache.append(np.repeat(binarized[..., None], 3, axis=-1))
            if len(frames_cache) > num_frames:
                frames_cache.pop(0)
                targets_cache.pop(0)

        out = scale_and_resize(output, size, TASK_SPECS["seggpt"])
        yield (input_image * (0.6 * out / 255 + 0.4)).astype(np.uint8)


class VideoEngine:
    """Device-resident rolling-prompt-cache video engine (v2).

    The host-cache path (:func:`run_video_frames`) rebuilds and
    re-uploads the whole (bucket, 2R, R, 3) float32 ensemble batch every
    frame — ~77 MB host->device at bucket 8, ~154 MB at 16 — which
    dominates end-to-end on any transfer-limited link (measured on the
    axon-relayed v5e, 2026-08-19: 0.23 fps at num_frames=4 and 0.10 at
    8, against ~0.2-0.3 s/frame of device compute). This engine keeps
    the normalized prompt halves ON DEVICE and per frame uploads only
    the new query (0.6 MB as raw uint8, 2.4 MB as [0,1] fp32);
    stitching, ImageNet normalization (same fp32 math as the host
    path), the re-prompt binarization (reference >128 threshold) and
    the rolling-cache insert run in-graph, with the cache buffers
    donated through the update — round 5 moved the binarize on device,
    deleting the per-frame mask upload of the round-4 version.

    Semantics match ``run_video_frames`` / ``seggpt_engine.py:106-181``:
    row 0 is the fixed (img2, tgt2) prompt; rows 1..num_frames hold the
    most recent frames + binarized predictions (FIFO via a circular
    insert — the weighted feature ensemble is order-invariant); prompt
    counts are padded to power-of-two buckets with zero ensemble weight
    (weight-0 rows contribute nothing, so pad content is irrelevant).
    """

    def __init__(self, model: InContextModel, num_frames: int,
                 img2: np.ndarray, tgt2: np.ndarray):
        self.model = model
        self.num_frames = num_frames
        cfg = model.cfg

        @functools.partial(jax.jit,
                           static_argnames=("merge", "out_u8"))
        def _paint(params, imgs_top, tgts_half, query, weights, st, merge,
                   out_u8=False):
            if jnp.issubdtype(query.dtype, jnp.integer):
                # uint8 frame upload: /255 in-graph, bit-exact vs the
                # host divide (image_ops.from_uint8) at 1/4 link bytes
                query = image_ops.from_uint8(query)
            q = image_ops.normalize(query.astype(jnp.float32))
            imgs = jnp.concatenate(
                [imgs_top, jnp.broadcast_to(q, imgs_top.shape)], axis=1)
            tgts = jnp.concatenate([tgts_half, tgts_half], axis=1)
            n = imgs_top.shape[0]
            num_patches = (imgs.shape[1] // cfg.patch_size) * \
                          (imgs.shape[2] // cfg.patch_size)
            mask = image_ops.bottom_half_mask(n, num_patches)
            out = model_lib.predict_query_half(
                params, cfg, imgs, tgts, mask, seg_type=st,
                merge_between_batch=merge, attn_impl=model.attn_impl,
                ensemble_weights=weights)
            out = image_ops.denormalize(out)
            # binarize the re-prompt mask IN-GRAPH with the reference
            # math (seggpt_engine.py:52 + :167-171: clip the x255 output
            # per-channel, channel-mean, >128) — it never needs to visit
            # the host, so the per-frame mask upload disappears
            binarized = jnp.clip(out * 255.0, 0, 255).mean(-1) > 128
            if out_u8:
                out = image_ops.to_uint8_255(out)
            return out, q, binarized

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _insert(imgs_top, tgts_half, new_top, new_bin, pos):
            tgt = image_ops.normalize(
                jnp.repeat(new_bin[..., None].astype(jnp.float32), 3, -1))
            return (jax.lax.dynamic_update_index_in_dim(
                        imgs_top, new_top, pos, 0),
                    jax.lax.dynamic_update_index_in_dim(
                        tgts_half, tgt, pos, 0))

        self._paint = _paint
        self._insert = _insert
        self._imgs_top = jnp.asarray(
            _np_normalize(img2))[None]
        self._tgts_half = jnp.asarray(
            _np_normalize(tgt2))[None]
        self._n_real = 1
        self._wrap = 0  # circular insert pointer once the cache is full

    def _seg_type(self, n):
        if not self.model.cfg.seg_type_tokens:
            return None
        val = 1 if self.model.seg_type == "instance" else 0
        return jnp.full((n, 1), val, jnp.int32)

    def paint_frame(self, query_01: np.ndarray,
                    out_dtype=np.float32) -> np.ndarray:
        """(R, R, 3) query -> painted (R, R, 3).

        ``query_01`` is [0,1] float, or raw uint8 pixels (converted
        in-graph, bit-exact, 1/4 the upload bytes). ``out_dtype=
        np.uint8`` fetches the 0-255 PNG-write values instead of the
        [0,1] float32 default (see :meth:`InContextModel.
        run_queries_shared` for the exactness contract). The rolling
        re-prompt mask is binarized on device either way, so the only
        per-frame link traffic is the query up and the painted frame
        down.
        """
        n, nb = self._n_real, self._imgs_top.shape[0]
        weights = None
        if n > 1:
            weights = jnp.asarray(np.concatenate(
                [np.full((n,), 1.0 / n, np.float32),
                 np.zeros((nb - n,), np.float32)]))
        q_dev = (jnp.asarray(query_01) if query_01.dtype == np.uint8
                 else jnp.asarray(query_01, jnp.float32))
        out, q_norm, binarized = self._paint(
            self.model.params, self._imgs_top, self._tgts_half,
            q_dev, weights, self._seg_type(nb), 0 if n > 1 else -1,
            out_u8=(np.dtype(out_dtype) == np.uint8))
        out_np = np.asarray(out)

        if self.num_frames > 0:
            if n < 1 + self.num_frames:
                pos = n
                self._n_real = n + 1
                if pos >= nb:  # grow to the next bucket (pad rows)
                    # pad by repeating row 0, matching run_one_image's
                    # convention ("pads repeat sample 0 so every
                    # intermediate stays finite") — the weight-0 ensemble
                    # rows contribute nothing either way, but one padding
                    # convention keeps the finiteness argument shared
                    grow = _prompt_bucket(pos + 1) - nb
                    self._imgs_top = jnp.concatenate(
                        [self._imgs_top,
                         jnp.repeat(self._imgs_top[:1], grow, axis=0)])
                    self._tgts_half = jnp.concatenate(
                        [self._tgts_half,
                         jnp.repeat(self._tgts_half[:1], grow, axis=0)])
            else:  # full: overwrite the oldest cache row (FIFO)
                pos = 1 + self._wrap
                self._wrap = (self._wrap + 1) % self.num_frames
            self._imgs_top, self._tgts_half = self._insert(
                self._imgs_top, self._tgts_half, q_norm, binarized, pos)
        return out_np


def run_video_frames_device(model: InContextModel, frames_rgb,
                            tgt2: np.ndarray, num_frames: int,
                            img2: Optional[np.ndarray] = None,
                            res: int = 448):
    """:func:`run_video_frames` semantics on the :class:`VideoEngine`

    (device-resident cache) — yields the same uint8 composites."""
    from PIL import Image

    engine = None
    for input_image in frames_rgb:
        if img2 is None:
            img2 = np.array(Image.fromarray(input_image)
                            .resize((res, res))) / 255.0
            continue
        if engine is None:
            engine = VideoEngine(model, num_frames, img2, tgt2)
        image = Image.fromarray(input_image)
        size = image.size
        # raw uint8 upload; /255 runs in-graph (bit-exact vs the host
        # divide the v1 path uses — image_ops.from_uint8)
        query = np.array(image.resize((res, res)))
        output = engine.paint_frame(query)
        out = scale_and_resize(output, size, TASK_SPECS["seggpt"])
        yield (input_image * (0.6 * out / 255 + 0.4)).astype(np.uint8)


def inference_video(model: InContextModel, vid_path: str, num_frames: int,
                    img2_paths: Optional[Sequence[str]],
                    tgt2_paths: Sequence[str], out_path: str,
                    res: int = 448, cache_impl: str = "device") -> int:
    """SegGPT video driver with rolling prompt cache

    (seggpt_engine.py:106-181). Returns number of frames written.
    ``cache_impl="device"`` (default) keeps the prompt cache on device
    (:class:`VideoEngine`, parity-tested vs the host path); "host" is
    the original per-frame re-upload path."""
    import cv2

    cap = cv2.VideoCapture(vid_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (width, height), True)

    def frames():
        while True:
            ret, frame = cap.read()
            if not ret:
                return
            yield np.ascontiguousarray(frame[:, :, ::-1])  # BGR -> RGB

    img2 = None if img2_paths is None else _load_rgb(img2_paths[0], res)
    tgt2 = _load_rgb(tgt2_paths[0], res, nearest=True)

    runner = run_video_frames_device if cache_impl == "device" \
        else run_video_frames
    n_written = 0
    for composite in runner(model, frames(), tgt2, num_frames,
                            img2=img2, res=res):
        writer.write(np.ascontiguousarray(composite[:, :, ::-1]))
        n_written += 1
    writer.release()
    return n_written


def painter_task_inference(model: InContextModel, img_path: str,
                           prompt_img_path: str, prompt_tgt_path: str,
                           task: str, res: int = 448) -> np.ndarray:
    """Generic Painter per-task driver (fixed-prompt protocol,

    painter_inference_*.py __main__ loops)."""
    from PIL import Image
    image = Image.open(img_path).convert("RGB")
    size = image.size
    query = np.array(image.resize((res, res))) / 255.0
    # Painter eval scripts resize the prompt target with PIL's default
    # (bicubic) — unlike SegGPT's NEAREST (painter_inference_segm.py:138-141)
    img2 = _load_rgb(prompt_img_path, res)
    tgt2 = _load_rgb(prompt_tgt_path, res)
    imgs, tgts = build_prompt_batch(query, [(img2, tgt2)])
    output = model.run_one_image(imgs, tgts)
    return scale_and_resize(output, size, TASK_SPECS[task])
