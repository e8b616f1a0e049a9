"""Typed model/run configurations with named presets.

Replaces the reference's hyperparameters frozen inside named factory functions
(``/root/reference/Painter/models_painter.py:476-487`` and
``/root/reference/SegGPT/SegGPT_inference/models_seggpt.py:483-494``) with
dataclass configs. Painter and SegGPT are two presets of one in-context ViT.

A load-bearing reference quirk reproduced here: the reference factories pass a
*tuple of lists* as ``window_block_indexes`` (a misplaced comma at
``models_painter.py:481-482``), so the membership test ``i in
window_block_indexes`` is always False and **all 24 blocks run global
attention**. The released checkpoints were trained that way. We therefore
default ``window_block_indexes=()`` (all-global) while keeping window
attention implemented and selectable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the in-context ViT (Painter/SegGPT family)."""

    img_size: Tuple[int, int] = (896, 448)  # (H, W); H == 2*W (stitched pair)
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    # Empty = all blocks global (checkpoint parity; see module docstring).
    window_block_indexes: Tuple[int, ...] = ()
    # ResBottleneckBlock after these blocks (models_painter.py:232-233);
    # [] in every reference factory.
    residual_block_indexes: Tuple[int, ...] = ()
    # A genuinely window-trained torch checkpoint stores rel-pos tables
    # sized (2*window_size-1, hd) for windowed blocks (the reference
    # sizes each Block's tables by its own attention extent,
    # models_painter.py:309 via vitdet_utils.py:63-93) — heterogeneous
    # with the global blocks' full-grid tables. With this flag the param
    # tree carries a second stacked leaf pair rel_pos_h_win/rel_pos_w_win
    # at the window size; windowed blocks read those EXACTLY (no
    # interpolation) and global blocks read the full-grid tables. False
    # (default) keeps the single full-grid leaves: exact for the released
    # all-global checkpoints, and windowed blocks derive their table by
    # linear interpolation (a documented deviation, fine for scratch
    # training but not for loading a window-trained checkpoint).
    window_rel_pos_tables: bool = False
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    decoder_embed_dim: int = 64
    loss_func: str = "smoothl1"  # smoothl1 | l1 | l2 | l1l2
    # Stream-merge block index and encoder feature-tap indices
    # (models_painter.py:408-418).
    merge_idx: int = 2
    out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    ln_eps: float = 1e-6
    # SegGPT extras (models_seggpt.py:285-286,414-420,448-469).
    seg_type_tokens: bool = False
    # Painter adds +1e-2 to the loss denominator and zeroes `valid` for
    # samples whose unmasked target is near-black (models_painter.py:443-461);
    # SegGPT does neither (models_seggpt.py:448-469).
    loss_denom_eps: float = 1e-2
    near_black_check: bool = True
    # Compute dtype for the transformer trunk ("float32" or "bfloat16").
    # Params are always stored fp32; LayerNorm statistics and attention
    # softmax always run fp32.
    dtype: str = "float32"
    # GELU flavor: "auto" uses the tanh approximation when computing in
    # bf16 and exact erf in fp32. Measured on v5e: exact erf costs 0.82 ms
    # per MLP-hidden pass (VPU-bound, ~45% of MLP time) vs 0.10 ms for
    # tanh; the approximation's max abs error (5.0e-4) is 31x BELOW bf16's
    # own rounding of the exact activation (1.6e-2), so in bf16 the two
    # are numerically indistinguishable. "exact"/"tanh" force a flavor.
    gelu: str = "auto"

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        h, w = self.grid_size
        return h * w

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def gelu_approximate(self) -> bool:
        """True -> tanh GELU (see ``gelu`` field docstring)."""
        if self.gelu == "auto":
            return self.dtype == "bfloat16"
        return self.gelu == "tanh"

    def with_img_size(self, img_size: Tuple[int, int]) -> "ModelConfig":
        """Same model at a different eval resolution (e.g. COCO eval @560;

        rel-pos/abs-pos tables are interpolated at forward time, matching
        ``vitdet_utils.py:75-93,128-157``)."""
        return dataclasses.replace(self, img_size=tuple(img_size))


def painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1(
        **kwargs) -> ModelConfig:
    """Painter ViT-L preset (models_painter.py:476-487)."""
    defaults = dict(
        img_size=(896, 448), patch_size=16, embed_dim=1024, depth=24,
        num_heads=16, drop_path_rate=0.1, window_size=14, qkv_bias=True,
        mlp_ratio=4.0, use_rel_pos=True, decoder_embed_dim=64,
        loss_func="smoothl1", seg_type_tokens=False,
        loss_denom_eps=1e-2, near_black_check=True)
    defaults.update(kwargs)
    return ModelConfig(**defaults)


# The windowed architecture the flagship factory NAME advertises ("8glb"):
# the indexes the reference factory *meant* to pass before the misplaced
# comma (models_painter.py:481-482) — 16 windowed blocks at ws=14 with 8
# global blocks at {2, 5, 8, 11, 14, 17, 20, 23}. No released checkpoint
# was trained this way (see module docstring); this preset exists for
# from-scratch training of genuinely windowed models and for pricing the
# windowed perf point (BASELINE.md).
WINDOWED_8GLB_BLOCK_INDEXES = tuple(
    i for i in range(24) if i not in (2, 5, 8, 11, 14, 17, 20, 23))


def painter_vit_large_patch16_input896x448_windowed(**kwargs) -> ModelConfig:
    """The de-bugged windowed Painter ViT-L (models_painter.py:481-482 as
    intended, consumer :307): 14x14 windows except 8 global blocks.
    ``window_rel_pos_tables=True`` gives windowed blocks exact
    (2*ws-1)-entry tables (the layout a window-trained torch checkpoint
    stores — vitdet_utils.py:63-93)."""
    defaults = dict(window_block_indexes=WINDOWED_8GLB_BLOCK_INDEXES,
                    window_rel_pos_tables=True)
    defaults.update(kwargs)
    return painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1(
        **defaults)


def seggpt_vit_large_patch16_input896x448(**kwargs) -> ModelConfig:
    """SegGPT ViT-L preset (models_seggpt.py:483-494)."""
    defaults = dict(
        img_size=(896, 448), patch_size=16, embed_dim=1024, depth=24,
        num_heads=16, drop_path_rate=0.1, window_size=14, qkv_bias=True,
        mlp_ratio=4.0, use_rel_pos=True, decoder_embed_dim=64,
        loss_func="smoothl1", seg_type_tokens=True,
        loss_denom_eps=0.0, near_black_check=False)
    defaults.update(kwargs)
    return ModelConfig(**defaults)


def tiny_test_config(**kwargs) -> ModelConfig:
    """Small config for fast CPU tests (not in reference)."""
    defaults = dict(
        img_size=(64, 32), patch_size=8, embed_dim=32, depth=6, num_heads=2,
        drop_path_rate=0.0, window_size=2, pretrain_img_size=32,
        decoder_embed_dim=8, out_indices=(2, 3, 4, 5), merge_idx=2)
    defaults.update(kwargs)
    return ModelConfig(**defaults)


PRESETS = {
    "painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1":
        painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1,
    "painter_vit_large_patch16_input896x448_windowed":
        painter_vit_large_patch16_input896x448_windowed,
    "seggpt_vit_large_patch16_input896x448":
        seggpt_vit_large_patch16_input896x448,
    "tiny_test": tiny_test_config,
}


def get_config(name: str, **kwargs) -> ModelConfig:
    return PRESETS[name](**kwargs)
