"""End-to-end learning test: the full pipeline must actually learn.

A synthetic task (target = color-inverted input) trained through the
real stack — PairDataset -> mixture sampler -> jitted train step with the
optimizer recipe — must improve the masked prediction measurably. The
task type contains "inst" so the dataset routes it through the
no-photometric-aug transform, and avoids "image2" so input and target get
the same (bicubic) interpolation — jitter on the input only, or nearest
target vs bicubic input resizing, would corrupt an exact pixel mapping
that real seg labels are invariant to. This is the systems-level check the reference only had as a
"toy dataset" manual recipe (SURVEY.md §4)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from painter_tpu import configs
from painter_tpu.data import pairdataset as pd
from painter_tpu.models import incontext_vit as m
from painter_tpu.ops import image as image_ops
from painter_tpu.train import optim, step as step_lib


@pytest.fixture(scope="module")
def inversion_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("invert")
    rng = np.random.RandomState(0)
    pairs = []
    for i in range(24):
        img = (rng.rand(20, 18, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / f"i{i}.png")
        Image.fromarray(255 - img).save(root / f"t{i}.png")
        pairs.append({"image_path": f"i{i}.png", "target_path": f"t{i}.png",
                      "type": "invert_inst_pair"})
    (root / "train.json").write_text(json.dumps(pairs))
    return str(root)


def test_pipeline_learns_color_inversion(inversion_data):
    # patch 4 keeps embed_dim (64) >= pixels/patch (48): a coarser patch
    # makes exact per-pixel prediction unrepresentable and the model
    # converges to the mean (found the hard way)
    cfg = configs.tiny_test_config(img_size=(32, 16), patch_size=4,
                                   embed_dim=64, num_heads=4,
                                   pretrain_img_size=16,
                                   drop_path_rate=0.0)
    dataset = pd.make_train_dataset(
        inversion_data, [f"{inversion_data}/train.json"],
        img_size=cfg.img_size, num_mask_patches=8,
        max_mask_patches_per_block=8, min_mask_patches_per_block=1,
        half_mask_ratio=0.5, patch_size=cfg.patch_size)
    sampler = pd.WeightedMixtureSampler(dataset.weights, seed=0)

    params = m.init_params(jax.random.PRNGKey(0), cfg)
    oc = optim.OptimConfig(lr=8e-3, warmup_epochs=2, epochs=80,
                           steps_per_epoch=6, weight_decay=0.05,
                           layer_decay=0.9)
    optimizer = optim.make_optimizer(params, cfg, oc)
    state = step_lib.init_train_state(params, optimizer)
    train_step = jax.jit(step_lib.make_train_step(cfg, optimizer,
                                                  remat=False))

    def eval_masked_mse(params):
        """Bottom-half prediction error on a held-out inversion pair."""
        rng = np.random.RandomState(99)
        q = rng.rand(16, 16, 3).astype(np.float32)
        prompt = rng.rand(16, 16, 3).astype(np.float32)
        imgs = np.asarray(image_ops.normalize(jnp.asarray(
            np.concatenate([prompt, q], 0))))[None]
        tgts = np.asarray(image_ops.normalize(jnp.asarray(
            np.concatenate([1 - prompt, 1 - prompt], 0))))[None]
        mask = np.zeros((1, cfg.num_patches), np.float32)
        mask[:, cfg.num_patches // 2:] = 1
        pred = m.predict_query_half(params, cfg, jnp.asarray(imgs),
                                    jnp.asarray(tgts), jnp.asarray(mask))
        out = np.asarray(image_ops.denormalize(pred))
        return float(((out - (1 - q)) ** 2).mean())

    before = eval_masked_mse(state["params"])
    losses = []
    for epoch in range(80):
        for batch in pd.data_iterator(dataset, sampler, batch_size=4,
                                      epoch=epoch, num_workers=1):
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(1),
                                            int(state["step"])))
            losses.append(float(metrics["loss"]))
    after = eval_masked_mse(state["params"])

    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    assert after < before * 0.2, (before, after)
