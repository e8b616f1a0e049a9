"""End-to-end toy training run through the CLI driver (SURVEY.md §4:
toy-dataset smoke path), on the 8-device CPU mesh."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from painter_tpu.train.train import get_args_parser, main


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("toydata")
    rng = np.random.RandomState(0)
    pairs = []
    for i in range(16):
        ip, tp = f"img_{i}.png", f"tgt_{i}.png"
        for p in (ip, tp):
            Image.fromarray(
                (rng.rand(40, 36, 3) * 255).astype(np.uint8)).save(root / p)
        pairs.append({"image_path": ip, "target_path": tp,
                      "type": "derain_image2derain"})
    jp = root / "train.json"
    jp.write_text(json.dumps(pairs))
    return str(root), str(jp)


def test_toy_training_run(toy_data, tmp_path):
    root, jp = toy_data
    out_dir = str(tmp_path / "run")
    args = get_args_parser().parse_args([
        "--data_path", root, "--json_path", jp, "--val_json_path", jp,
        "--output_dir", out_dir, "--model", "tiny_test",
        "--input_size", "64", "32", "--batch_size", "1",
        "--accum_iter", "2", "--epochs", "2", "--warmup_epochs", "1",
        "--num_mask_patches", "4", "--max_mask_patches_per_block", "4",
        "--min_mask_patches_per_block", "1", "--dtype", "float32",
        "--max_steps_per_epoch", "2", "--save_freq", "1",
        "--n_fsdp", "2", "--attn_impl", "xla", "--panel_freq", "1",
    ])
    # tiny_test ignores drop_path etc. via preset kwargs
    state = main(args)
    # 16 samples / (8 devices x accum 2) = 1 update per epoch
    assert int(state["step"]) == 2
    log_path = os.path.join(out_dir, "log.txt")
    lines = [json.loads(l) for l in open(log_path)]
    assert len(lines) == 2
    assert "train_loss" in lines[0] and "val_loss" in lines[0]
    assert np.isfinite(lines[-1]["train_loss"])
    # checkpoints written
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))

    # per-step scalar stream (engine_train.py:104-110 role)
    scalars = [json.loads(l)
               for l in open(os.path.join(out_dir, "scalars.jsonl"))]
    assert len(scalars) == 2
    assert {"step", "epoch_1000x", "loss", "grad_norm", "lr"} <= \
        set(scalars[0])
    assert scalars[0]["lr"] == 0  # per-iter warmup starts at 0
    assert scalars[-1]["lr"] > 0
    # sample panels (engine_train.py:112-139 role): [x, masked, pred,
    # tgt] grid -> width 4x the stitched canvas
    panel = os.path.join(out_dir, "panels", "panel_step0.png")
    assert os.path.exists(panel)
    arr = np.asarray(Image.open(panel))
    assert arr.shape[1] == 4 * 32 and arr.shape[0] % 64 == 0

    # auto-resume: re-running continues from epoch 2 == done, no new steps
    state2 = main(args)
    assert int(state2["step"]) == 2
