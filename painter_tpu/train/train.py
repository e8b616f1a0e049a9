"""Training driver CLI — the TPU-native ``main_train.py`` equivalent.

Mirrors the reference's flags and flow (``Painter/main_train.py:48-391``):
build model from a named preset, MAE-init surgery, mixture dataset,
weighted sampler, per-iter cosine LR with warmup, AdamW + layer decay,
grad accumulation, grad-clip 3.0, epoch loop with masked-loss validation,
checkpoint save/auto-resume, JSON-lines log. TPU-native replacements:
DDP/NCCL -> one jitted step over a dp(+fsdp) mesh; fp16 AMP + scaler ->
bf16 compute; torch.save -> Orbax; NaN watchdog preserved
(engine_train.py:70-72).

Run: python -m painter_tpu.train.train --json_path a.json b.json \
    --data_path datasets/ --output_dir out/ [--finetune mae.pth] ...
"""
from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Painter-TPU training", add_help=False)
    p.add_argument("--batch_size", default=2, type=int,
                   help="per-chip batch size")
    p.add_argument("--accum_iter", default=16, type=int)
    p.add_argument("--model", default="painter_vit_large_patch16_input896x448_win_dec64_8glb_sl1")
    p.add_argument("--epochs", default=15, type=int)
    p.add_argument("--warmup_epochs", default=1, type=float)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--weight_decay", default=0.1, type=float)
    p.add_argument("--layer_decay", default=0.8, type=float)
    p.add_argument("--clip_grad", default=3.0, type=float)
    p.add_argument("--drop_path", default=0.1, type=float)
    p.add_argument("--input_size", default=(896, 448), type=int, nargs=2)
    p.add_argument("--num_mask_patches", default=784, type=int)
    p.add_argument("--max_mask_patches_per_block", default=392, type=int)
    p.add_argument("--min_mask_patches_per_block", default=16, type=int)
    p.add_argument("--min_random_scale", default=0.3, type=float)
    p.add_argument("--half_mask_ratio", default=0.1, type=float)
    p.add_argument("--data_path", default="datasets/")
    p.add_argument("--json_path", nargs="+", default=[])
    p.add_argument("--val_json_path", nargs="+", default=[])
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--finetune", default="",
                   help="MAE-pretrained .pth for init surgery")
    p.add_argument("--resume", default="",
                   help="torch .pth to warm-start weights from")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--save_freq", default=1, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--print_freq", default=20, type=int)
    p.add_argument("--panel_freq", default=0, type=int,
                   help="every N update steps, dump an [x, masked, pred, "
                        "tgt] PNG panel of the current batch "
                        "(engine_train.py:112-139 wandb-panel role; "
                        "0 = off)")
    p.add_argument("--loss_func", default="smoothl1")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--n_fsdp", default=1, type=int,
                   help="fsdp mesh axis size (ZeRO-like sharding)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="activation checkpointing (--no-remat is ~9%% "
                        "faster at per-chip batch 2 and fits in 16G)")
    p.add_argument("--remat_policy", default="save_kernel",
                   choices=["full", "save_attn", "save_kernel",
                            "save_kernel_attn", "save_kernel_mlp",
                            "save_attn_mlp", "save_dots"],
                   help="'save_kernel' (default) keeps the flash kernel's "
                        "out+lse (+26 MB/block at b8) so the backward "
                        "recompute actually skips the attention kernel; "
                        "'save_attn' keeps the post-proj output (measured "
                        "equal to full remat — kept for comparison); "
                        "'save_attn_mlp' additionally keeps the fc1 "
                        "pre-activation (+100 MB/block, gemm-free "
                        "recompute); 'save_dots' keeps every matmul output")
    p.add_argument("--attn_impl", default=None,
                   help="xla | pallas | auto (default: auto on TPU — "
                        "the kernel everywhere except windowed train "
                        "segments, where XLA measured faster; identical "
                        "to pallas for all-global presets. ROUND5.md)")
    p.add_argument("--decoder_impl", default="auto",
                   choices=["auto", "xla", "fused"],
                   help="'fused' = Pallas decoder-tail kernel for the "
                        "full decode; 'auto' resolves to 'xla' (the "
                        "kernel measured on par with XLA on v5e — see "
                        "kernels/decoder_head.py)")
    p.add_argument("--max_steps_per_epoch", default=-1, type=int,
                   help="truncate epochs (smoke tests)")
    p.add_argument("--watchdog_freq", default=10, type=int,
                   help="sync + NaN-check every N steps (the reference "
                        "checks every step but also syncs every step; "
                        "async dispatch needs the device to run ahead)")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="multi-host: jax.distributed.initialize() "
                        "(replaces the reference's env:// rendezvous)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (misc.py dist_url role); "
                        "default: auto-detect from the cluster environment")
    p.add_argument("--num_processes", default=None, type=int)
    p.add_argument("--process_id", default=None, type=int)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for multi-"
                        "process tests on a machine that also has a TPU)")
    return p


def main(args=None):
    if args is None:  # console-script entry point
        args = get_args_parser().parse_args()
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from painter_tpu import configs
    from painter_tpu.data import pairdataset as pd
    from painter_tpu.models import incontext_vit as model_lib
    from painter_tpu.parallel import mesh as mesh_lib
    from painter_tpu.train import checkpoint as ckpt_lib
    from painter_tpu.train import optim, step as step_lib
    from painter_tpu.utils.cache import enable_compilation_cache
    from painter_tpu.utils.logging import (MetricLogger, ScalarWriter,
                                           append_log_line,
                                           dump_sample_panel)

    enable_compilation_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from painter_tpu.utils.logging import setup_for_distributed
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes, process_id=args.process_id)
        # reference: silence print on non-master ranks (misc.py:152-168)
        setup_for_distributed(jax.process_index() == 0)
        print(f"process {jax.process_index()}/{jax.process_count()} "
              f"({jax.local_device_count()} local devices)", force=True)

    cfg = configs.get_config(
        args.model, img_size=tuple(args.input_size),
        drop_path_rate=args.drop_path, loss_func=args.loss_func,
        dtype=args.dtype)

    key = jax.random.PRNGKey(args.seed)
    params = model_lib.init_params(key, cfg)
    if args.finetune:
        params = ckpt_lib.load_torch_params(args.finetune, cfg, init=params)
        print(f"initialized from {args.finetune}")
    if args.resume:
        # --resume <file.pth> warm-starts weights from a torch checkpoint
        # (misc.py:316-331); orbax auto-resume below restores full state
        params = ckpt_lib.load_torch_params(args.resume, cfg, init=params)
        print(f"resumed weights from {args.resume}")

    devices = jax.devices()
    mesh = mesh_lib.make_mesh(len(devices) // args.n_fsdp, args.n_fsdp,
                              devices)
    print(f"mesh: {dict(mesh.shape)} on {devices[0].platform}")

    dataset = pd.make_train_dataset(
        args.data_path, args.json_path, img_size=tuple(args.input_size),
        num_mask_patches=args.num_mask_patches,
        max_mask_patches_per_block=args.max_mask_patches_per_block,
        min_mask_patches_per_block=args.min_mask_patches_per_block,
        min_random_scale=args.min_random_scale,
        half_mask_ratio=args.half_mask_ratio, patch_size=cfg.patch_size)
    val_dataset = (pd.make_val_dataset(args.data_path, args.val_json_path,
                                       img_size=tuple(args.input_size),
                                       num_mask_patches=args.num_mask_patches,
                                       patch_size=cfg.patch_size)
                   if args.val_json_path else None)
    # multi-host: each process loads its shard of the weighted draw
    # (DistributedSamplerWrapper semantics, data/sampler.py)
    sampler = pd.WeightedMixtureSampler(
        dataset.weights, num_replicas=jax.process_count(),
        rank=jax.process_index(), seed=args.seed)

    global_batch = args.batch_size * len(devices)
    # each process builds only its local slice of the global batch
    # (the reference's per-rank DataLoader role); the sampler already
    # shards indices per process, so local steps == global steps and the
    # cosine schedule's steps_per_epoch stays consistent across hosts
    local_batch = args.batch_size * jax.local_device_count()
    steps_per_epoch = len(dataset) // (global_batch * args.accum_iter)
    if args.max_steps_per_epoch > 0:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    print(f"effective batch {global_batch * args.accum_iter}, "
          f"{steps_per_epoch} updates/epoch")

    oc = optim.OptimConfig(
        lr=args.lr, min_lr=args.min_lr, weight_decay=args.weight_decay,
        layer_decay=args.layer_decay, clip_grad=args.clip_grad,
        warmup_epochs=args.warmup_epochs, epochs=args.epochs,
        steps_per_epoch=max(steps_per_epoch, 1))
    optimizer = optim.make_optimizer(params, cfg, oc)
    state = step_lib.init_train_state(params, optimizer)

    state_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh,
                                   mesh_lib.param_spec(leaf, args.n_fsdp)),
        state)
    state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
    batch_spec = P(None, ("dp", "fsdp")) if args.accum_iter > 1 \
        else P(("dp", "fsdp"))
    batch_sh = NamedSharding(mesh, batch_spec)
    eval_sh = NamedSharding(mesh, P(("dp", "fsdp")))

    def put_batch(batch, sharding):
        """Host batch (local slice) -> global sharded arrays."""
        if jax.process_count() == 1:
            return {k: jax.device_put(v, sharding)
                    for k, v in batch.items()}
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()}

    attn_impl = args.attn_impl or (
        "auto" if devices[0].platform == "tpu" else "xla")
    train_step = jax.jit(
        step_lib.make_train_step(
            cfg, optimizer, accum_iter=args.accum_iter, remat=args.remat,
            remat_policy=None if args.remat_policy == "full"
            else args.remat_policy,
            attn_impl=attn_impl, mesh=mesh,
            decoder_impl=args.decoder_impl),
        donate_argnums=(0,))
    eval_step = jax.jit(step_lib.make_eval_step(cfg))

    import os
    manager = ckpt_lib.checkpoint_manager(
        os.path.abspath(os.path.join(args.output_dir, "checkpoints")))
    start_epoch = 0
    if args.auto_resume:
        state, resumed = ckpt_lib.restore_state(manager, state)
        if resumed is not None:
            start_epoch = resumed // max(steps_per_epoch, 1)
            print(f"auto-resumed from step {resumed} (epoch {start_epoch})")

    lr_schedule = optim.cosine_warmup_schedule(oc)
    scalar_writer = ScalarWriter(args.output_dir) \
        if jax.process_index() == 0 else None

    @jax.jit
    def panel_predict(params, imgs, tgts, mask):
        from painter_tpu.ops import image as image_ops
        pred = model_lib.predict_image(params, cfg, imgs, tgts, mask,
                                       attn_impl=attn_impl)
        return image_ops.denormalize(pred)

    rng = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        it = pd.data_iterator(dataset, sampler, local_batch, epoch,
                              seed=args.seed, accum_iter=args.accum_iter)
        t_epoch = time.time()
        pending = []

        def drain_metrics():
            # one host sync for the whole window; the device ran ahead
            for gstep, mt in pending:
                loss_v = float(mt["loss"])
                if not math.isfinite(loss_v):
                    print(f"Loss is {loss_v}, stopping training "
                          "(engine_train.py:70-72 watchdog)")
                    sys.exit(1)
                gn = float(mt["grad_norm"])
                logger.update(loss=loss_v, grad_norm=gn)
                if scalar_writer is not None:
                    scalar_writer.write(
                        gstep, gstep / max(steps_per_epoch, 1),
                        loss=loss_v, grad_norm=gn,
                        lr=float(lr_schedule(gstep)))
            pending.clear()

        step_count = 0
        for step_idx, batch in enumerate(
                logger.log_every(it, args.print_freq,
                                 header=f"Epoch [{epoch}]",
                                 total=steps_per_epoch)):
            if step_idx >= steps_per_epoch:
                break
            batch = put_batch(batch, batch_sh)
            gstep = epoch * steps_per_epoch + step_idx
            step_rng = jax.random.fold_in(rng, gstep)
            # panels need fully-addressable arrays: single-process only
            if args.panel_freq > 0 and gstep % args.panel_freq == 0 \
                    and jax.process_count() == 1:
                mb = ({k: v[0] for k, v in batch.items()}
                      if args.accum_iter > 1 else batch)
                pred = panel_predict(state["params"], mb["imgs"],
                                     mb["tgts"], mb["mask"])
                path = dump_sample_panel(
                    args.output_dir, gstep,
                    np.asarray(mb["imgs"]), np.asarray(mb["tgts"]),
                    np.asarray(mb["mask"]), np.asarray(pred),
                    cfg.patch_size)
                print(f"sample panel -> {path}")
            state, metrics = train_step(state, batch, step_rng)
            pending.append((gstep, metrics))
            step_count += 1
            if step_count % max(args.watchdog_freq, 1) == 0:
                drain_metrics()
        drain_metrics()
        # cross-process meter reduction (misc.py:43-54 role)
        logger.synchronize_between_processes()
        stats = {f"train_{k}": v for k, v in logger.summary().items()}

        if val_dataset is not None:
            vlogger = MetricLogger()
            vsampler = pd.WeightedMixtureSampler(
                val_dataset.weights, num_replicas=jax.process_count(),
                rank=jax.process_index(), seed=args.seed)
            vit = pd.data_iterator(val_dataset, vsampler, local_batch,
                                   epoch, seed=args.seed)
            for vstep, batch in enumerate(vit):
                if args.max_steps_per_epoch > 0 and \
                        vstep >= args.max_steps_per_epoch:
                    break
                batch = put_batch(batch, eval_sh)
                m = eval_step(state["params"], batch)
                vlogger.update(loss=float(m["loss"]))
            vlogger.synchronize_between_processes()
            stats.update({f"val_{k}": v for k, v in
                          vlogger.summary().items()})

        stats.update({"epoch": epoch,
                      "epoch_time_s": round(time.time() - t_epoch, 1)})
        print(stats, flush=True)
        if jax.process_index() == 0:  # main_train.py:379 master-only log
            append_log_line(args.output_dir, stats)
        if (epoch + 1) % args.save_freq == 0 or epoch + 1 == args.epochs:
            ckpt_lib.save_state(manager, int(state["step"]), state)
            manager.wait_until_finished()
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
