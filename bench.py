"""Benchmark: ViT-L 896x448 in-context inference pairs/sec/chip.

Metric per BASELINE.json: "896x448 pairs/sec/chip ViT-L in-context
inference; p50 latency per prompt". The reference repo publishes no
throughput numbers (SURVEY.md §6), so ``vs_baseline`` is reported against
an analytic estimate of the torch reference on one A100: ~1.65 TFLOP per
pair (24 ViT-L blocks @ L=1568 incl. the double-batch prefix, rel-pos
bias einsums, decoder head) at the ~40% MFU typical of eager torch ViT-L
fp16 inference on A100 (312 TFLOPS peak) -> ~75 pairs/sec theoretical,
derated to 20 pairs/sec for the reference's B=1 unbatched eval loop
(`Painter/eval/*/painter_inference_*.py` run batch-1 per rank). The
north-star target is 2x A100 per chip (BASELINE.json).

Pairs semantics (honest accounting, round 3): batched iterations run
the multi-prompt *ensemble* serving path — `batch` (prompt, query)
pairs share one query half, are merged across the batch at every block
(the SegGPT feature ensemble), and paint ONE output, so all `batch`
pairs of trunk compute are load-bearing. The independent-query batched
path (decode every sample) measures within ~7% (47 img/s at b8,
BASELINE.md "batched eval painting").

Timing methodology (round 4, after the BENCH_r03 incident): through the
axon relay ``block_until_ready`` can acknowledge on ENQUEUE — BENCH_r03
recorded 273,228 pairs/s (~5,000x reality) by timing a pipelined loop
with it. This bench therefore never trusts ``block_until_ready``:

- **Data-dependent chain + device->host fetch.** Each timed iteration
  feeds a scalar derived from the previous iteration's painted output
  back into the next iteration's input, so the device cannot reorder or
  elide any step, and the loop is closed by fetching the final scalar to
  the host — actual result bytes must cross the wire, which no transport
  can fake. Host-side the calls are still enqueued without blocking, so
  dispatch overlaps compute (the serving steady state).
- **Blocking latency fetches per call.** The guard's blocking
  reference fetches the same 4-byte scalar as the pipelined loop
  (symmetric work — a degraded relay link inflates both sides equally,
  so the 0.3x cross-check never trips on transfer bandwidth alone);
  the reported p50 serving latency additionally fetches the full
  painted output, as the serving path does.
- **Plausibility guards** (``check_plausibility``): the implied compute
  rate must stay below the v5e's 197-TFLOPS bf16 peak (using the
  as-executed 1.42 TFLOP/pair from BASELINE.md's corrected roofline),
  the pipelined per-iter time must be >= 0.3x the blocking per-call
  time (pipelining can hide dispatch, not compute), and every fetched
  scalar must be finite. The verdict is printed in the JSON; an
  implausible measurement raises instead of printing a number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import time

import numpy as np

A100_REFERENCE_PAIRS_PER_SEC = 20.0

# v5e bf16 MXU peak; any implied rate above this is a measurement
# artifact by definition (BASELINE.md "Inference roofline")
V5E_BF16_PEAK_FLOPS = 197e12
# as-executed FLOPs per 896x448 in-context pair (BASELINE.md corrected
# roofline: 419 G x 27 block-apps + patch embed + query-half decode
# = 11.4 TFLOP per b8 batch)
FLOPS_PER_PAIR_448 = 11.4e12 / 8


def check_plausibility(pairs_per_sec: float, pipelined_iter_s: float,
                       blocking_iter_s: float, fetched_scalar: float,
                       flops_per_pair: float = FLOPS_PER_PAIR_448) -> dict:
    """Guard rails for relay-transport timing artifacts.

    Returns {"ok": bool, "failures": [...], "implied_tflops": float}.
    Trips on exactly the BENCH_r03 failure mode (an instant-ack timer
    implying >>peak FLOPS and a pipelined time far below the blocking
    time) and on non-finite outputs.
    """
    failures = []
    implied = pairs_per_sec * flops_per_pair
    if not np.isfinite(fetched_scalar):
        failures.append(f"non-finite output scalar {fetched_scalar}")
    if implied > V5E_BF16_PEAK_FLOPS:
        failures.append(
            f"implied {implied / 1e12:.1f} TFLOPS exceeds the v5e bf16 "
            f"peak ({V5E_BF16_PEAK_FLOPS / 1e12:.0f}) — timer did not "
            f"observe device execution")
    if blocking_iter_s > 0 and pipelined_iter_s < 0.3 * blocking_iter_s:
        failures.append(
            f"pipelined iter {pipelined_iter_s * 1e3:.2f} ms < 0.3x "
            f"blocking iter {blocking_iter_s * 1e3:.2f} ms — pipelining "
            f"can hide dispatch, not compute")
    return {"ok": not failures, "failures": failures,
            "implied_tflops": implied / 1e12}


def main():
    import jax
    import jax.numpy as jnp
    from painter_tpu import configs
    from painter_tpu.models import incontext_vit as m
    from painter_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = configs.get_config("seggpt_vit_large_patch16_input896x448",
                             dtype="bfloat16")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    length = cfg.num_patches

    fn_cache = {}

    def make_fn(batch, attn_impl, out_u8=False):
        # each fresh closure misses jax.jit's in-memory cache, and a
        # ViT-L compile submission is 1-4 min on the flaky remote-
        # compile path — reuse the jitted fn across measure/
        # measure_blocking/measure_latency for the same point
        if (batch, attn_impl, out_u8) in fn_cache:
            return fn_cache[batch, attn_impl, out_u8]
        rng = np.random.RandomState(0)
        imgs = rng.randn(batch, h, w, 3)
        if batch > 1:
            # multi-prompt ensemble serving (seggpt_engine.run_one_image
            # with `batch` prompts): every sample is (prompt_i, query)
            # with the SAME query half, merged across the batch at each
            # block (models_seggpt.py:221-230) into one painted output —
            # each iteration genuinely processes `batch` in-context pairs
            # through the full trunk and its single decode is the answer
            imgs[:, h // 2:] = imgs[:1, h // 2:]
        imgs = jnp.asarray(imgs, jnp.float32)
        tgts = jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32)
        mask = jnp.zeros((batch, length)).at[:, length // 2:].set(1.0)
        seg_type = jnp.zeros((batch, 1), jnp.int32)
        merge = 0 if batch > 1 else -1  # seggpt_engine.py:46

        @jax.jit
        def fn(params, token):
            # `token` chains iteration i's input to iteration i-1's
            # output: the device must fully execute every step of the
            # timed loop before the final fetch can return. The 1e-30
            # perturbation is numerically invisible in fp32 inputs but
            # not foldable by XLA.
            chained = imgs + token * 1e-30
            # the engines' production path: decode only the query half
            out = m.predict_query_half(params, cfg, chained, tgts, mask,
                                       seg_type=seg_type,
                                       merge_between_batch=merge,
                                       attn_impl=attn_impl)
            tok = out.astype(jnp.float32).ravel()[0]
            if out_u8:
                # the uint8 serving fetch (ops/image.to_uint8_255):
                # same compute, 1/4 the output bytes across the relay
                from painter_tpu.ops import image as image_ops
                out = image_ops.to_uint8_255(
                    image_ops.denormalize(out.astype(jnp.float32)))
            return out, tok
        fn_cache[batch, attn_impl, out_u8] = fn
        return fn

    def measure(batch, attn_impl, iters=10):
        """Pipelined throughput over a data-dependent chain, closed by a
        device->host scalar fetch (see module docstring)."""
        fn = make_fn(batch, attn_impl)
        token = jnp.asarray(0.0, jnp.float32)
        _, tok = fn(params, token)
        float(tok)  # compile + warm via a real fetch
        t0 = time.perf_counter()
        for _ in range(iters):
            _, token = fn(params, token)
        final = float(token)  # actual result bytes cross the wire
        med = (time.perf_counter() - t0) / iters
        return batch / med, med, final

    def measure_blocking(batch, attn_impl, iters=8):
        """Per-call blocking time with the SAME 4-byte scalar fetch as
        the pipelined loop — the symmetric reference for the 0.3x
        plausibility cross-check (a full-output fetch here would let a
        slow relay link inflate only the blocking side and trip the
        guard on sound measurements)."""
        fn = make_fn(batch, attn_impl)
        token = jnp.asarray(0.0, jnp.float32)
        _, tok = fn(params, token)
        float(tok)  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _, tok = fn(params, token)
            float(tok)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def measure_latency(batch, attn_impl, iters=20, out_u8=False):
        """Per-call serving latency; the painted output is fetched to
        host each call (np.asarray), as the serving path does.
        ``out_u8`` measures the uint8 serving fetch (same compute,
        1/4 output bytes)."""
        fn = make_fn(batch, attn_impl, out_u8=out_u8)
        token = jnp.asarray(0.0, jnp.float32)
        out, _ = fn(params, token)
        np.asarray(out)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out, _ = fn(params, token)
            host = np.asarray(out)
            times.append(time.perf_counter() - t0)
        assert np.isfinite(host).all(), "non-finite painted output"
        return float(np.median(times))

    best = None
    # default sweep is trimmed so a bench run stays well under driver
    # timeouts (each ViT-L compile is 1-4 min on the remote-compile path);
    # BENCH_FULL=1 adds the xla comparison and larger batches
    # (xla materializes (B*16, L, L) logits and OOMs at b16 on 16G)
    if os.environ.get("BENCH_FULL"):
        sweep = (("pallas", (1, 8, 16, 32)), ("xla", (8,)))
    else:
        sweep = (("pallas", (8, 16)),)
    for attn_impl, batches in sweep:
        for batch in batches:
            try:
                tp, med, scalar = measure(batch, attn_impl)
                blocking = measure_blocking(batch, attn_impl, iters=8)
            except Exception as e:  # noqa: BLE001 — OOM at large batch
                print(f"# skipped {attn_impl} b{batch}: "
                      f"{type(e).__name__}", flush=True)
                continue
            verdict = check_plausibility(tp, med, blocking, scalar)
            print(f"# {attn_impl} b{batch}: {tp:.2f} pairs/s pipelined "
                  f"{med * 1e3:.1f} ms, blocking {blocking * 1e3:.1f} ms, "
                  f"implied {verdict['implied_tflops']:.1f} TFLOPS, "
                  f"guard={'ok' if verdict['ok'] else verdict['failures']}",
                  flush=True)
            if not verdict["ok"]:
                raise RuntimeError(
                    f"implausible measurement at {attn_impl} b{batch}: "
                    f"{verdict['failures']}")
            if best is None or tp > best["tp"]:
                best = {"tp": tp, "batch": batch, "lat": med,
                        "blocking": blocking, "impl": attn_impl,
                        "verdict": verdict}
    if best is None:
        raise RuntimeError("no benchmark point succeeded")
    p50_b1 = measure_latency(1, best["impl"])
    p50_b1_u8 = measure_latency(1, best["impl"], out_u8=True)

    print(json.dumps({
        "metric": "vitl_896x448_incontext_pairs_per_sec_per_chip",
        "value": round(best["tp"], 2),
        "unit": "pairs/s",
        "vs_baseline": round(best["tp"] / A100_REFERENCE_PAIRS_PER_SEC, 3),
        "batch": best["batch"],
        "p50_latency_ms_b1": round(p50_b1 * 1000, 1),
        "p50_latency_ms_b1_uint8out": round(p50_b1_u8 * 1000, 1),
        "batch_latency_ms": round(best["lat"] * 1000, 1),
        "batch_blocking_ms": round(best["blocking"] * 1000, 1),
        "implied_tflops": round(best["verdict"]["implied_tflops"], 1),
        "plausibility_guard": "ok",
        "timing": "data-dependent chain + device->host fetch",
        "dtype": "bfloat16",
        "attn_impl": best["impl"],
    }))


if __name__ == "__main__":
    main()
