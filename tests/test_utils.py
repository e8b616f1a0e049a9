"""Utilities: metric logger, log lines, demo-app HTTP endpoint, cache."""
import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from painter_tpu.utils.logging import (MetricLogger, SmoothedValue,
                                       append_log_line)


def test_smoothed_value_windows():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0          # window [2,3,4]
    assert v.global_avg == 2.5      # all four
    assert v.max == 4.0


def test_metric_logger_log_every_and_summary(capsys):
    logger = MetricLogger()
    for i in logger.log_every(range(5), print_freq=2, header="T", total=5):
        logger.update(loss=float(i))
    out = capsys.readouterr().out
    assert "T [0/5]" in out and "Total time" in out
    assert logger.summary()["loss"] == 2.0


def test_append_log_line(tmp_path):
    append_log_line(str(tmp_path), {"epoch": 0, "train_loss": 1.0})
    append_log_line(str(tmp_path), {"epoch": 1, "train_loss": 0.5})
    lines = [json.loads(l) for l in open(tmp_path / "log.txt")]
    assert [l["epoch"] for l in lines] == [0, 1]


def _b64_png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_demo_app_http_endpoint():
    from painter_tpu.infer import demo_app

    class Args:
        ckpt_path = None
        model = "tiny_test"
        seg_type = "semantic"
        port = 18947
        max_batch = 4

    t = threading.Thread(target=lambda: demo_app.serve(Args()), daemon=True)
    t.start()
    rng = np.random.RandomState(0)
    req = {
        "image": _b64_png((rng.rand(20, 24, 3) * 255).astype(np.uint8)),
        "prompt_image": _b64_png((rng.rand(20, 24, 3) * 255).astype(
            np.uint8)),
        "prompt_target": _b64_png(np.full((20, 24, 3), 255, np.uint8)),
    }
    deadline = time.time() + 60
    last_err = None
    while time.time() < deadline:
        try:
            r = urllib.request.urlopen(urllib.request.Request(
                "http://127.0.0.1:18947/paint",
                json.dumps(req).encode(),
                {"Content-Type": "application/json"}), timeout=30)
            break
        except Exception as e:  # noqa: BLE001 — server still starting
            last_err = e
            time.sleep(2)
    else:
        pytest.fail(f"demo server never came up: {last_err}")
    out = json.loads(r.read())
    img = Image.open(io.BytesIO(base64.b64decode(out["output"])))
    assert img.size == (24, 20) and img.mode == "RGB"

    # concurrent requests ride one micro-batched device step each wave
    def one(results, i):
        try:
            rr = urllib.request.urlopen(urllib.request.Request(
                "http://127.0.0.1:18947/paint",
                json.dumps(req).encode(),
                {"Content-Type": "application/json"}), timeout=60)
            results[i] = json.loads(rr.read())["output"]
        except Exception as e:  # noqa: BLE001
            results[i] = e

    results = [None] * 6
    threads = [threading.Thread(target=one, args=(results, i))
               for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    for res in results:
        assert isinstance(res, str), res
    # identical inputs -> identical outputs regardless of batch slot
    assert len(set(results)) == 1 and results[0] == out["output"]

    # /paint_video: 3 frames, first-frame-as-prompt -> 2 painted frames
    vreq = {
        "frames": [_b64_png((rng.rand(20, 24, 3) * 255).astype(np.uint8))
                   for _ in range(3)],
        "prompt_target": _b64_png(np.full((20, 24, 3), 255, np.uint8)),
        "num_frames": 2,
    }
    rv = urllib.request.urlopen(urllib.request.Request(
        "http://127.0.0.1:18947/paint_video", json.dumps(vreq).encode(),
        {"Content-Type": "application/json"}), timeout=120)
    vout = json.loads(rv.read())
    assert len(vout["frames"]) == 2
    f0 = Image.open(io.BytesIO(base64.b64decode(vout["frames"][0])))
    assert f0.size == (24, 20)

    # /paint_point: 501 until a SAM-shaped segmenter is registered
    # (external weights — see demo_app.register_point_segmenter), then
    # points -> mask -> same pair flow
    preq = {"image": req["image"], "prompt_image": req["prompt_image"],
            "points": [[12.0, 10.0]], "labels": [1]}

    def post_point():
        return urllib.request.urlopen(urllib.request.Request(
            "http://127.0.0.1:18947/paint_point",
            json.dumps(preq).encode(),
            {"Content-Type": "application/json"}), timeout=60)

    with pytest.raises(urllib.error.HTTPError) as exc:
        post_point()
    assert exc.value.code == 501

    def fake_sam(img, coords, labels):
        m = np.zeros(img.shape[:2], bool)
        x, y = int(coords[0][0]), int(coords[0][1])
        m[max(0, y - 4):y + 4, max(0, x - 4):x + 4] = labels[0] > 0
        return m

    demo_app.register_point_segmenter(fake_sam)
    try:
        pout = json.loads(post_point().read())
        pimg = Image.open(io.BytesIO(base64.b64decode(pout["output"])))
        assert pimg.size == (24, 20)
        ptgt = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(pout["prompt_target"]))))
        assert set(np.unique(ptgt)) <= {0, 255} and ptgt.max() == 255
    finally:
        demo_app.register_point_segmenter(None)


def test_compilation_cache_helper(tmp_path):
    from painter_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache(str(tmp_path / "cache"))
    import jax
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")


def test_tfevents_writer_roundtrip(tmp_path):
    """ScalarWriter's tfevents sidecar decodes with an independent
    TFRecord/proto reader: framing CRCs valid, file_version header
    present, tags and values exact (main_train.py:280-284 wire format)."""
    import glob
    import struct

    from painter_tpu.utils import tb_writer
    from painter_tpu.utils.logging import ScalarWriter

    w = ScalarWriter(str(tmp_path))
    w.write(0, 0.25, loss=1.5, lr=0.001)
    w.write(10, 0.5, loss=0.75)
    w.close()

    paths = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(paths) == 1
    data = open(paths[0], "rb").read()

    def read_records(buf):
        off = 0
        while off < len(buf):
            (length,) = struct.unpack_from("<Q", buf, off)
            (len_crc,) = struct.unpack_from("<I", buf, off + 8)
            assert len_crc == tb_writer._masked_crc(buf[off:off + 8])
            payload = buf[off + 12:off + 12 + length]
            (crc,) = struct.unpack_from("<I", buf, off + 12 + length)
            assert crc == tb_writer._masked_crc(payload)
            yield payload
            off += 16 + length

    def parse_fields(msg):
        """Independent minimal proto decoder -> {field_num: [values]}."""
        out = {}
        off = 0
        while off < len(msg):
            key = 0
            shift = 0
            while True:
                b = msg[off]
                off += 1
                key |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            num, wt = key >> 3, key & 7
            if wt == 0:
                val = 0
                shift = 0
                while True:
                    b = msg[off]
                    off += 1
                    val |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
            elif wt == 1:
                val = struct.unpack_from("<d", msg, off)[0]
                off += 8
            elif wt == 5:
                val = struct.unpack_from("<f", msg, off)[0]
                off += 4
            elif wt == 2:
                ln = 0
                shift = 0
                while True:
                    b = msg[off]
                    off += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                val = msg[off:off + ln]
                off += ln
            else:
                raise AssertionError(f"wire type {wt}")
            out.setdefault(num, []).append(val)
        return out

    records = list(read_records(data))
    assert len(records) == 3  # header + 2 scalar events

    header = parse_fields(records[0])
    assert header[3] == [b"brain.Event:2"]

    ev1 = parse_fields(records[1])
    assert ev1[2] == [250]  # epoch_1000x axis
    vals = {}
    for value_msg in parse_fields(ev1[5][0])[1]:
        f = parse_fields(value_msg)
        vals[f[1][0].decode()] = f[2][0]
    assert vals == {"train/loss": 1.5,
                    "train/lr": pytest.approx(0.001)}

    ev2 = parse_fields(records[2])
    assert ev2[2] == [500]
    # known-answer CRC check (crc32c of b'123456789' is 0xE3069283)
    assert tb_writer._crc32c(b"123456789") == 0xE3069283


def test_component_profile_smoke():
    """The profiling tool runs end-to-end on a tiny model (CPU).

    Checks methodology plumbing only (chains compile, grads flow, all
    keys emitted) — the numbers themselves are meaningless on CPU."""
    from painter_tpu import configs
    from painter_tpu.utils import component_profile as cp

    cfg = configs.tiny_test_config()
    fwd = cp.profile_forward(cfg, batch=2, attn_impl="xla", n1=1, n2=2,
                             reps=1)
    assert {"block_ms", "mlp_ms", "ln_ms", "qkv_proj_ms"} <= set(fwd)
    assert all(np.isfinite(v) for v in fwd.values())

    bwd = cp.profile_backward(cfg, batch=2, attn_impl="xla", n1=1, n2=2,
                              reps=1)
    assert {"block_ms", "attn_sub_ms", "mlp_sub_ms", "decoder_ms",
            "loss_ms", "patch_embed_ms"} <= set(bwd)
    assert all(np.isfinite(v) for v in bwd.values())


def test_kernel_stage_profile_smoke():
    """The stage-marginal kernel profiler runs end-to-end (CPU interpret
    mode, tiny fold-h shape): all variants compile and emit finite
    times, and production kernel builders are restored afterwards."""
    from painter_tpu.kernels import flash_relpos as fr
    from painter_tpu.utils import kernel_stage_profile as ksp

    orig_f, orig_b = fr._make_fwd_kernel, fr._make_bwd_kernel
    res = ksp.profile(qh=8, qw=8, batch=1, heads=2, iters=1, reps=1)
    assert set(res["fwd"]) == set(ksp.FWD_STAGES)
    assert set(res["bwd"]) == set(ksp.BWD_STAGES)
    assert all(np.isfinite(v) and v > 0
               for d in res.values() for v in d.values())
    assert fr._make_fwd_kernel is orig_f
    assert fr._make_bwd_kernel is orig_b
