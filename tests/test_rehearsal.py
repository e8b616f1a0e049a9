"""Dress-rehearsal tool: all three pipelines end-to-end at tiny scale."""
import numpy as np

from painter_tpu.evals import rehearsal


def test_rehearsal_all_tasks(tmp_path):
    timings = rehearsal.main([
        "--root", str(tmp_path), "--n_images", "2", "--model",
        "tiny_test", "--input_size", "32", "--pano_input_size", "32",
        "--batch_size", "2"])
    # every phase ran and produced a finite metric (values are garbage
    # with random-init weights; the pipeline is what's under test)
    for key in ("ade20k/paint_s", "ade20k/decode_miou_s", "ade20k/mIoU",
                "pano/paint_inst_s", "pano/paint_semseg_s",
                "pano/decode_fuse_pq_s", "pano/PQ",
                "pose/paint_s", "pose/decode_ap_s", "pose/AP"):
        assert key in timings and np.isfinite(timings[key]), key
