"""Regression tests for reference-protocol fidelity fixes (round 2).

Each test pins one behavior against the reference formula it mirrors:
mmpose's joint border gate, COCOeval's iscrowd/area-range handling,
the canonical weight-decay default, torch strict=False merge semantics,
and the NYUv2 depth prompt-target load order.
"""
import numpy as np
import pytest


def test_taylor_default_border_gate():
    """mmpose 'default' post-process gates BOTH axes on one joint
    condition (1 < px < W-1 and 1 < py < H-1): border keypoints get no
    quarter-pixel shift on either axis."""
    from painter_tpu.evals.pose import _taylor_default
    hm = np.zeros((8, 6), np.float32)
    hm[4, 3] = 1.0
    hm[4, 4] = 0.5   # right neighbor higher than left
    hm[5, 3] = 0.5   # bottom neighbor higher than top
    # interior: both axes shift
    assert _taylor_default(hm, 3, 4) == (0.25, 0.25)
    # px on the border gate (px == 1): NO shift at all, even for dy
    hm2 = np.zeros((8, 6), np.float32)
    hm2[4, 1] = 1.0
    hm2[4, 2] = 0.5
    hm2[5, 1] = 0.5
    assert _taylor_default(hm2, 1, 4) == (0.0, 0.0)
    # py on the border gate: same
    assert _taylor_default(hm, 3, 1) == (0.0, 0.0)
    assert _taylor_default(hm, 3, 7) == (0.0, 0.0)


def _pose(xy, vis=2):
    k = np.zeros((17, 3), np.float32)
    k[:, 0] = xy[0] + np.arange(17)
    k[:, 1] = xy[1] + np.arange(17)
    k[:, 2] = vis
    return k


def test_keypoint_ap_iscrowd_ignore():
    """A detection matched to an iscrowd GT is neither TP nor FP
    (COCOeval dtIg propagation); crowd GTs don't count toward recall."""
    from painter_tpu.evals.pose import KeypointAPEvaluator
    gt = _pose((50, 50))
    ev = KeypointAPEvaluator()
    # image 0: a perfect detection of a real GT
    ev.add_image([{"keypoints": gt, "score": 0.95}],
                 [{"keypoints": gt, "area": 10000.0}])
    # image 1: only a crowd region (no visible kpts); the detection lands
    # inside its bbox -> matched to the crowd GT -> ignored
    crowd_kpts = _pose((100, 100), vis=0)
    det_in_crowd = _pose((110, 110))
    ev.add_image([{"keypoints": det_in_crowd, "score": 0.9}],
                 [{"keypoints": crowd_kpts, "area": 10000.0,
                   "iscrowd": 1, "bbox": [90, 90, 60, 60]}])
    res = ev.evaluate()
    # without iscrowd handling the crowd det would be an FP and AP < 100
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)

    # control: same detection with NO crowd GT present and a HIGHER
    # score than the TP -> plain FP ahead of the TP lowers precision
    ev2 = KeypointAPEvaluator()
    ev2.add_image([{"keypoints": gt, "score": 0.95}],
                  [{"keypoints": gt, "area": 10000.0}])
    ev2.add_image([{"keypoints": det_in_crowd, "score": 0.99}], [])
    assert ev2.evaluate()["AP"] < 100.0
    # and with iscrowd, even a higher-scored det stays ignored
    ev3 = KeypointAPEvaluator()
    ev3.add_image([{"keypoints": gt, "score": 0.95}],
                  [{"keypoints": gt, "area": 10000.0}])
    ev3.add_image([{"keypoints": det_in_crowd, "score": 0.99}],
                  [{"keypoints": crowd_kpts, "area": 10000.0,
                    "iscrowd": 1, "bbox": [90, 90, 60, 60]}])
    assert ev3.evaluate()["AP"] == pytest.approx(100.0)


def test_keypoint_ap_area_ranges():
    """AP_medium / AP_large follow COCOeval's kpt area ranges
    (32^2..96^2 / 96^2..1e10); GTs outside a range are ignored there."""
    from painter_tpu.evals.pose import KeypointAPEvaluator
    ev = KeypointAPEvaluator()
    med_gt = _pose((50, 50))
    lrg_gt = _pose((200, 200))
    # medium GT (area 5000) detected perfectly; large GT (area 20000) missed
    ev.add_image([{"keypoints": med_gt, "score": 0.9}],
                 [{"keypoints": med_gt, "area": 5000.0},
                  {"keypoints": lrg_gt, "area": 20000.0}])
    res = ev.evaluate()
    assert res["AP_medium"] == pytest.approx(100.0)
    assert res["AP_large"] <= 0.0  # no large det; unmatched det is medium
    # 'all' sees 1 TP of 2 GTs
    assert 0 < res["AP"] < 100


def test_weight_decay_default_matches_reference():
    """main_train.py:91 and train_painter_vit_large.sh both use wd=0.1."""
    from painter_tpu.train.train import get_args_parser
    args = get_args_parser().parse_args([])
    assert args.weight_decay == 0.1


def test_checkpoint_merge_skips_unexpected_keys():
    """torch strict=False ignores unexpected checkpoint keys; _merge must
    not insert them into the init tree (pytree structure stability)."""
    from painter_tpu.train.checkpoint import _merge
    dst = {"a": np.zeros((2,)), "sub": {"w": np.zeros((3,))}}
    src = {"a": np.ones((2,)),
           "unexpected_leaf": np.ones((4,)),
           "sub": {"w": np.ones((3,)), "extra": np.ones((5,))},
           "unexpected_tree": {"x": np.ones((6,))}}
    skipped = _merge(dst, src)
    assert set(dst) == {"a", "sub"}
    assert set(dst["sub"]) == {"w"}
    np.testing.assert_array_equal(dst["a"], 1.0)
    np.testing.assert_array_equal(dst["sub"]["w"], 1.0)
    names = {s[0] for s in skipped}
    assert names == {"unexpected_leaf", "sub/extra", "unexpected_tree"}


def test_depth_prompt_target_load(tmp_path):
    """The depth prompt target is a raw uint16 sync_depth png mapped
    /10000*255 BEFORE RGB conversion (painter_inference_depth.py:140-145)
    — convert('RGB') on the raw png would saturate to ~255."""
    from PIL import Image
    from painter_tpu.evals.run_eval import _load_depth_target
    depth_raw = np.full((20, 20), 3000, np.int32)  # /10000*255 = 76.5
    p = tmp_path / "sync_depth.png"
    Image.fromarray(depth_raw, mode="I").save(p)
    out = _load_depth_target(str(p), res=16)
    assert out.shape == (16, 16, 3)
    # 3000/10000*255 = 76.5 -> F->RGB cast -> 76/255; raw convert('RGB')
    # would have saturated to 255
    np.testing.assert_allclose(out, 76 / 255.0, atol=1 / 255.0)
