"""Real-asset readiness drill (VERDICT r4 #3): one command proves the
complete eval.py protocol — exact on-disk dataset formats for 7-Scenes /
NRGBD / Replica / DTU, a spann3r.pth-shaped zipfile checkpoint through the
production converter, scan -> alignment -> ICP -> chamfer -> logs.txt ->
BASELINE table — on fabricated fixtures."""
import os.path as osp

import numpy as np
import pytest

from tools import readiness_drill as rd


def test_drill_end_to_end(tmp_path, capsys):
    data = str(tmp_path / "data")
    exp = str(tmp_path / "ckpts")
    rd.main(["--fixtures", data, "--tiny", "--exp_path", exp,
             "--exp_name", "drill"])
    out = capsys.readouterr().out
    assert "READINESS DRILL PASSED" in out

    # the synthesized checkpoint is a real torch-zipfile .pth
    import zipfile
    assert zipfile.is_zipfile(osp.join(exp, "spann3r.pth"))

    # every dataset produced the full artifact contract
    for name in ("7scenes", "NRGBD", "Replica", "DTU"):
        d = osp.join(exp, "drill", name)
        log = open(osp.join(d, "logs.txt")).read()
        assert f"Dataset: {name}, Accuracy:" in log
        assert "Average fps" in log
        assert name in out  # table row printed
    # chamfer table shape
    assert "| Dataset | Acc | Comp |" in out


def test_dtu_pair_txt_cluster_sampling(tmp_path):
    """The fabricated pair.txt parses through the MVSNet cluster path
    (full_video=False), ref dtu.py:93-109 ordering preserved."""
    from spann3r_tpu.datasets import DTU

    root = str(tmp_path / "dtu_test")
    rd.make_dtu(root)
    ds = DTU(split="test", ROOT=root, resolution=32, num_seq=2,
             num_frames=3, full_video=False)
    views = ds[1]  # seq_id 1 -> ref frame 1 + first 3 cluster candidates
    assert len(views) == 4
    labels = [v["instance"] for v in views]
    assert labels[0] == "00000001.jpg"  # ref frame leads
    for v in views:
        assert v["img"].shape == (32, 32, 3)
        assert np.isfinite(v["camera_pose"]).all()


def test_nrgbd_nan_pose_row_marked_invalid(tmp_path):
    """poses.txt 'nan' rows -> identity + invalid flag (ref nrgbd.py:59-75)."""
    from spann3r_tpu.datasets.nrgbd import NRGBD

    root = str(tmp_path / "neural_rgbd")
    rd.make_nrgbd(root, n_frames=3)
    pose_path = osp.join(root, "kitchen", "poses.txt")
    lines = open(pose_path).read().splitlines()
    lines[4] = "nan nan nan nan"
    open(pose_path, "w").write("\n".join(lines) + "\n")
    poses, valid = NRGBD.load_poses(pose_path)
    assert valid == [True, False, True]
    np.testing.assert_array_equal(poses[1], np.eye(4))
