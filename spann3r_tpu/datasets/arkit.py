"""ARKitScenes dataset (ref spann3r/datasets/arkit.py)."""
from __future__ import annotations

import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


def traj_string_to_matrix(traj_string: str):
    """.traj line -> (timestamp, cam2world-ish Rt) (ref arkit.py:92-117):
    axis-angle + translation world->cam, inverted."""
    import cv2
    tokens = traj_string.split()
    assert len(tokens) == 7
    ts = tokens[0]
    angle_axis = np.asarray([float(tokens[1]), float(tokens[2]), float(tokens[3])])
    r_w_to_p, _ = cv2.Rodrigues(angle_axis)
    t_w_to_p = np.asarray([float(tokens[4]), float(tokens[5]), float(tokens[6])])
    ext = np.eye(4)
    ext[:3, :3] = r_w_to_p
    ext[:3, -1] = t_w_to_p
    return ts, np.linalg.inv(ext)


class ArkitScene(BaseManyViewDataset):
    def __init__(self, num_seq=100, num_frames=5, min_thresh=10, max_thresh=50,
                 test_id=None, full_video=False, kf_every=1, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        self.num_seq = num_seq
        self.num_frames = num_frames
        self.max_thresh = max_thresh
        self.min_thresh = min_thresh
        self.test_id = test_id
        self.full_video = full_video
        self.kf_every = kf_every
        self.load_all_scenes(ROOT)

    def __len__(self):
        return len(self.scene_list) * self.num_seq

    def load_all_scenes(self, base_dir):
        if self.test_id is None:
            sub = {"train": "Training", "val": "Validation"}[self.split]
            self.scene_path = osp.join(base_dir, "raw", sub)
            self.scene_list = os.listdir(self.scene_path)
        else:
            self.scene_path = base_dir
            self.scene_list = (self.test_id if isinstance(self.test_id, list)
                               else [self.test_id])

    def get_intrinsic(self, intrinsics_dir, frame_id, video_id):
        fn = osp.join(intrinsics_dir, f"{video_id}_{frame_id}.pincam")
        if not osp.exists(fn):
            fn = osp.join(intrinsics_dir,
                          f"{video_id}_{float(frame_id) - 0.001:.3f}.pincam")
        if not osp.exists(fn):
            fn = osp.join(intrinsics_dir,
                          f"{video_id}_{float(frame_id) + 0.001:.3f}.pincam")
        _, _, fx, fy, hw, hh = np.loadtxt(fn)
        return np.asarray([[fx, 0, hw], [0, fy, hh], [0, 0, 1]])

    def get_pose(self, frame_id, poses_from_traj):
        pose = None
        if str(frame_id) in poses_from_traj:
            pose = np.array(poses_from_traj[str(frame_id)])
        else:
            for key in poses_from_traj:
                if abs(float(frame_id) - float(key)) < 0.1:
                    pose = np.array(poses_from_traj[str(key)])
        if pose is None:
            return None
        # ARKit axis swizzle (ref arkit.py:86-90)
        pose[0:3, 1:3] *= -1
        pose = pose[np.array([1, 0, 2, 3]), :]
        pose[2, :] *= -1
        return pose

    def _get_views(self, idx, resolution, rng, attempts=0):
        scene_id = self.scene_list[idx // self.num_seq]

        image_path = osp.join(self.scene_path, scene_id, "lowres_wide")
        depth_path = osp.join(self.scene_path, scene_id, "lowres_depth")
        intrinsics_path = osp.join(self.scene_path, scene_id,
                                   "lowres_wide_intrinsics")
        pose_path = osp.join(self.scene_path, scene_id, "lowres_wide.traj")

        if not all(map(osp.exists, (image_path, depth_path, intrinsics_path,
                                    pose_path))):
            return self._get_views(int(rng.integers(0, len(self) - 1)),
                                   resolution, rng)

        ids = [x.split(".png")[0].split("_")[1]
               for x in sorted(os.listdir(depth_path))]
        if len(ids) < self.num_frames:
            return self._get_views(int(rng.integers(0, len(self) - 1)),
                                   resolution, rng)
        img_idxs = self.sample_frame_idx(ids, rng, full_video=self.full_video)

        poses_from_traj = {}
        with open(pose_path, encoding="utf-8") as f:
            for line in f.readlines():
                key = f"{round(float(line.split(' ')[0]), 3):.3f}"
                poses_from_traj[key] = np.array(
                    traj_string_to_matrix(line)[1].tolist())

        views = []
        for im_idx in deque(img_idxs):
            impath = osp.join(image_path, f"{scene_id}_{im_idx}.png")
            depthpath = osp.join(depth_path, f"{scene_id}_{im_idx}.png")
            camera_pose = self.get_pose(im_idx, poses_from_traj)
            if not osp.exists(impath) or not osp.exists(depthpath) \
                    or camera_pose is None:
                return self._get_views(int(rng.integers(0, len(self) - 1)),
                                       resolution, rng)

            import cv2
            intrinsics_ = self.get_intrinsic(intrinsics_path, im_idx,
                                             scene_id).astype(np.float32)
            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
            depthmap = np.nan_to_num(depthmap.astype(np.float32), 0.0) / 1000.0

            camera_pose = camera_pose.astype(np.float32)
            camera_pose[:, 1:3] *= -1.0  # gl -> cv

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics_, resolution, rng=rng, info=impath)

            if (depthmap > 0.0).sum() == 0 or not np.isfinite(camera_pose).all():
                if self.full_video:
                    continue
                if attempts >= 5:
                    return self._get_views(int(rng.integers(0, len(self) - 1)),
                                           resolution, rng)
                return self._get_views(idx, resolution, rng, attempts + 1)

            views.append(dict(img=rgb_image, depthmap=depthmap,
                              camera_pose=camera_pose,
                              camera_intrinsics=intrinsics,
                              dataset="arkit",
                              label=osp.join(scene_id, im_idx),
                              instance=osp.split(impath)[1]))
        return views
