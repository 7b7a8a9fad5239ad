"""Habitat pre-rendered 5-frame clips (ref spann3r/datasets/habitat.py)."""
from __future__ import annotations

import json
import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class habitat(BaseManyViewDataset):  # noqa: N801 — name kept for config parity
    def __init__(self, num_seq=200, num_frames=5, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        self.num_seq = num_seq
        self.num_frames = num_frames
        self.load_all_scenes(ROOT, num_seq)

    def __len__(self):
        return len(self.scene_list) * self.num_seq

    def load_all_scenes(self, base_dir, num_seq=200):
        scenes = {}
        for data in os.listdir(base_dir):
            for s in os.listdir(osp.join(base_dir, data)):
                scenes[(data, s)] = list(range(num_seq))
        self.scenes = scenes
        self.scene_list = list(scenes.keys())

    def _get_views(self, idx, resolution, rng, attempts=0):
        import cv2

        data, scene = self.scene_list[idx // self.num_seq]
        seq_id = idx % self.num_seq

        order = list(range(1, self.num_frames + 1))
        rng.shuffle(order)

        views = []
        for im_idx in deque(order):
            impath = osp.join(self.ROOT, data, scene, f"{seq_id:08}_{im_idx}.jpeg")
            depthpath = osp.join(self.ROOT, data, scene,
                                 f"{seq_id:08}_{im_idx}_depth.exr")
            campath = osp.join(self.ROOT, data, scene,
                               f"{seq_id:08}_{im_idx}_camera_params.json")
            if not osp.exists(impath):
                return self._get_views(int(rng.integers(0, len(self) - 1)),
                                       resolution, rng)

            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
            cam = json.load(open(campath))
            intrinsics_ = np.array(cam["camera_intrinsics"], dtype=np.float32)
            camera_pose = np.eye(4, dtype=np.float32)
            camera_pose[:3, :3] = np.array(cam["R_cam2world"], dtype=np.float32)
            camera_pose[:3, 3] = np.array(cam["t_cam2world"], dtype=np.float32)

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics_, resolution, rng=rng, info=impath)

            if (depthmap > 0.0).sum() == 0 or not np.isfinite(camera_pose).all():
                if attempts >= 5:
                    return self._get_views(int(rng.integers(0, len(self) - 1)),
                                           resolution, rng)
                return self._get_views(idx, resolution, rng, attempts + 1)

            views.append(dict(img=rgb_image, depthmap=depthmap,
                              camera_pose=camera_pose,
                              camera_intrinsics=intrinsics,
                              dataset="habitat",
                              label=osp.join(data, scene),
                              instance=osp.split(impath)[1]))
        return views
