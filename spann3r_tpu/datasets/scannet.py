"""ScanNet training dataset (ref spann3r/datasets/scannet.py)."""
from __future__ import annotations

import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class Scannet(BaseManyViewDataset):
    def __init__(self, num_seq=100, num_frames=5, min_thresh=10, max_thresh=100,
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
        self.folder = {"train": "scans", "val": "scans",
                       "test": "scans_test"}[self.split]
        if self.test_id is None:
            meta = osp.join(base_dir, "splits", f"scannetv2_{self.split}.txt")
            if not osp.exists(meta):
                raise FileNotFoundError(f"Split file {meta} not found")
            with open(meta) as f:
                self.scene_list = f.read().splitlines()
        elif isinstance(self.test_id, list):
            self.scene_list = self.test_id
        else:
            self.scene_list = [self.test_id]

    def _get_views(self, idx, resolution, rng, attempts=0):
        import cv2

        scene_id = self.scene_list[idx // self.num_seq]
        intri = np.loadtxt(osp.join(self.ROOT, self.folder, scene_id,
                                    "intrinsic/intrinsic_depth.txt")
                           ).astype(np.float32)[:3, :3]
        data_path = osp.join(self.ROOT, self.folder, scene_id, "sensor_data")
        n = len([f for f in os.listdir(data_path) if "color" in f])
        img_idxs = self.sample_frame_idx([f"{i:06d}" for i in range(n)], rng,
                                         full_video=self.full_video)

        views = []
        for im_idx in deque(img_idxs):
            impath = osp.join(data_path, f"frame-{im_idx}.color.jpg")
            depthpath = osp.join(data_path, f"frame-{im_idx}.depth.png")
            posepath = osp.join(data_path, f"frame-{im_idx}.pose.txt")

            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
            rgb_image = cv2.resize(rgb_image, (depthmap.shape[1], depthmap.shape[0]))
            depthmap = np.nan_to_num(depthmap.astype(np.float32), 0.0) / 1000.0
            camera_pose = np.loadtxt(posepath).astype(np.float32)

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intri, resolution, rng=rng, info=impath)

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
                              dataset="scannet",
                              label=osp.join(scene_id, im_idx),
                              instance=osp.split(impath)[1]))
        return views
