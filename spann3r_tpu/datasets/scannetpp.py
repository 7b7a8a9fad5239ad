"""ScanNet++ dataset (ref spann3r/datasets/scannetpp.py)."""
from __future__ import annotations

import json
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class Scannetpp(BaseManyViewDataset):
    def __init__(self, num_seq=100, num_frames=5, min_thresh=5, max_thresh=30,
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
            meta = osp.join(base_dir, "splits", f"nvs_sem_{self.split}.txt")
            if not osp.exists(meta):
                raise FileNotFoundError(f"Split file {meta} not found")
            with open(meta) as f:
                self.scene_list = f.read().splitlines()
        elif isinstance(self.test_id, list):
            self.scene_list = self.test_id
        else:
            self.scene_list = [self.test_id]

    def _get_views(self, idx, resolution, rng, attempts=0):
        scene_id = self.scene_list[idx // self.num_seq]

        meta_path = osp.join(self.ROOT, "data", scene_id,
                             "dslr/nerfstudio/transforms_undistorted.json")
        meta = json.load(open(meta_path))
        fx, fy, cx, cy = meta["fl_x"], meta["fl_y"], meta["cx"], meta["cy"]
        frames = meta["frames"]
        train_info = json.load(open(osp.join(
            self.ROOT, "data", scene_id, "dslr/train_test_lists.json")))

        img_idxs = self.sample_frame_idx(sorted(train_info["train"]), rng,
                                         full_video=self.full_video)
        name_to_idx = {fr["file_path"]: i for i, fr in enumerate(frames)}

        views = []
        for im_idx in deque(img_idxs):
            import cv2
            impath = osp.join(self.ROOT, "data", scene_id,
                              "dslr/undistorted_images", im_idx)
            depthpath = osp.join(self.ROOT, "data", scene_id,
                                 "dslr/undistorted_depths",
                                 im_idx.replace(".JPG", ".png"))
            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
            depthmap = np.nan_to_num(depthmap.astype(np.float32), 0.0) / 1000.0

            fr = frames[name_to_idx[im_idx]]
            intrinsics = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                                  dtype=np.float32)
            camera_pose = np.array(fr["transform_matrix"], dtype=np.float32)
            camera_pose[:, 1:3] *= -1.0  # gl -> cv

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng, info=impath)

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
                              dataset="scannetpp",
                              label=osp.join(scene_id, im_idx),
                              instance=osp.split(impath)[1]))
        return views
