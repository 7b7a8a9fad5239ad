"""BlendedMVS dataset (ref spann3r/datasets/blendedmvs.py)."""
from __future__ import annotations

import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class BlendMVS(BaseManyViewDataset):
    def __init__(self, num_seq=100, num_frames=5, min_thresh=10, max_thresh=30,
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
            meta = osp.join(base_dir, f"{self.split}_list.txt")
            if not osp.exists(meta):
                raise FileNotFoundError(f"Split file {meta} not found")
            with open(meta) as f:
                self.scene_list = f.read().splitlines()
        elif isinstance(self.test_id, list):
            self.scene_list = self.test_id
        else:
            self.scene_list = [self.test_id]

    def sample_pairs(self, pairs_path, rng, max_trials=10):
        """pair.txt cluster sampling (ref blendedmvs.py:35-63)."""
        lines = open(pairs_path).read().splitlines()
        image_num = int(lines[0])
        for _ in range(max_trials):
            sample_idx = int(rng.choice(image_num))
            ref_idx = int(lines[2 * sample_idx + 1])
            cluster = lines[2 * sample_idx + 2].split()
            total = int(cluster[0])
            if total > self.num_frames - 1:
                ids = ["{:08d}.jpg".format(ref_idx)]
                chosen = rng.choice(total, self.num_frames - 1, replace=False)
                for c in chosen:
                    ids.append("{:08d}.jpg".format(int(cluster[2 * c + 1])))
                if rng.choice([True, False]):
                    ids.reverse()
                return ids
        return None

    @staticmethod
    def load_cam_mvsnet(f):
        rt = np.loadtxt(f, skiprows=1, max_rows=4, dtype=np.float32)
        k = np.loadtxt(f, skiprows=2, max_rows=3, dtype=np.float32)
        return k, rt

    def _get_views(self, idx, resolution, rng, attempts=0):
        scene_id = self.scene_list[idx // self.num_seq]
        image_path = osp.join(self.ROOT, scene_id, "blended_images")
        depth_path = osp.join(self.ROOT, scene_id, "rendered_depth_maps")
        cam_path = osp.join(self.ROOT, scene_id, "cams")
        pairs_path = osp.join(cam_path, "pair.txt")

        if not self.full_video:
            img_idxs = self.sample_pairs(pairs_path, rng)
        else:
            img_idxs = sorted(os.listdir(image_path))[::self.kf_every]
        if img_idxs is None:
            return self._get_views(int(rng.integers(0, len(self) - 1)),
                                   resolution, rng)

        views = []
        d_min, d_max, d_first = 1e8, 0.0, None
        for im_idx in deque(img_idxs):
            import cv2
            impath = osp.join(image_path, im_idx)
            depthpath = osp.join(depth_path, im_idx.replace(".jpg", ".pfm"))
            campath = osp.join(cam_path, im_idx.replace(".jpg", "_cam.txt"))

            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
            depthmap = np.nan_to_num(depthmap.astype(np.float32), 0.0)

            k, rt = self.load_cam_mvsnet(open(campath))
            intrinsics = k[:3, :3]
            camera_pose = np.linalg.inv(rt)

            h, w = rgb_image.shape[:2]
            cx, cy = intrinsics[:2, 2].round().astype(int)
            if min(cx, w - cx) <= w / 5 or min(cy, h - cy) <= h / 5:
                return self._get_views(int(rng.integers(0, len(self) - 1)),
                                       resolution, rng)

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng, info=impath)

            dmax = float(depthmap.max())
            d_max = max(d_max, dmax)
            d_min = min(d_min, dmax)
            d_first = dmax if d_first is None else d_first

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
                              dataset="blendmvs",
                              label=osp.join(scene_id, im_idx),
                              instance=osp.split(impath)[1]))

        # depth-range rejection (ref blendedmvs.py:186-189)
        if d_max / max(d_min, 1e-8) > 100.0 or d_max / max(d_first, 1e-8) > 10.0:
            return self._get_views(int(rng.integers(0, len(self) - 1)),
                                   resolution, rng)
        return views
