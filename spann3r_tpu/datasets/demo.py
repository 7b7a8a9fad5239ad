"""Images-only demo dataset (ref spann3r/datasets/demo.py:11-98)."""
from __future__ import annotations

import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class Demo(BaseManyViewDataset):
    def __init__(self, num_seq=1, num_frames=5, min_thresh=10, max_thresh=100,
                 full_video=True, kf_every=1, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        self.num_seq = num_seq
        self.num_frames = num_frames
        self.max_thresh = max_thresh
        self.min_thresh = min_thresh
        self.full_video = full_video
        self.kf_every = kf_every

    def __len__(self):
        return self.num_seq

    def _get_views(self, idx, resolution, rng):
        exts = (".jpg", ".jpeg", ".png", ".heic")
        names = [n for n in sorted(os.listdir(self.ROOT))
                 if n.lower().endswith(exts) and "depth" not in n.lower()]
        if not names:
            raise FileNotFoundError(
                f"no images ({'/'.join(exts)}) found in {self.ROOT}")
        names = self.sample_frame_idx(names, rng, full_video=self.full_video)

        views = []
        for name in deque(names):
            impath = osp.join(self.ROOT, name)
            if impath.lower().endswith(".heic"):
                import PIL.Image
                rgb_image = np.array(PIL.Image.open(impath).convert("RGB"))
            else:
                rgb_image = imread_cv2(impath)

            stem = impath.rsplit(".", 1)[0]
            depth_path = stem + "_depth.png"
            meta_path = stem + ".npz"
            meta = None
            if osp.exists(meta_path):
                meta = np.load(meta_path)
                camera_pose = meta["camera_pose"].astype(np.float32)
                intrinsics = meta["camera_intrinsics"].astype(np.float32)
            else:
                cx, cy = rgb_image.shape[1] // 2, rgb_image.shape[0] // 2
                intrinsics = np.array([[1.0, 0, cx], [0, 1.0, cy], [0, 0, 1]],
                                      dtype=np.float32)
                camera_pose = np.eye(4, dtype=np.float32)

            if osp.exists(depth_path):
                import cv2
                depthmap = imread_cv2(depth_path, cv2.IMREAD_UNCHANGED)
                depthmap = (depthmap.astype(np.float32) / 65535) * \
                    np.nan_to_num(meta["maximum_depth"])
            else:
                depthmap = np.ones(rgb_image.shape[:2], dtype=np.float32)

            import cv2
            rgb_image = cv2.resize(rgb_image, (depthmap.shape[1], depthmap.shape[0]))
            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng, info=impath)

            views.append(dict(img=rgb_image, depthmap=depthmap,
                              camera_pose=camera_pose,
                              camera_intrinsics=intrinsics,
                              dataset="demo", label=impath,
                              instance=osp.split(impath)[1]))
        return views
