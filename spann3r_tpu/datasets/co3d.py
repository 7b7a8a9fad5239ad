"""CO3Dv2 dataset (ref spann3r/datasets/co3d.py)."""
from __future__ import annotations

import itertools
import json
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


class Co3d(BaseManyViewDataset):
    def __init__(self, mask_bg=True, use_comb=True, scene_class=None,
                 scene_id=None, num_seq=100, num_frames=5, min_thresh=5,
                 max_thresh=20, full_video=False, lb=0, ub=30, kf_every=1,
                 *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        assert mask_bg in (True, False, "rand")
        self.mask_bg = mask_bg
        self.num_seq = num_seq
        self.num_frames = num_frames
        self.max_thresh = max_thresh
        self.min_thresh = min_thresh
        self.full_video = full_video
        self.kf_every = kf_every
        self.use_comb = use_comb
        self.scenes, self.scene_list = self.load_scene(scene_class, scene_id)
        self.combinations, self.num_seq = self.get_combinations(use_comb, lb, ub)
        self.invalidate = {scene: {} for scene in self.scene_list}

    def get_combinations(self, use_comb, lb, ub):
        """Combinatorial 5-frame tuples with stride-5 spacing
        (ref co3d.py:41-53)."""
        if use_comb and not self.full_video:
            combos = list(itertools.combinations(range(100), self.num_frames))
            combos = [c for c in combos
                      if all(lb < abs(x - y) <= ub and abs(x - y) % 5 == 0
                             for x, y in zip(c, c[1:]))]
            return combos, len(combos)
        return None, self.num_seq

    def load_scene(self, scene_class=None, scene_id=None):
        with open(osp.join(self.ROOT, f"selected_seqs_{self.split}.json")) as f:
            scenes = json.load(f)
        if scene_class is not None:
            scenes = {k: v for k, v in scenes.items() if k == scene_class}
        else:
            scenes = {k: v for k, v in scenes.items() if len(v) > 0}
        if scene_id is not None:
            scenes = {(k, k2): v2 for k, v in scenes.items()
                      for k2, v2 in v.items() if k2 == scene_id}
        else:
            scenes = {(k, k2): v2 for k, v in scenes.items()
                      for k2, v2 in v.items()}
        return scenes, list(scenes.keys())

    def __len__(self):
        return len(self.scene_list) * self.num_seq

    def _get_views(self, idx, resolution, rng, attempts=0):
        import cv2

        obj, instance = self.scene_list[idx // self.num_seq]
        image_pool = self.scenes[obj, instance]

        if self.use_comb and not self.full_video:
            frame_idx = self.combinations[idx % len(self.combinations)]
            last = len(image_pool) - 1
            imgs_idxs = [max(0, min(i + rng.integers(-4, 5), last))
                         for i in frame_idx]
        else:
            imgs_idxs = self.sample_frames(range(len(image_pool)), rng)

        if resolution not in self.invalidate[obj, instance]:
            self.invalidate[obj, instance][resolution] = \
                [False] * len(image_pool)
        invalid = self.invalidate[obj, instance][resolution]

        mask_bg = (self.mask_bg is True) or \
            (self.mask_bg == "rand" and rng.choice(2))

        views = []
        d_min, d_max, d_first = 1e8, 0.0, None
        imgs_idxs = deque(imgs_idxs)
        while imgs_idxs:
            im_idx = imgs_idxs.popleft()
            if invalid[im_idx]:  # walk to a nearby valid image (ref co3d.py:112-119)
                direction = 2 * int(rng.choice(2)) - 1
                for off in range(1, len(image_pool)):
                    cand = (im_idx + direction * off) % len(image_pool)
                    if not invalid[cand]:
                        im_idx = cand
                        break

            view_idx = image_pool[im_idx]
            impath = osp.join(self.ROOT, obj, instance, "images",
                              f"frame{view_idx:06d}.jpg")
            meta = np.load(impath.replace("jpg", "npz"))
            camera_pose = meta["camera_pose"].astype(np.float32)
            intrinsics = meta["camera_intrinsics"].astype(np.float32)

            rgb_image = imread_cv2(impath)
            depthmap = imread_cv2(impath.replace("images", "depths")
                                  + ".geometric.png", cv2.IMREAD_UNCHANGED)
            depthmap = (depthmap.astype(np.float32) / 65535) * \
                np.nan_to_num(meta["maximum_depth"])

            if mask_bg:
                maskpath = osp.join(self.ROOT, obj, instance, "masks",
                                    f"frame{view_idx:06d}.png")
                maskmap = imread_cv2(maskpath, cv2.IMREAD_UNCHANGED
                                     ).astype(np.float32)
                depthmap *= (maskmap / 255.0) > 0.1

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng, info=impath)

            if (depthmap > 0.0).sum() == 0:
                invalid[im_idx] = True
                imgs_idxs.appendleft(im_idx)
                continue

            md = float(meta["maximum_depth"])
            d_max = max(d_max, md)
            d_min = min(d_min, md)
            d_first = md if d_first is None else d_first

            views.append(dict(img=rgb_image, depthmap=depthmap,
                              camera_pose=camera_pose,
                              camera_intrinsics=intrinsics,
                              dataset="Co3d_v2",
                              label=osp.join(obj, instance),
                              instance=osp.split(impath)[1]))

        # depth-ratio rejection (ref co3d.py:174-176)
        if d_max / max(d_min, 1e-8) > 100.0 or d_max / max(d_first, 1e-8) > 10.0:
            return self._get_views(int(rng.integers(0, len(self) - 1)),
                                   resolution, rng)
        return views
