"""DTU MVS eval dataset (ref spann3r/datasets/dtu.py)."""
from __future__ import annotations

import os
import os.path as osp
from collections import deque

import numpy as np

from ..utils.image import imread_cv2
from .base import BaseManyViewDataset


def load_cam_mvsnet(f, interval_scale=1.0):
    """MVSNet cam.txt parser (ref dtu.py:50-91): extrinsic 4x4 + intrinsic
    3x3 + optional depth range row."""
    words = f.read().split()
    cam = np.zeros((2, 4, 4))
    for i in range(4):
        for j in range(4):
            cam[0][i][j] = words[4 * i + j + 1]
    for i in range(3):
        for j in range(3):
            cam[1][i][j] = words[3 * i + j + 18]
    if len(words) == 29:
        cam[1][3][0] = words[27]
        cam[1][3][1] = float(words[28]) * interval_scale
        cam[1][3][2] = 192
        cam[1][3][3] = cam[1][3][0] + cam[1][3][1] * cam[1][3][2]
    elif len(words) == 30:
        cam[1][3][0] = words[27]
        cam[1][3][1] = float(words[28]) * interval_scale
        cam[1][3][2] = words[29]
        cam[1][3][3] = cam[1][3][0] + cam[1][3][1] * cam[1][3][2]
    elif len(words) == 31:
        cam[1][3][0] = words[27]
        cam[1][3][1] = float(words[28]) * interval_scale
        cam[1][3][2] = words[29]
        cam[1][3][3] = words[30]
    return cam[1].astype(np.float32), cam[0].astype(np.float32)


class DTU(BaseManyViewDataset):
    def __init__(self, num_seq=49, num_frames=5, min_thresh=10, max_thresh=30,
                 test_id=None, full_video=False, sample_pairs=False,
                 kf_every=1, *args, ROOT, **kwargs):
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
            self.scene_list = os.listdir(base_dir)
        elif isinstance(self.test_id, list):
            self.scene_list = self.test_id
        else:
            self.scene_list = [self.test_id]

    def sample_pair_list(self, pairs_path, seq_id):
        """MVSNet pair.txt cluster sampling (ref dtu.py:93-109)."""
        lines = open(pairs_path).read().splitlines()
        ref_idx = int(lines[2 * seq_id + 1])
        cluster = lines[2 * seq_id + 2].split()
        ids = ["{:08d}.jpg".format(ref_idx)]
        for c in range(self.num_frames):
            ids.append("{:08d}.jpg".format(int(cluster[2 * c + 1])))
        ids.reverse()
        return ids

    def _get_views(self, idx, resolution, rng):
        import cv2

        scene_id = self.scene_list[idx // self.num_seq]
        seq_id = idx % self.num_seq

        image_path = osp.join(self.ROOT, scene_id, "images")
        depth_path = osp.join(self.ROOT, scene_id, "depths")
        mask_path = osp.join(self.ROOT, scene_id, "binary_masks")
        cam_path = osp.join(self.ROOT, scene_id, "cams")
        pairs_path = osp.join(self.ROOT, scene_id, "pair.txt")

        if not self.full_video:
            img_idxs = self.sample_pair_list(pairs_path, seq_id)
        else:
            img_idxs = sorted(os.listdir(image_path))
            img_idxs = self.sample_frame_idx(img_idxs, rng,
                                             full_video=self.full_video)

        views = []
        imgs_idxs = deque(img_idxs)
        while imgs_idxs:
            im_idx = imgs_idxs.pop()  # reference pops from the right
            impath = osp.join(image_path, im_idx)
            depthpath = osp.join(depth_path, im_idx.replace(".jpg", ".npy"))
            campath = osp.join(cam_path, im_idx.replace(".jpg", "_cam.txt"))
            maskpath = osp.join(mask_path, im_idx.replace(".jpg", ".png"))

            rgb_image = imread_cv2(impath)
            depthmap = np.nan_to_num(np.load(depthpath).astype(np.float32), 0.0)

            # eroded binary mask (ref dtu.py:145-154)
            mask = imread_cv2(maskpath, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
            mask = (mask > 0.5).astype(np.float32)
            mask = cv2.resize(mask, (depthmap.shape[1], depthmap.shape[0]),
                              interpolation=cv2.INTER_NEAREST)
            mask = cv2.erode(mask, np.ones((10, 10), np.uint8), iterations=1)
            depthmap = depthmap * mask

            intrinsics, extrinsic = load_cam_mvsnet(open(campath))
            camera_pose = np.linalg.inv(extrinsic)

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics[:3, :3], resolution, rng=rng,
                info=impath)

            views.append(dict(img=rgb_image, depthmap=depthmap,
                              camera_pose=camera_pose,
                              camera_intrinsics=intrinsics,
                              dataset="dtu",
                              label=osp.join(scene_id, im_idx),
                              instance=osp.split(impath)[1]))
        return views
