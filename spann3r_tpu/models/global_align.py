"""Global alignment of pairwise pointmaps (TPU rebuild of dust3r/cloud_opt).

Given pairwise two-view predictions over a scene graph (from
models.inference.inference), jointly optimizes per-image depthmaps, poses and
focals plus per-edge similarity transforms so that every pairwise prediction
agrees with one global point cloud — the reference's PointCloudOptimizer
(dust3r/cloud_opt/base_opt.py:270-297, optimizer.py:16-50).

TPU-first: all per-image and per-edge states are stacked arrays, the whole
alignment energy is ONE jitted Adam step (the reference loops per edge in
python); pose initialization chains centroid offsets along a max-confidence
spanning tree host-side (a coarse init Adam refines — the pairwise output
lacks cam-j-frame pointmaps, so a full Kabsch relative pose is not
computable from it).

Loss (ref base_opt.forward): for each edge e=(i,j)
    loss_e = mean(w_i * |P_i - s_e T_e pred_i|) + mean(w_j * |P_j - s_e T_e pred_j|)
with P_k the global points unprojected from (depth_k, focal_k, pose_k) and
w = log(conf).  Per-edge scales are normalized to mean-log 0.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# quaternion / SE3 helpers
# ---------------------------------------------------------------------------

def quat_to_rot(q: jax.Array) -> jax.Array:
    """(…, 4) xyzw quaternion -> (…, 3, 3) rotation."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def rot_to_quat(r: np.ndarray) -> np.ndarray:
    """3x3 -> xyzw quaternion (host-side init only)."""
    from scipy.spatial.transform import Rotation
    return Rotation.from_matrix(r).as_quat()


def _unproject(depth: jax.Array, focal: jax.Array, pp: jax.Array) -> jax.Array:
    """depth (N,H,W), focal (N,), pp (N,2) -> camera-frame points (N,H,W,3)."""
    n, h, w = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = xs[None] - pp[:, 0, None, None]
    v = ys[None] - pp[:, 1, None, None]
    f = focal[:, None, None]
    return jnp.stack([depth * u / f, depth * v / f, depth], axis=-1)


class GlobalAligner:
    """Joint pose/depth/focal optimization over a pairwise scene graph."""

    def __init__(self, output: Dict, min_conf_thr: float = 3.0):
        i1 = np.asarray(output["view1"]["idx"])
        i2 = np.asarray(output["view2"]["idx"])
        self.edges: List[Tuple[int, int]] = list(zip(i1.tolist(), i2.tolist()))
        self.pred_i = np.asarray(output["pred1"]["pts3d"], np.float32)
        self.pred_j = np.asarray(output["pred2"]["pts3d_in_other_view"],
                                 np.float32)
        self.conf_i = np.asarray(output["pred1"]["conf"], np.float32)
        self.conf_j = np.asarray(output["pred2"]["conf"], np.float32)
        self.n_imgs = int(max(i1.max(), i2.max())) + 1
        self.n_edges = len(self.edges)
        _, self.h, self.w, _ = self.pred_i.shape
        self.min_conf_thr = min_conf_thr
        self.params = self._init_params()
        self._edge_i = jnp.asarray(i1, jnp.int32)
        self._edge_j = jnp.asarray(i2, jnp.int32)

    # ---------------- initialization (host-side) ----------------

    def _init_params(self) -> Dict[str, jax.Array]:
        n, e = self.n_imgs, self.n_edges
        # focal init: 60-deg FoV base (refined by the optimizer)
        base_focal = max(self.h, self.w) / (2 * np.tan(np.deg2rad(60) / 2))
        # depth init: per-image z of the most confident edge prediction
        depth0 = np.full((n, self.h, self.w), 1.0, np.float32)
        best_conf = np.full(n, -np.inf)
        for k, (i, j) in enumerate(self.edges):
            ci = self.conf_i[k].mean()
            if ci > best_conf[i]:
                best_conf[i] = ci
                depth0[i] = np.clip(self.pred_i[k][..., 2], 1e-3, None)
        quats, trans = self._mst_pose_init()
        return {
            "im_quat": jnp.asarray(quats, jnp.float32),
            "im_trans": jnp.asarray(trans, jnp.float32),
            "im_logdepth": jnp.asarray(np.log(depth0), jnp.float32),
            "im_logfocal": jnp.full((n,), np.log(base_focal), jnp.float32),
            "pw_quat": jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32),
                                (e, 1)),
            "pw_trans": jnp.zeros((e, 3), jnp.float32),
            "pw_logscale": jnp.zeros((e,), jnp.float32),
        }

    def _mst_pose_init(self) -> Tuple[np.ndarray, np.ndarray]:
        """Chain camera poses along a max-confidence spanning tree
        (ref cloud_opt/init_im_poses.py, simplified): per-edge relative pose
        from a Kabsch fit between pred_i (frame i content in cam-i coords)
        and pred_j (frame j content in cam-i coords)."""
        n = self.n_imgs
        quats = np.tile(np.array([0, 0, 0, 1.0], np.float32), (n, 1))
        trans = np.zeros((n, 3), np.float32)

        # best edge per (i, j) pair by conf
        conf_e = self.conf_i.mean((1, 2)) + self.conf_j.mean((1, 2))
        order = np.argsort(-conf_e)
        visited = {int(self.edges[order[0]][0])}
        pose = {next(iter(visited)): np.eye(4)}

        def rel_pose(k):
            """cam_j -> cam_i from edge k: pred_j[k] are cam-j-content points
            expressed in cam i; unprojecting frame j's own depth would need
            its pointmap in cam-j coords, which pairwise output lacks — so
            approximate with the centroid offset + identity rotation, which
            Adam refines quickly."""
            cj = self.pred_j[k].reshape(-1, 3)
            wj = self.conf_j[k].reshape(-1)
            centroid = (cj * wj[:, None]).sum(0) / np.clip(wj.sum(), 1e-8, None)
            m = np.eye(4)
            m[:3, 3] = centroid
            return m

        changed = True
        while changed and len(visited) < n:
            changed = False
            for k in order:
                i, j = self.edges[k]
                if i in visited and j not in visited:
                    pose[j] = pose[i] @ rel_pose(k)
                    visited.add(j)
                    changed = True
                elif j in visited and i not in visited:
                    m = rel_pose(k)
                    m[:3, 3] *= -1
                    pose[i] = pose[j] @ m
                    visited.add(i)
                    changed = True
        # rebase so image 0 is the identity — the optimizer gauge-fixes
        # rot[0]=I, tr[0]=0, so the init must be expressed in image-0's frame
        base_inv = np.linalg.inv(pose.get(0, np.eye(4)))
        for i in range(n):
            m = base_inv @ pose.get(i, np.eye(4))
            quats[i] = rot_to_quat(m[:3, :3])
            trans[i] = m[:3, 3]
        return quats, trans

    # ---------------- energy ----------------

    def _data(self):
        """Edge tensors as jit ARGUMENTS (not trace-time constants, which
        would bake hundreds of MB of predictions into the executable)."""
        return {"pi": jnp.asarray(self.pred_i), "pj": jnp.asarray(self.pred_j),
                "wi": jnp.log(jnp.asarray(self.conf_i)),
                "wj": jnp.log(jnp.asarray(self.conf_j))}

    def _loss(self, params, data) -> jax.Array:
        n = self.n_imgs
        pp = jnp.tile(jnp.asarray([[self.w / 2, self.h / 2]], jnp.float32),
                      (n, 1))
        focal = jnp.exp(params["im_logfocal"])
        depth = jnp.exp(params["im_logdepth"])
        rot = quat_to_rot(params["im_quat"])          # (N,3,3)
        tr = params["im_trans"]                       # (N,3)
        # freeze image 0 at identity (gauge fixing, ref optimizer.py)
        rot = rot.at[0].set(jnp.eye(3))
        tr = tr.at[0].set(0.0)
        cam_pts = _unproject(depth, focal, pp)        # (N,H,W,3)
        glob = jnp.einsum("nab,nhwb->nhwa", rot, cam_pts) + tr[:, None, None]

        # per-edge similarity transform with mean-log-0 scale normalization
        logscale = params["pw_logscale"]
        scale = jnp.exp(logscale - jnp.mean(logscale))
        e_rot = quat_to_rot(params["pw_quat"]) * scale[:, None, None]
        e_tr = params["pw_trans"]

        pi, pj, wi, wj = data["pi"], data["pj"], data["wi"], data["wj"]
        ali = jnp.einsum("eab,ehwb->ehwa", e_rot, pi) + e_tr[:, None, None]
        alj = jnp.einsum("eab,ehwb->ehwa", e_rot, pj) + e_tr[:, None, None]

        gi = glob[self._edge_i]
        gj = glob[self._edge_j]

        def safe_norm(x):  # grad-safe at zero residual
            return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1) + 1e-12)

        li = jnp.mean(wi * safe_norm(gi - ali), axis=(1, 2))
        lj = jnp.mean(wj * safe_norm(gj - alj), axis=(1, 2))
        return jnp.mean(li + lj)

    # ---------------- optimization ----------------

    def optimize(self, niter: int = 300, lr: float = 0.01,
                 verbose: bool = False) -> float:
        """Adam with cosine LR decay (ref demo usage: niter 300, lr 0.01)."""
        sched = optax.cosine_decay_schedule(lr, niter, alpha=1e-3)
        opt = optax.adam(sched, b1=0.9, b2=0.9)
        state = opt.init(self.params)
        data = self._data()

        @jax.jit
        def step(params, state, data):
            loss, grads = jax.value_and_grad(self._loss)(params, data)
            updates, state = opt.update(grads, state)
            return optax.apply_updates(params, updates), state, loss

        loss = None
        for it in range(niter):
            self.params, state, loss = step(self.params, state, data)
            if verbose and it % 50 == 0:
                print(f"align iter {it}: loss {float(loss):.5f}")
        return float(loss)

    # ---------------- results ----------------

    def get_focals(self) -> np.ndarray:
        return np.exp(np.asarray(self.params["im_logfocal"]))

    def get_im_poses(self) -> np.ndarray:
        rot = np.array(quat_to_rot(self.params["im_quat"]))
        tr = np.array(self.params["im_trans"])
        rot[0] = np.eye(3)
        tr[0] = 0
        out = np.tile(np.eye(4, dtype=np.float32), (self.n_imgs, 1, 1))
        out[:, :3, :3] = rot
        out[:, :3, 3] = tr
        return out

    def get_depthmaps(self) -> np.ndarray:
        return np.exp(np.asarray(self.params["im_logdepth"]))

    def get_pts3d(self) -> np.ndarray:
        """Optimized global pointmaps (N, H, W, 3)."""
        n = self.n_imgs
        pp = jnp.tile(jnp.asarray([[self.w / 2, self.h / 2]], jnp.float32),
                      (n, 1))
        cam = _unproject(jnp.exp(self.params["im_logdepth"]),
                         jnp.exp(self.params["im_logfocal"]), pp)
        poses = self.get_im_poses()
        return np.asarray(jnp.einsum("nab,nhwb->nhwa",
                                     jnp.asarray(poses[:, :3, :3]), cam)
                          + jnp.asarray(poses[:, None, None, :3, 3]))

    def get_masks(self) -> np.ndarray:
        """Per-image max-over-edges confidence mask (ref get_masks)."""
        conf = np.zeros((self.n_imgs, self.h, self.w), np.float32)
        for k, (i, j) in enumerate(self.edges):
            conf[i] = np.maximum(conf[i], self.conf_i[k])
            conf[j] = np.maximum(conf[j], self.conf_j[k])
        for i, sky in getattr(self, "_sky_masks", {}).items():
            conf[i][sky] = 0.0
        return conf > self.min_conf_thr

    def mask_sky(self, imgs) -> "GlobalAligner":
        """Copy of the aligner with sky pixels' per-image confidence zeroed
        (ref dust3r/cloud_opt/base_opt.py:320-326 zeroes im_conf — the MASK
        source — never the edge weights conf_i/conf_j, which feed the
        energy through log and would go -inf).  imgs: per-image RGB arrays
        in [0,1] or uint8."""
        import copy

        from ..utils.viz3d import segment_sky
        res = copy.deepcopy(self)
        res._sky_masks = {i: segment_sky(np.asarray(im))
                          for i, im in enumerate(imgs)}
        return res

    def show(self, imgs=None, cam_size: float = None, path: str = None) -> str:
        """Assemble pointclouds + camera frusta and write/show a GLB scene
        (ref base_opt.py:328-343 via SceneViz)."""
        from ..utils.viz3d import CAM_COLORS, SceneViz, auto_cam_size
        viz = SceneViz()
        pts = self.get_pts3d()
        masks = self.get_masks()
        colors = [CAM_COLORS[n % len(CAM_COLORS)] for n in range(self.n_imgs)]
        for n in range(self.n_imgs):
            viz.add_pointcloud(pts[n],
                               imgs[n] if imgs is not None else colors[n],
                               masks[n])
        poses = self.get_im_poses()
        if cam_size is None:
            cam_size = max(auto_cam_size(poses), 1e-3)
        viz.add_cameras(poses, self.get_focals(), colors=colors,
                        imsizes=[(self.w, self.h)] * self.n_imgs,
                        cam_size=cam_size)
        return viz.show(path)


def global_aligner(output: Dict, min_conf_thr: float = 3.0) -> GlobalAligner:
    """Factory mirroring dust3r.cloud_opt.global_aligner()."""
    return GlobalAligner(output, min_conf_thr=min_conf_thr)
