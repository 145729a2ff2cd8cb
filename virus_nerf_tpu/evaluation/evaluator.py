"""End-to-end evaluation: color PSNR/SSIM + 2-D mapping NND metrics.

Counterpart of the reference's ``Trainer.evaluate`` pipeline
(reference: training/trainer.py:167-224,374-813): render 360-degree
horizontal depth scans from the NeRF, build the matching ground-truth scan by
ray-casting the GT slice map, project both to the 2-D plane, and compare with
nearest-neighbour distance metrics in three directions per sensor:

- ``nn``           prediction -> FoV-limited GT   (accuracy),
- ``nn_inv``       FoV-limited GT -> prediction   (coverage inside FoV),
- ``nn_inv_360``   full 360-degree GT -> prediction (total coverage).

Rendering is batchified through one fixed-shape jitted render function
(chunked, last chunk padded) instead of the reference's Python generator
over variable batches (training/trainer_base.py:183-253).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data.dataset import DeviceDataset
from virus_nerf_tpu.data.scene import Scene
from virus_nerf_tpu.evaluation.geometry import create_scan_rays, limit_fov
from virus_nerf_tpu.evaluation import metrics as M
from virus_nerf_tpu.models.ngp import NGPModel
from virus_nerf_tpu.models.renderer import render_rays


class Evaluator:
    """Host-side evaluation orchestration around a jitted render function."""

    def __init__(
        self,
        model: NGPModel,
        cfg: Config,
        dataset: DeviceDataset,
        scene: Scene,
        img_wh: Optional[Tuple[int, int]] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.dataset = dataset
        self.scene = scene
        self.img_wh = img_wh
        self._render_jit = None
        self._density_jit = None

    def _density_fn(self):
        """Cached jitted density probe (compiled once per Evaluator, like
        the render chunk — re-jitting per call would recompile even at
        identical shapes)."""
        if self._density_jit is None:
            model = self.model
            self._density_jit = jax.jit(lambda p, x: model.density(p, x))
        return self._density_jit

    # ------------------------------------------------------------- rendering
    def _render_chunk_fn(self):
        if self._render_jit is None:
            model = self.model
            esf = self.cfg.exp_step_factor
            max_samples = self.cfg.evaluation.max_samples_per_ray
            n_candidates = self.cfg.training.march_candidates
            march_resolution = self.cfg.training.march_resolution
            sample_budget = self.cfg.evaluation.sample_budget
            if sample_budget is not None and sample_budget <= 0:
                sample_budget = None

            @jax.jit
            def render_chunk(params, occ_bool, rays_o, rays_d):
                out = render_rays(
                    model, params, occ_bool, rays_o, rays_d,
                    jax.random.PRNGKey(0),
                    exp_step_factor=esf, max_samples=max_samples,
                    n_candidates=n_candidates, jitter=False,
                    march_resolution=march_resolution,
                    sample_budget=sample_budget,
                )
                return {
                    "rgb": out["rgb"], "depth": out["depth"],
                    "opacity": out["opacity"],
                }

            self._render_jit = render_chunk
        return self._render_jit

    def render_batched(
        self, params, occ_bool, rays_o: np.ndarray, rays_d: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Render arbitrarily many rays through the fixed-size jitted chunk
        (reference: training/trainer_base.py:183-224)."""
        fn = self._render_chunk_fn()
        B = self.cfg.evaluation.batch_size
        n = rays_o.shape[0]
        outs = {"rgb": [], "depth": [], "opacity": []}
        for i in range(0, n, B):
            o = np.asarray(rays_o[i : i + B], np.float32)
            d = np.asarray(rays_d[i : i + B], np.float32)
            pad = B - o.shape[0]
            if pad:
                o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
                d = np.concatenate(
                    [d, np.tile(np.array([[0, 0, 1]], np.float32), (pad, 1))]
                )
            res = fn(params, occ_bool, jnp.asarray(o), jnp.asarray(d))
            for k in outs:
                v = np.asarray(res[k])
                outs[k].append(v[: v.shape[0] - pad] if pad else v)
        return {k: np.concatenate(v) for k, v in outs.items()}

    # ----------------------------------------------------------- color eval
    def evaluate_color(
        self,
        params,
        occ_bool,
        img_idxs: np.ndarray,
        save_dir: Optional[str] = None,
    ) -> Dict[str, float]:
        """Full-image renders -> PSNR/SSIM; with ``save_dir``, also writes
        per-image ``rgb_###.png`` / ``rgb_gt_###.png`` / ``depth_###.png``
        (reference: training/trainer.py:304-372, image export :358-370 with
        the depth colormap of modules/utils.py:223-228)."""
        ds = self.dataset
        if self.img_wh is None:
            raise ValueError("Evaluator needs img_wh for color evaluation")
        W, H = self.img_wh
        rgbs, gts, depths = [], [], []
        for i in np.asarray(img_idxs, int):
            cam = int(np.asarray(ds.cam_idx[i]))
            dirs_cam = np.asarray(ds.directions[cam])  # (H*W, 3)
            pose = np.asarray(ds.poses[i])  # (3, 4)
            rays_d = dirs_cam @ pose[:3, :3].T
            rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
            out = self.render_batched(params, occ_bool, rays_o, rays_d)
            rgbs.append(out["rgb"].reshape(H, W, 3))
            gts.append(np.asarray(ds.rgbs[i]).reshape(H, W, 3))
            depths.append(out["depth"].reshape(H, W))
        rgbs, gts = np.stack(rgbs), np.stack(gts)
        depths = np.stack(depths)
        if save_dir:
            self.save_render_images(
                save_dir, np.asarray(img_idxs, int), rgbs, gts, depths
            )
        return {
            "psnr": M.psnr(rgbs, gts),
            "ssim": M.ssim(rgbs, gts),
            "imgs": rgbs,
            "imgs_gt": gts,
            "depths": depths,
        }

    @staticmethod
    def save_render_images(save_dir, img_idxs, rgbs, gts, depths):
        """Write rendered/GT rgb + colormapped depth pngs per test image
        (reference: training/trainer.py:358-370; colormap analogue of
        modules/utils.py:223-228 depth2img)."""
        import matplotlib
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        d_max = float(np.nanmax(depths)) if np.isfinite(depths).any() else 1.0
        d_max = d_max if d_max > 0 else 1.0
        for j, i in enumerate(img_idxs):
            Image.fromarray(
                (np.clip(rgbs[j], 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(save_dir, f"rgb_{i:03d}.png"))
            Image.fromarray(
                (np.clip(gts[j], 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(save_dir, f"rgb_gt_{i:03d}.png"))
            dn = np.clip(depths[j] / d_max, 0.0, 1.0)
            cmap = matplotlib.colormaps["turbo"]
            dimg = (cmap(dn)[..., :3] * 255).astype(np.uint8)
            Image.fromarray(dimg).save(
                os.path.join(save_dir, f"depth_{i:03d}.png")
            )

    # --------------------------------------------------------- density slice
    def density_slice(
        self,
        params,
        res_map: int,
        height_w: float,
        num_avg_heights: int = 1,
        tolerance_w: float = 0.0,
        threshold: float = 10.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Horizontal density-map slice + its thresholded binarization
        (reference: training/trainer_base.py:92-140 ``interfereDensityMap``).

        Probes ``model.density`` on an L x L x A cube-coordinate grid around
        the world height ``height_w`` (+- ``tolerance_w``), max-reduces over
        the A heights, and thresholds.

        Returns:
            (density_map (L, L), density_map_thr (L, L)) numpy arrays.
        """
        from virus_nerf_tpu.evaluation.geometry import create_scan_pos

        height_c = float(
            self.scene.w2c(np.array([[0.0, 0.0, height_w]]))[0, 2]
        )
        tol_c = float(self.scene.w2c(tolerance_w, only_scale=True))
        pos = create_scan_pos(
            res_map=res_map,
            height_c=height_c,
            num_avg_heights=num_avg_heights,
            tolerance_c=tol_c,
        )  # (L*L*A, 3)

        density_fn = self._density_fn()
        B = self.cfg.evaluation.batch_size
        out = []
        for i in range(0, pos.shape[0], B):
            chunk = pos[i : i + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            d = np.asarray(density_fn(params, jnp.asarray(chunk)))
            out.append(d[: d.shape[0] - pad] if pad else d)
        density = np.concatenate(out).reshape(res_map, res_map, num_avg_heights)
        density_map = np.nanmax(density, axis=2)
        return density_map, (density_map >= threshold).astype(np.float32)

    # -------------------------------------------------------- robot pose/FoV
    def get_robot_pose_2d(
        self, img_idxs: np.ndarray
    ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        """Per-camera-stack 2-D robot pose in world coordinates
        (reference: datasets/dataset_ethz.py:195-259 ``getRobotPose2D``).

        For every query image, the time-synchronous image of each OTHER
        stack supplies that stack's pose: position is the camera origin,
        orientation the world XY angle of the central pixel's viewing ray.

        Returns:
            pos: {camera_name: (N, 2) world XY}, orientation: {name: (N,)}.
        """
        from virus_nerf_tpu.data.dataset import get_sync_idxs

        if self.img_wh is None:
            raise ValueError("get_robot_pose_2d needs img_wh")
        W, H = self.img_wh
        center = (H // 2) * W + W // 2  # reference: 0.5*W*(H+1)

        ds = self.dataset
        img_idxs = np.asarray(img_idxs, int)
        sync = get_sync_idxs(ds, img_idxs)  # (N, n_stacks)
        stacks = np.unique(np.asarray(ds.sensor_ids))
        poses = np.asarray(ds.poses)
        cam_idx = np.asarray(ds.cam_idx, int)
        dirs = np.asarray(ds.directions)

        pos: Dict[str, np.ndarray] = {}
        orientation: Dict[str, np.ndarray] = {}
        for j, s in enumerate(stacks):
            ii = sync[:, j]
            p = poses[ii]  # (N, 3, 4)
            d_cam = dirs[cam_idx[ii], center]  # (N, 3)
            d_w = np.einsum("nij,nj->ni", p[:, :3, :3], d_cam)
            o_w = self.scene.c2w(p[:, :3, 3])
            name = f"CAM{int(s)}"
            pos[name] = o_w[:, :2]
            orientation[name] = np.arctan2(d_w[:, 1], d_w[:, 0])
        return pos, orientation

    def get_field_of_view(self, img_idxs: np.ndarray):
        """Per-image angular FoV ranges of every sensor
        (reference: datasets/dataset_ethz.py:261-307 ``getFieldOfView``):
        camera orientation ± half the sensor's horizontal angle of view;
        NeRF scans are full 360°.

        Returns:
            fov: {sensor: {camera: (N, 2) [min, max] angles}},
            pos: {camera: (N, 2)}, orientation: {camera: (N,)}.
        """
        pos, orientation = self.get_robot_pose_2d(img_idxs)
        n = np.asarray(img_idxs).shape[0]
        half = {
            "USS": 0.5 * np.deg2rad(self.cfg.uss.angle_of_view[0]),
            "ToF": 0.5 * np.deg2rad(self.cfg.tof.angle_of_view[0]),
            "RGBD": 0.5 * np.deg2rad(self.cfg.rgbd.angle_of_view[0]),
        }
        fov = {
            sensor: {
                name: orientation[name][:, None] + np.array([-h, h])
                for name in orientation
            }
            for sensor, h in half.items()
        }
        first = next(iter(orientation))
        fov["NeRF"] = {first: np.tile([-np.pi, np.pi], (n, 1))}
        # normalize angles to [-pi, pi] (reference quirk: single wrap)
        for sensor in fov:
            for cam in fov[sensor]:
                a = fov[sensor][cam]
                a[a > np.pi] -= 2 * np.pi
                a[a < -np.pi] += 2 * np.pi
        return fov, pos, orientation

    # ----------------------------------------------------------- depth data
    def _scan_origins(self, img_idxs: np.ndarray) -> np.ndarray:
        """Per-image scan origin = camera position (cube coords)."""
        return np.asarray(self.dataset.poses)[img_idxs, :3, 3]

    def _get_gt_data(self, img_idxs: np.ndarray):
        """GT 360-degree scan by ray-casting the GT slice raster
        (reference: training/trainer.py:534-571)."""
        ev = self.cfg.evaluation
        rays_o_c = self._scan_origins(img_idxs)
        rays_o, rays_d = create_scan_rays(rays_o_c, ev.res_angular)
        _, depths_c, _ = self.scene.get_slice_scan(
            res=ev.res_map, rays_o=rays_o, rays_d=rays_d,
            height_tolerance=ev.height_tolerance, rays_o_in_world_coord=False,
        )
        rays_o_w = self.scene.c2w(rays_o)
        depths_w = self.scene.c2w(depths_c, only_scale=True)
        return rays_o_w, rays_d, depths_w

    def _get_nerf_data(self, params, occ_bool, img_idxs: np.ndarray):
        """NeRF 360-degree depth scan (reference: training/trainer.py:573-629)."""
        ev = self.cfg.evaluation
        rays_o_c = self._scan_origins(img_idxs)
        rays_o, rays_d = create_scan_rays(rays_o_c, ev.res_angular)
        out = self.render_batched(params, occ_bool, rays_o, rays_d)
        rays_o_w = self.scene.c2w(rays_o)
        depths_w = self.scene.c2w(out["depth"], only_scale=True)
        return rays_o_w, rays_d, depths_w

    def _get_sensor_data(self, img_idxs: np.ndarray, sensor: str):
        """Measured USS/ToF/RGBD depths within the height band, NaN-packed to
        a common per-image width (reference: training/trainer.py:681-762)."""
        ds = self.dataset
        ev = self.cfg.evaluation
        if sensor == "USS":
            pix = np.asarray(ds.uss_mask_idx, int)
        elif sensor == "ToF":
            pix = np.asarray(ds.tof_mask_idx, int)
        else:
            pix = np.arange(ds.n_pixels)
        N = img_idxs.shape[0]
        k = pix.shape[0]

        poses = np.asarray(ds.poses)[img_idxs]  # (N, 3, 4)
        cams = np.asarray(ds.cam_idx)[img_idxs]
        dirs_all = np.asarray(ds.directions)  # (n_cams, H*W, 3)
        depth_all = np.asarray(ds.depths[sensor])  # (n_imgs, H*W)

        rays_d = np.einsum(
            "nij,nkj->nki", poses[:, :3, :3], dirs_all[cams][:, pix]
        )  # (N, k, 3)
        rays_o = np.broadcast_to(poses[:, None, :3, 3], rays_d.shape).copy()
        depths_c = depth_all[img_idxs][:, pix]  # (N, k)

        rays_o_w = self.scene.c2w(rays_o.reshape(-1, 3)).reshape(N, k, 3)
        depths_w = self.scene.c2w(depths_c, only_scale=True)

        # height-band filter (training/trainer.py:731-735)
        dz = depths_w * rays_d[:, :, 2]
        mask = (
            (dz >= -ev.height_tolerance)
            & (dz <= ev.height_tolerance)
            & ~np.isnan(depths_w)
        )  # (N, k)

        K = int(max(mask.sum(axis=1).max(), 1))
        rays_o_p = np.full((N, K, 3), np.nan)
        rays_d_p = np.full((N, K, 3), np.nan)
        depths_p = np.full((N, K), np.nan)
        for i in range(N):
            m = mask[i]
            c = int(m.sum())
            rays_o_p[i, :c] = rays_o_w[i, m]
            rays_d_p[i, :c] = rays_d[i, m]
            depths_p[i, :c] = depths_w[i, m]
        return (
            rays_o_p.reshape(-1, 3),
            rays_d_p.reshape(-1, 3),
            depths_p.reshape(-1),
        )

    @staticmethod
    def pack_lidar_scans(
        xyzs,
        poses_w: np.ndarray,
        scan_heights: np.ndarray,
        height_tolerance: float,
    ):
        """Per-image LiDAR clouds -> NaN-packed (rays_o, rays_d, depths)
        within the scan height band (reference: training/trainer.py:631-679).

        Args:
            xyzs: list of N (M_i, 3) world clouds (e.g. from
                ``data.ethz.load_lidar_maps``).
            poses_w: (N, 3, 4) LiDAR poses in world coordinates.
            scan_heights: (N,) world z of the camera scan plane.
        """
        N = len(xyzs)
        sliced = []
        K = 1
        for i, xyz in enumerate(xyzs):
            lo = scan_heights[i] - height_tolerance
            hi = scan_heights[i] + height_tolerance
            sel = xyz[(xyz[:, 2] >= lo) & (xyz[:, 2] <= hi)]
            sliced.append(sel)
            K = max(K, sel.shape[0])
        rays_o = np.full((N, K, 3), np.nan)
        rays_d = np.full((N, K, 3), np.nan)
        depths = np.full((N, K), np.nan)
        for i, sel in enumerate(sliced):
            k = sel.shape[0]
            if k == 0:
                continue
            origin = poses_w[i, :3, 3]
            scan_o = np.array([origin[0], origin[1], scan_heights[i]])
            diff = sel - origin
            dist = np.linalg.norm(diff, axis=1)
            rays_o[i, :k] = scan_o
            rays_d[i, :k] = diff / dist[:, None]
            depths[i, :k] = dist
        return (
            rays_o.reshape(-1, 3),
            rays_d.reshape(-1, 3),
            depths.reshape(-1),
        )

    # ----------------------------------------------------------- depth eval
    def evaluate_depth(
        self,
        params,
        occ_bool,
        img_idxs: np.ndarray,
        sensors: Iterable[str] = ("GT", "NeRF"),
        fov: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
        robot_pos: Optional[Dict[str, np.ndarray]] = None,
        extra_sensor_data: Optional[Dict[str, tuple]] = None,
    ):
        """Depth evaluation over sensors (reference: training/trainer.py:374-490).

        Args:
            img_idxs: (N,) test image indices.
            sensors: subset of {GT, NeRF, USS, ToF, RGBD}; GT is mandatory and
                evaluated first.
            fov: sensor -> {camera: (N, 2) angular ranges}.  By default the
                per-image robot FoV is computed from the poses
                (``get_field_of_view``) so the ``nn``/``nn_inv`` directions
                compare against FoV-limited GT as in the reference
                (training/trainer.py:401-434); pass ``fov={}`` to disable.
        Returns:
            (metrics_dict, data_dict) keyed by sensor.
        """
        img_idxs = np.asarray(img_idxs, int)
        N = img_idxs.shape[0]
        ev = self.cfg.evaluation
        zones = {k: tuple(v) for k, v in ev.zones.items()}

        if fov is None and self.img_wh is not None:
            fov, fov_robot_pos, _ = self.get_field_of_view(img_idxs)
            if robot_pos is None:
                robot_pos = fov_robot_pos

        metrics_dict: Dict[str, dict] = {}
        data_dict: Dict[str, dict] = {}

        sensors = list(sensors)
        if "GT" not in sensors:
            sensors = ["GT"] + sensors
        sensors = ["GT"] + [s for s in sensors if s != "GT"]

        for sensor in sensors:
            if sensor == "GT":
                rays_o, rays_d, depths = self._get_gt_data(img_idxs)
            elif sensor == "NeRF":
                rays_o, rays_d, depths = self._get_nerf_data(
                    params, occ_bool, img_idxs
                )
            elif extra_sensor_data is not None and sensor in extra_sensor_data:
                # precomputed (rays_o, rays_d, depths) in world coords —
                # e.g. LiDAR scans packed with pack_lidar_scans
                rays_o, rays_d, depths = extra_sensor_data[sensor]
            else:
                rays_o, rays_d, depths = self._get_sensor_data(
                    img_idxs, sensor
                )

            pos, pos_o, dists = self.scene.depth2pos(rays_o, rays_d, depths)

            if sensor == "GT":
                data_dict["GT"] = {
                    "pos": pos, "pos_o": pos_o, "depths": dists,
                    "rays_o": rays_o,
                }
                continue

            if fov is not None and sensor in fov and robot_pos is not None:
                pos_gt, pos_o_gt = limit_fov(
                    data_dict["GT"]["pos"], data_dict["GT"]["pos_o"],
                    fov[sensor], N, robot_pos,
                )
            else:
                pos_gt = data_dict["GT"]["pos"]
                pos_o_gt = data_dict["GT"]["pos_o"]

            res = {}
            for suffix, (p, p_ref, ref_is_gt) in {
                "": (pos, pos_gt, True),
                "_inv": (pos_gt, pos, False),
                "_inv_360": (data_dict["GT"]["pos"], pos, False),
            }.items():
                nn_dists, mean, median, inlier, too_close = M.nn_metrics(
                    p, p_ref, dists, data_dict["GT"]["depths"], N,
                    ref_pos_is_gt=ref_is_gt, zones=zones,
                    inlier_threshold=ev.inlier_threshold,
                )
                res[f"nn_dists{suffix}"] = nn_dists
                res[f"nn_mean{suffix}"] = mean
                res[f"nn_median{suffix}"] = median
                res[f"nn_inlier{suffix}"] = inlier
                res[f"nn_outlier_too_close{suffix}"] = too_close

            data_dict[sensor] = {
                "pos": pos, "pos_o": pos_o, "depths": dists,
                "pos_gt": pos_gt, "pos_o_gt": pos_o_gt,
            }
            metrics_dict[sensor] = res

        return metrics_dict, data_dict

    # -------------------------------------------------------------- summary
    def evaluate(
        self,
        params,
        occ_bool,
        color_img_idxs: Optional[np.ndarray] = None,
        depth_img_idxs: Optional[np.ndarray] = None,
        sensors: Optional[Iterable[str]] = None,
        save_dir: Optional[str] = None,
        plot: bool = False,
    ) -> Dict[str, dict]:
        """Full evaluation + optional metrics.csv and, with ``plot``, the
        per-image scan-map/NND-histogram plots and the 9-panel NND summary
        (reference: training/trainer.py:167-224,868-906 +
        trainer_plot.py:156-394)."""
        ds = self.dataset
        ev = self.cfg.evaluation
        n = ds.n_images
        if color_img_idxs is None:
            k = ev.num_color_pts if isinstance(ev.num_color_pts, int) else n
            color_img_idxs = np.linspace(0, n - 1, min(k, n)).astype(int)
        if depth_img_idxs is None:
            k = ev.num_depth_pts if isinstance(ev.num_depth_pts, int) else n
            depth_img_idxs = np.linspace(0, n - 1, min(k, n)).astype(int)
        if sensors is None:
            sensors = [
                s for s in ev.sensors
                if s in ("GT", "NeRF") or s in ds.depths
            ]

        if len(np.atleast_1d(color_img_idxs)) == 0:
            # num_color_pts=0: skip color entirely — the reference's PSO
            # protocol disables color eval this way
            # (reference: run_optimization.py:32).
            color = {"psnr": float("nan"), "ssim": float("nan")}
        else:
            color = self.evaluate_color(
                params, occ_bool, color_img_idxs,
                save_dir=os.path.join(save_dir, "renders") if save_dir else None,
            )
        metrics_dict, data_dict = self.evaluate_depth(
            params, occ_bool, depth_img_idxs, sensors
        )
        for key in metrics_dict:
            metrics_dict[key]["psnr"] = color["psnr"]
            metrics_dict[key]["ssim"] = color["ssim"]

        if save_dir:
            self.save_metrics_csv(
                metrics_dict, os.path.join(save_dir, "metrics.csv")
            )
            if plot:
                from virus_nerf_tpu.evaluation.plots import (
                    plot_maps_per_image,
                    plot_nnd_summary,
                )

                robot = None
                if self.img_wh is not None:
                    pos, orientation = self.get_robot_pose_2d(depth_img_idxs)
                    robot = {"pos": pos, "orientation": orientation}
                plot_maps_per_image(
                    self.scene, data_dict, metrics_dict,
                    sensors=list(metrics_dict.keys()),
                    num_points=len(np.asarray(depth_img_idxs)),
                    res_map=ev.res_map,
                    height_tolerance=ev.height_tolerance,
                    save_dir=os.path.join(save_dir, "maps"),
                    num_plot_pts=int(ev.num_plot_pts),
                    robot=robot,
                )
                plot_nnd_summary(
                    metrics_dict,
                    zones=tuple(ev.zones.keys()),
                    path=os.path.join(save_dir, "metrics.png"),
                    zone_ranges=ev.zones,
                )
        return metrics_dict

    def export_nerf_pointcloud(
        self,
        params,
        occ_bool,
        rays_o_w: np.ndarray,
        save_path: str,
        num_heights: int = 2,
        height_range: float = 0.3,
        min_opacity: float = 0.5,
    ) -> np.ndarray:
        """Render 360-degree scans at multiple heights and export the hit
        points as a PCD point cloud (reference: training/trainer.py:908-1003).

        Args:
            rays_o_w: (N, 3) world scan origins; z is replaced by
                ``num_heights`` values spanning +-height_range.
        Returns:
            the (M, 3) world point cloud that was written.
        """
        from virus_nerf_tpu.data.pcl import save_pcd

        ev = self.cfg.evaluation
        o = np.tile(
            np.asarray(rays_o_w, np.float64)[:, None, :], (1, num_heights, 1)
        )
        o[:, :, 2] = np.linspace(-height_range, height_range, num_heights)
        o = self.scene.w2c(o.reshape(-1, 3))
        rays_o, rays_d = create_scan_rays(o, ev.res_angular)
        out = self.render_batched(params, occ_bool, rays_o, rays_d)
        depths_w = self.scene.c2w(out["depth"], only_scale=True)
        rays_o_world = self.scene.c2w(rays_o)
        pts = rays_o_world + rays_d * depths_w[:, None]
        pts = pts[out["opacity"] > min_opacity]
        save_pcd(save_path, pts.astype(np.float32))
        return pts

    @staticmethod
    def save_metrics_csv(metrics_dict: Dict[str, dict], path: str):
        """metrics.csv parity (reference: training/trainer.py:888-905)."""
        import csv

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        sensors = list(metrics_dict.keys())
        cols = [
            k for k in (metrics_dict[sensors[0]].keys() if sensors else [])
            if not k.startswith("nn_dists")
        ]
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([""] + cols)
            for s in sensors:
                w.writerow(
                    [s] + [metrics_dict[s].get(c, "") for c in cols]
                )
