"""Data layer tests: scene transforms, sensor models, batch sampling,
synthetic dataset geometric consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.data import (
    Scene,
    ToFModel,
    USSModel,
    make_synthetic_dataset,
    sample_batch,
)
from virus_nerf_tpu.data.rays import get_ray_directions, get_rays


def test_scene_transforms_roundtrip(rng):
    pts = rng.random((100, 3)) * 10 - 5
    scene = Scene(point_cloud=pts)
    c = scene.w2c(pts)
    # margin-enlarged: everything inside the cube
    assert np.all(np.abs(c) <= 0.5)
    back = scene.c2w(c)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # scalar only_scale
    s = scene.w2c(1.0, only_scale=True)
    np.testing.assert_allclose(scene.c2w(s, only_scale=True), 1.0)
    # idx roundtrips
    idx = scene.c2idx(c[:, :2], 128)
    assert idx.min() >= 0 and idx.max() <= 127
    c2 = scene.idx2c(idx, 128)
    assert np.max(np.abs(c2 - c[:, :2])) < 1.0 / 127


def test_slice_map_and_scan():
    # square "room" walls as a synthetic point cloud at z=0
    t = np.linspace(-1, 1, 2000)
    walls = np.concatenate(
        [
            np.stack([t, np.ones_like(t)], 1),
            np.stack([t, -np.ones_like(t)], 1),
            np.stack([np.ones_like(t), t], 1),
            np.stack([-np.ones_like(t), t], 1),
        ]
    )
    pts = np.concatenate([walls, np.zeros((walls.shape[0], 1))], 1)
    scene = Scene(point_cloud=pts)
    m = scene.get_slice_map(0.0, 128, height_tolerance=0.1)
    assert m.sum() > 100  # walls rasterized

    scan_map, scan_depth, angles = scene.get_slice_scan(
        128, rays_o=np.zeros((64, 3)), height_tolerance=0.1
    )
    # from the center, wall distance in cube units: wall at 1m,
    # scale = 2*1.05/1 -> 1m = 1/2.1 cube
    valid = ~np.isnan(scan_depth)
    assert valid.mean() > 0.9
    d_axis = scan_depth[np.argmin(np.abs(angles))]  # ray along +x
    np.testing.assert_allclose(d_axis, 1.0 / 2.1, atol=0.03)


def test_uss_model(rng):
    img_wh = (64, 40)
    uss = USSModel(img_wh, (90.0, 65.0))
    assert uss.mask.sum() > 0
    depth = rng.random((3, 64 * 40)) + 0.5
    out = uss.convert_depth(depth)
    for i in range(3):
        d_min = depth[i, uss.mask].min()
        vals = out[i, uss.mask]
        np.testing.assert_allclose(vals, d_min)
        assert np.all(np.isnan(out[i, ~uss.mask]))


def test_tof_model(rng):
    img_wh = (64, 40)
    tof = ToFModel(img_wh, (90.0, 65.0))
    assert tof.mask.sum() == 64  # 8x8 lattice
    depth = rng.random((2, 64 * 40)) + 0.5
    out = tof.convert_depth(depth)
    # lattice pixels carry the depth of the same pixel (no calib error)
    np.testing.assert_allclose(out[0, tof.mask], depth[0, tof.mask])
    assert np.all(np.isnan(out[0, ~tof.mask]))
    # calibration error shifts the sensed pixels
    tof_err = ToFModel(img_wh, (90.0, 65.0), sensor_calibration_error=10.0)
    out_err = tof_err.convert_depth(depth)
    assert not np.allclose(
        out_err[0, tof_err.mask], depth[0, tof_err.mask], equal_nan=True
    )
    # dilation enlarges the footprint
    tof_dil = ToFModel(img_wh, (90.0, 65.0), tof_pix_size=3)
    out_dil = tof_dil.convert_depth(depth)
    assert (~np.isnan(out_dil[0])).sum() > (~np.isnan(out[0])).sum()


def test_ray_directions_and_rays():
    K = np.array([[32.0, 0, 32], [0, 32.0, 20], [0, 0, 1]])
    dirs = get_ray_directions(40, 64, K)
    assert dirs.shape == (40 * 64, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, rtol=1e-5)
    c2w = np.tile(np.eye(3, 4), (dirs.shape[0], 1, 1))
    o, d = get_rays(dirs, c2w)
    np.testing.assert_allclose(d, dirs, atol=1e-7)
    np.testing.assert_allclose(o, 0.0)


def test_synthetic_dataset_consistency():
    dataset, scene, info = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    assert dataset.n_images == 8
    # dense RGBD depth matches USS min over its mask
    uss_mask = np.asarray(dataset.uss_mask_idx)
    rgbd = np.asarray(dataset.depths["RGBD"])
    uss = np.asarray(dataset.depths["USS"])
    for i in range(8):
        np.testing.assert_allclose(
            uss[i, uss_mask[0]], np.nanmin(rgbd[i, uss_mask]), rtol=1e-5
        )
    # geometric consistency: o + d * depth must land on room/box surfaces
    key = jax.random.PRNGKey(0)
    batch = sample_batch(
        dataset, key, 256, {"imgs": "all", "pixs": "random"}
    )
    o = np.asarray(batch.rays_o)
    d = np.asarray(batch.rays_d)
    depth = np.asarray(batch.depths["RGBD"])
    pts_c = o + d * depth[:, None]
    pts_w = scene.c2w(pts_c)
    room_min, room_max = info["boxes"].min(), None
    # every endpoint on a surface: either on a room wall or on a box face
    on_wall = np.any(
        np.abs(np.abs(pts_w) - np.array([3.0, 3.0, 1.5])) < 1e-3, axis=1
    )
    boxes = info["boxes"]
    on_box = np.zeros(len(pts_w), bool)
    for b in range(boxes.shape[0]):
        inside = np.all(
            (pts_w >= boxes[b, 0] - 1e-3) & (pts_w <= boxes[b, 1] + 1e-3), axis=1
        )
        on_box |= inside
    assert np.mean(on_wall | on_box) > 0.99


def test_sample_batch_strategies():
    dataset, scene, info = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    key = jax.random.PRNGKey(1)

    b = sample_batch(
        dataset, key, 100,
        {"imgs": "all", "pixs": {"valid_uss": 0.4, "valid_tof": 0.4}},
    )
    assert b.rays_o.shape == (100, 3)
    # first 40 pixels in USS mask, next 40 on ToF lattice, rest random
    uss_set = set(np.asarray(dataset.uss_mask_idx).tolist())
    tof_set = set(np.asarray(dataset.tof_mask_idx).tolist())
    pix = np.asarray(b.pix_idxs)
    assert all(p in uss_set for p in pix[:40])
    assert all(p in tof_set for p in pix[40:80])
    # USS depths valid on USS-mask pixels
    assert not np.any(np.isnan(np.asarray(b.depths["USS"])[:40]))
    assert not np.any(np.isnan(np.asarray(b.depths["ToF"])[40:80]))

    # 'same' strategy: single image
    b2 = sample_batch(dataset, key, 50, {"imgs": "same", "pixs": "random"})
    assert len(np.unique(np.asarray(b2.img_idxs))) == 1

    # real-time simulation: only images before elapse_time
    b3 = sample_batch(
        dataset, key, 50, {"imgs": "all", "pixs": "random"},
        elapse_time=jnp.float32(5.0),
    )
    times = np.asarray(b3.times)
    assert np.all(times <= 5.0)

    # rays normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b.rays_d), axis=1), 1.0, rtol=1e-5
    )
