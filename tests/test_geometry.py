"""Golden tests: geometry vs independent torch/numpy implementations of the
reference math (ref: lib/utils/cameras.py, lib/utils/transforms.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from selfpose3d_tpu.geometry import (
    CameraParams,
    project_points,
    project_points_with_trans,
    world_to_camera_frame,
    camera_to_world_frame,
    get_affine_transform,
    get_affine_transform_3x3,
    affine_transform_points,
    get_scale,
    rotate_points,
)


def _look_at_rotation(cam_pos, target=np.zeros(3)):
    """World->camera rotation with +z looking from cam_pos toward target."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def make_camera(rs, n=()):
    """Plausible panoptic-like cameras on a ring, looking at the origin."""
    size = int(np.prod(n)) if n else 1
    Rs, Ts = [], []
    for i in range(size):
        ang = 2 * np.pi * i / size + rs.uniform(-0.2, 0.2)
        pos = np.array(
            [5000 * np.cos(ang), 5000 * np.sin(ang), 1500 + rs.uniform(-300, 300)]
        )
        Rs.append(_look_at_rotation(pos))
        Ts.append(pos.reshape(3, 1))
    R = np.stack(Rs).reshape(*n, 3, 3) if n else Rs[0]
    T = np.stack(Ts).reshape(*n, 3, 1) if n else Ts[0]

    def r(*shape):
        return np.asarray(rs.randn(*n, *shape), dtype=np.float64)

    return {
        "R": R,
        "T": T,
        "fx": np.abs(r()) * 100 + 1400,
        "fy": np.abs(r()) * 100 + 1400,
        "cx": r() * 10 + 960,
        "cy": r() * 10 + 540,
        "k": r(3, 1) * np.array([[0.1], [0.01], [0.001]]),
        "p": r(2, 1) * 0.001,
    }


def torch_project_point_radial(x, R, T, f, c, k, p):
    """Independent numpy transcription of the reference projection math
    (ref: lib/utils/cameras.py:27-55) used as the golden oracle."""
    n = x.shape[0]
    xcam = R @ (x.T - T)
    y = xcam[:2] / (xcam[2] + 1e-5)
    r2 = np.clip(np.sum(y ** 2, axis=0, keepdims=True), None, 1e10)
    r2exp = np.concatenate([r2, r2 ** 2, r2 ** 3], axis=0)
    radial = 1 + np.einsum("ij,ij->j", np.tile(k, (1, n)), r2exp)
    tan = p[0] * y[1] + p[1] * y[0]
    corr = np.tile(radial + 2 * tan, (2, 1))
    y = y * corr + np.outer(np.concatenate([p[1], p[0]]), r2.ravel())
    ypixel = f * y + c
    return ypixel.T


class TestProjection:
    def test_matches_reference_math(self, rng):
        cam_d = make_camera(rng)
        x = rng.randn(100, 3) * np.array([1500.0, 1500.0, 400.0]) + np.array(
            [0.0, 0.0, 900.0]
        )

        f = np.array([[cam_d["fx"]], [cam_d["fy"]]])
        c = np.array([[cam_d["cx"]], [cam_d["cy"]]])
        expected = torch_project_point_radial(
            x, cam_d["R"], cam_d["T"], f, c, cam_d["k"], cam_d["p"]
        )

        cam = CameraParams.from_dict(cam_d)
        got = project_points(jnp.asarray(x, jnp.float32), cam)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=0.5)

    def test_batched_views(self, rng):
        cam_d = make_camera(rng, n=(2, 5))  # (B, V) batch of cameras
        cam = CameraParams.from_dict(cam_d)
        x = (rng.randn(2, 5, 50, 3) * 800.0).astype(np.float32)
        got = project_points(jnp.asarray(x), cam)
        assert got.shape == (2, 5, 50, 2)
        # spot check one (b, v) against the scalar path
        b, v = 1, 3
        single = {kk: np.asarray(vv)[b, v] for kk, vv in cam_d.items()}
        exp = project_points(
            jnp.asarray(x[b, v]), CameraParams.from_dict(single)
        )
        np.testing.assert_allclose(np.asarray(got[b, v]), np.asarray(exp), rtol=1e-5)

    def test_project_with_trans(self, rng):
        cam_d = make_camera(rng)
        cam = CameraParams.from_dict(cam_d)
        x = (rng.randn(7, 3) * 600.0).astype(np.float32)
        trans = np.eye(3, dtype=np.float32)
        trans[0, 0], trans[0, 2] = 0.5, 10.0
        base = np.asarray(project_points(jnp.asarray(x), cam))
        got = np.asarray(
            project_points_with_trans(jnp.asarray(x), cam, jnp.asarray(trans))
        )
        np.testing.assert_allclose(got[:, 0], base[:, 0] * 0.5 + 10.0, rtol=1e-5)
        np.testing.assert_allclose(got[:, 1], base[:, 1], rtol=1e-5)

    def test_world_camera_roundtrip(self, rng):
        cam_d = make_camera(rng)
        R = jnp.asarray(cam_d["R"], jnp.float32)
        T = jnp.asarray(cam_d["T"], jnp.float32)
        x = jnp.asarray(rng.randn(20, 3).astype(np.float32) * 100)
        xc = world_to_camera_frame(x, R, T)
        xw = camera_to_world_frame(xc, R, T)
        np.testing.assert_allclose(np.asarray(xw), np.asarray(x), atol=1e-2)


class TestAffine:
    def test_matches_cv2_construction(self, rng):
        try:
            import cv2
        except ImportError:
            pytest.skip("cv2 unavailable")
        for _ in range(5):
            center = rng.rand(2) * 1000
            scale = rng.rand(2) * 5 + 1
            rot = float(rng.uniform(-45, 45))
            out_size = (960, 512)
            ours = get_affine_transform(center, scale, rot, out_size)

            # independent construction using the same src/dst points via cv2
            from selfpose3d_tpu.geometry.transforms import (
                _get_dir,
                _get_3rd_point,
            )

            scale_tmp = scale * 200.0
            rot_rad = np.pi * rot / 180
            if scale_tmp[0] >= scale_tmp[1]:
                src_dir = _get_dir([0, scale_tmp[0] * -0.5], rot_rad)
                dst_dir = np.array([0, out_size[0] * -0.5])
            else:
                src_dir = _get_dir([scale_tmp[1] * -0.5, 0], rot_rad)
                dst_dir = np.array([out_size[1] * -0.5, 0])
            src = np.zeros((3, 2), np.float32)
            dst = np.zeros((3, 2), np.float32)
            src[0], src[1] = center, center + src_dir
            dst[0] = [out_size[0] * 0.5, out_size[1] * 0.5]
            dst[1] = dst[0] + dst_dir
            src[2] = _get_3rd_point(src[0].astype(np.float64), src[1].astype(np.float64))
            dst[2] = _get_3rd_point(dst[0].astype(np.float64), dst[1].astype(np.float64))
            expected = cv2.getAffineTransform(np.float32(src), np.float32(dst))
            np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)

    def test_inverse(self, rng):
        center = np.array([960.0, 540.0])
        scale = get_scale((1920, 1080), (960, 512))
        M = get_affine_transform_3x3(center, scale, 0.0, (960, 512))
        Minv = get_affine_transform_3x3(center, scale, 0.0, (960, 512), inv=1)
        np.testing.assert_allclose(M @ Minv, np.eye(3), atol=1e-6)

    def test_affine_points_device(self, rng):
        M = get_affine_transform_3x3(
            np.array([960.0, 540.0]), get_scale((1920, 1080), (960, 512)), 0.0, (960, 512)
        )
        pts = rng.rand(10, 2).astype(np.float32) * 1000
        got = np.asarray(affine_transform_points(jnp.asarray(pts), jnp.asarray(M)))
        exp = (M[:2, :2] @ pts.T + M[:2, 2:3]).T
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_get_scale(self):
        s = get_scale((1920, 1080), (960, 512))
        # w/960 = 2.0 < h/512 = 2.109 -> pad width to the height-limited scale
        assert s[0] == pytest.approx(1080 / 512 * 960 / 200.0)
        assert s[1] == pytest.approx(1080 / 200.0)

    def test_rotate_points(self, rng):
        pts = rng.rand(5, 2) * 100
        center = np.array([50.0, 50.0])
        got = rotate_points(pts, center, 90.0)
        d_before = np.linalg.norm(pts - center, axis=1)
        d_after = np.linalg.norm(got - center, axis=1)
        np.testing.assert_allclose(d_before, d_after, rtol=1e-6)
