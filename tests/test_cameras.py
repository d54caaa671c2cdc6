"""Camera geometry: parity with the reference + geometric invariants."""

import numpy as np
import jax.numpy as jnp

from nerf_tpu.ops import cameras


def torch_t(x):
    import torch

    return torch.as_tensor(np.asarray(x))


class TestGenerateRays:
    def test_parity_with_reference(self, reference_nerf):
        ours = cameras.generate_rays(100, 120, 130.0)
        ref = reference_nerf.NeRF.generate_rays(100, 120, 130.0)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-7)

    def test_center_ray_points_forward(self):
        rays = np.asarray(cameras.generate_rays(101, 101, 50.0))
        np.testing.assert_allclose(rays[50, 50], [0.0, 0.0, -1.0], atol=1e-6)

    def test_opengl_convention(self):
        rays = np.asarray(cameras.generate_rays(11, 11, 10.0))
        assert rays[0, 5, 1] > 0  # top row looks up (+y)
        assert rays[5, 10, 0] > 0  # right column looks +x


class TestRotations:
    def test_spherical_parity(self, reference_nerf, rng):
        yaw = rng.uniform(-np.pi, np.pi, size=(16,)).astype(np.float32)
        el = rng.uniform(-1.5, 1.5, size=(16,)).astype(np.float32)
        ours = cameras.spherical_to_cartesian(jnp.asarray(yaw), jnp.asarray(el))
        ref = reference_nerf.NeRF.spherical_to_cartesian(
            torch_t(yaw), torch_t(el)
        )
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_rotation_matrix_parity(self, reference_nerf, rng):
        eye = rng.normal(size=(8, 3)).astype(np.float32)
        eye /= np.linalg.norm(eye, axis=-1, keepdims=True)
        up = rng.normal(size=(8, 3)).astype(np.float32)
        ours = cameras.get_rotation_matrix(jnp.asarray(eye), jnp.asarray(up))
        ref = reference_nerf.NeRF.get_rotation_matrix(torch_t(eye), torch_t(up))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_direction_to_rotation_is_orthonormal(self, rng):
        d = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(cameras.direction_to_rotation_matrix(jnp.asarray(d)))
        eye = np.eye(3, dtype=np.float32)
        np.testing.assert_allclose(
            np.matmul(np.swapaxes(R, -1, -2), R),
            np.broadcast_to(eye, R.shape), atol=1e-5,
        )
        # Camera -z axis maps to the (normalized) viewing direction.
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        fwd = np.einsum("bij,j->bi", R, np.array([0.0, 0.0, -1.0], np.float32))
        np.testing.assert_allclose(fwd, dn, atol=1e-5)

    def test_direction_to_rotation_degenerate_up(self):
        R = np.asarray(
            cameras.direction_to_rotation_matrix(jnp.asarray([[0.0, 0.0, 1.0]]))
        )
        assert np.all(np.isfinite(R))
        np.testing.assert_allclose(
            R[0].T @ R[0], np.eye(3), atol=1e-5
        )


class TestWorldTransform:
    def test_parity_with_reference(self, reference_nerf, rng):
        rays = rng.normal(size=(5, 7, 3)).astype(np.float32)
        cam_o = rng.normal(size=(5, 7, 3)).astype(np.float32)
        cam_r = rng.normal(size=(5, 7, 3, 3)).astype(np.float32)
        oo, od = cameras.rays_to_world_coordinates(
            jnp.asarray(rays), jnp.asarray(cam_o), jnp.asarray(cam_r)
        )
        ro, rd = reference_nerf.NeRF.rays_to_world_coordinates(
            torch_t(rays), torch_t(cam_o), torch_t(cam_r)
        )
        np.testing.assert_allclose(oo, ro.numpy(), rtol=1e-6)
        np.testing.assert_allclose(od, rd.numpy(), rtol=1e-5, atol=1e-6)

    def test_is_matrix_vector_product(self, rng):
        rays = rng.normal(size=(4, 3)).astype(np.float32)
        R = rng.normal(size=(4, 3, 3)).astype(np.float32)
        _, od = cameras.rays_to_world_coordinates(
            jnp.asarray(rays), jnp.zeros((4, 3)), jnp.asarray(R)
        )
        expect = np.einsum("bij,bj->bi", R, rays)
        np.testing.assert_allclose(od, expect, rtol=1e-5, atol=1e-6)


class TestNDC:
    def test_ndc_bounds(self):
        # Rays through a forward-facing frustum land in [-1, 1]^2 x [-1, 1].
        H, W, f = 60, 80, 70.0
        rays = cameras.generate_rays(H, W, f)
        cam_o = jnp.zeros((1, 3))
        cam_r = jnp.eye(3)[None]
        rays_o, rays_d = cameras.pose_to_rays(cam_o, cam_r, H, W, f)
        no, nd = cameras.ndc_rays(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), H, W, f, near=1.0
        )
        no, nd = np.asarray(no), np.asarray(nd)
        assert np.abs(no[:, :2]).max() <= 1.0 + 1e-4
        # Origin plane sits at z = -1 (near); t=1 reaches z = +1 (infinity).
        np.testing.assert_allclose(no[:, 2], -1.0, atol=1e-5)
        np.testing.assert_allclose((no + nd)[:, 2], 1.0, atol=1e-5)

    def test_pose_to_rays_shapes(self):
        o, d = cameras.pose_to_rays(
            jnp.zeros((2, 3)), jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
            10, 12, 20.0,
        )
        assert o.shape == (2, 10, 12, 3) and d.shape == (2, 10, 12, 3)
