"""Camera model and ray generation for the pivot-orbit portrait camera.

Reference contracts (training/volumetric_rendering.py):
  * `get_initial_rays_trig` (:77): screen-space NDC rays, y flipped, unit length,
    z = -1/tan(fov/2); z_vals linspace [ray_start, ray_end],
  * `sample_camera_positions` (:147): yaw/pitch on a radius-r sphere; y-up,
    x = r sin(phi) cos(theta), z = r sin(phi) sin(theta), y = r cos(phi),
  * `create_cam2world_matrix` (:195): look-at with world up [0,1,0], columns
    (-left, up, -forward),
  * `transform_sampled_points` (:108): camera->world point/direction transform,
  * `LookAtPoseSampler` (:268),
and the 25-dim conditioning label: flattened 4x4 cam2world ++ flattened 3x3
intrinsics [[4.2647,0,0.5],[0,4.2647,0.5],[0,0,1]] (gen_images.py:87,104-107).

All functions are pure jnp, shape-static, jit/vmap friendly. Stochastic variants take
explicit PRNG keys (JAX-native determinism instead of the reference's global torch RNG).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FOCAL_LENGTH_FFHQ = 4.2647  # normalized focal length (gen_images.py:87)
INTRINSICS_FFHQ = np.array(
    [[FOCAL_LENGTH_FFHQ, 0.0, 0.5], [0.0, FOCAL_LENGTH_FFHQ, 0.5], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
# Canonical front pose at radius 2.7 (gen_images.py:87, extract_shapes.py:182).
CANONICAL_POSE_25 = np.concatenate(
    [
        np.array([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 2.7, 0, 0, 0, 1], dtype=np.float32),
        INTRINSICS_FFHQ.reshape(-1),
    ]
)


def normalize_vecs(v: jax.Array, eps: float = 1e-9) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def sample_camera_origins(
    key: Optional[jax.Array],
    n: int,
    radius: float = 2.7,
    horizontal_mean: float = math.pi * 0.5,
    vertical_mean: float = math.pi * 0.5,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
    mode: Optional[str] = "normal",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample camera positions on a sphere (contract: volumetric_rendering.py:147-193).

    mode: 'uniform' | 'normal'/'gaussian' | 'spherical_uniform' | None (mean pose).
    Returns (origins [n,3], pitch [n,1], yaw [n,1]).
    """
    if mode is None or key is None or (horizontal_stddev == 0.0 and vertical_stddev == 0.0):
        theta = jnp.full((n, 1), horizontal_mean, dtype=jnp.float32)
        phi = jnp.full((n, 1), vertical_mean, dtype=jnp.float32)
    else:
        kh, kv = jax.random.split(key)
        if mode == "uniform":
            theta = (jax.random.uniform(kh, (n, 1)) - 0.5) * 2 * horizontal_stddev + horizontal_mean
            phi = (jax.random.uniform(kv, (n, 1)) - 0.5) * 2 * vertical_stddev + vertical_mean
        elif mode in ("normal", "gaussian"):
            theta = jax.random.normal(kh, (n, 1)) * horizontal_stddev + horizontal_mean
            phi = jax.random.normal(kv, (n, 1)) * vertical_stddev + vertical_mean
        elif mode == "spherical_uniform":
            theta = (jax.random.uniform(kh, (n, 1)) - 0.5) * 2 * horizontal_stddev + horizontal_mean
            v_stddev = vertical_stddev / math.pi
            v_mean = vertical_mean / math.pi
            v = (jax.random.uniform(kv, (n, 1)) - 0.5) * 2 * v_stddev + v_mean
            v = jnp.clip(v, 1e-5, 1 - 1e-5)
            phi = jnp.arccos(1 - 2 * v)
        else:
            raise ValueError(f"unknown camera sampling mode {mode!r}")

    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)
    origins = jnp.concatenate(
        [
            radius * jnp.sin(phi) * jnp.cos(theta),
            radius * jnp.cos(phi),
            radius * jnp.sin(phi) * jnp.sin(theta),
        ],
        axis=-1,
    )
    return origins, phi, theta


def create_cam2world_matrix(forward: jax.Array, origin: jax.Array) -> jax.Array:
    """Look-at cam2world (contract: volumetric_rendering.py:195-213).

    forward/origin: [..., 3]. Returns [..., 4, 4]. World up is +Y; the rotation
    columns are (-left, up, -forward), matching the OpenGL-style convention the
    whole reference pipeline uses.
    """
    forward = normalize_vecs(forward)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype=forward.dtype), forward.shape)
    left = normalize_vecs(jnp.cross(up, forward))
    up = normalize_vecs(jnp.cross(forward, left))

    rot = jnp.stack([-left, up, -forward], axis=-1)  # [..., 3, 3] columns
    batch_shape = forward.shape[:-1]
    m = jnp.zeros(batch_shape + (4, 4), dtype=forward.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(origin)
    m = m.at[..., 3, 3].set(1.0)
    return m


def look_at_pose(
    horizontal_mean: float,
    vertical_mean: float,
    lookat_position,
    radius: float = 1.0,
    batch_size: int = 1,
    key: Optional[jax.Array] = None,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
) -> jax.Array:
    """LookAtPoseSampler.sample (contract: volumetric_rendering.py:268-295).

    Returns cam2world [batch_size, 4, 4]. Note the vertical angle is remapped via
    arccos(1-2 v/pi), matching the reference exactly.
    """
    if key is None:
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    else:
        kh, kv = jax.random.split(key)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    theta = h

    origins = jnp.concatenate(
        [
            radius * jnp.sin(phi) * jnp.cos(theta),
            radius * jnp.cos(phi),
            radius * jnp.sin(phi) * jnp.sin(theta),
        ],
        axis=-1,
    )
    lookat = jnp.asarray(lookat_position, dtype=jnp.float32)
    forward = normalize_vecs(lookat - origins)
    return create_cam2world_matrix(forward, origins)


def make_label_25(cam2world: jax.Array, intrinsics: Optional[jax.Array] = None) -> jax.Array:
    """Flatten cam2world [B,4,4] (+ intrinsics) into the 25-dim conditioning label."""
    B = cam2world.shape[0]
    if intrinsics is None:
        intrinsics = jnp.broadcast_to(jnp.asarray(INTRINSICS_FFHQ), (B, 3, 3))
    return jnp.concatenate([cam2world.reshape(B, 16), intrinsics.reshape(B, 9)], axis=-1)


def get_initial_rays(
    n: int,
    num_steps: int,
    resolution: Tuple[int, int],
    fov: float,
    ray_start: float,
    ray_end: float,
    offset: Tuple[float, float] = (0.0, 0.0),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Camera-space rays + depth bins (contract: volumetric_rendering.py:77-97).

    resolution = (W, H). Returns:
      points     [n, W*H, num_steps, 3]  camera-space sample points,
      z_vals     [n, W*H, num_steps, 1]  linspace(ray_start, ray_end),
      rays_d_cam [n, W*H, 3]             unit ray directions (x right, y up, z = -1/tan(fov/2)).
    Pixel order is row-major over (H, W) with y flipped (image memory layout).
    `offset` shifts the image plane in NDC units (principal-point shift — used by
    the translation-equivariance metric, metrics/equivariance.py).
    """
    W, H = resolution
    x = jnp.linspace(-1.0, 1.0, W) + offset[0]
    y = jnp.linspace(1.0, -1.0, H) + offset[1]
    xg, yg = jnp.meshgrid(x, y)  # [H, W] each; rows scan y, cols scan x
    xf = xg.reshape(-1)
    yf = yg.reshape(-1)
    zf = -jnp.ones_like(xf) / math.tan((2 * math.pi * fov / 360) / 2)
    rays_d_cam = normalize_vecs(jnp.stack([xf, yf, zf], axis=-1))  # [WH, 3]

    z_vals = jnp.linspace(ray_start, ray_end, num_steps).reshape(1, num_steps, 1)
    z_vals = jnp.broadcast_to(z_vals, (W * H, num_steps, 1))
    points = rays_d_cam[:, None, :] * z_vals

    points = jnp.broadcast_to(points[None], (n, W * H, num_steps, 3))
    z_vals = jnp.broadcast_to(z_vals[None], (n, W * H, num_steps, 1))
    rays_d_cam = jnp.broadcast_to(rays_d_cam[None], (n, W * H, 3))
    return points, z_vals, rays_d_cam


def perturb_z_vals(
    key: jax.Array, points: jax.Array, z_vals: jax.Array, ray_directions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Stratified jitter of sample depths (contract: volumetric_rendering.py:99-105)."""
    spacing = z_vals[:, :, 1:2, :] - z_vals[:, :, 0:1, :]
    offset = (jax.random.uniform(key, z_vals.shape) - 0.5) * spacing
    z_vals = z_vals + offset
    points = points + offset * ray_directions[:, :, None, :]
    return points, z_vals


def transform_rays_to_world(
    points: jax.Array,  # [n, R, S, 3] camera-space points
    ray_directions: jax.Array,  # [n, R, 3]
    cam2world: jax.Array,  # [n, 4, 4]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Map camera-space samples to world space (contract: volumetric_rendering.py:108-136).

    Returns (world_points [n,R,S,3], world_dirs [n,R,3], world_origins [n,R,3]).
    """
    n, R, S, _ = points.shape
    rot = cam2world[:, :3, :3]
    trans = cam2world[:, :3, 3]

    pts = jnp.einsum("nij,nrsj->nrsi", rot, points) + trans[:, None, None, :]
    dirs = jnp.einsum("nij,nrj->nri", rot, ray_directions)
    origins = jnp.broadcast_to(trans[:, None, :], (n, R, 3))
    return pts, dirs, origins
