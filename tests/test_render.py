"""Rendering-math tests: torch oracles for compositing/PDF sampling + property tests
(weights sum <= 1, cam2world orthonormality, CDF monotonicity) per SURVEY.md §4."""

import math

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ide3d_tpu import render
from ide3d_tpu.render.renderer import RenderParams, TriplaneRenderer


# ----------------------------------------------------------------- fancy_integration


def torch_fancy_integration(rgb_sigma, rays_d_cam, z_vals, clamp_mode="softplus",
                            last_back=False, white_back=False):
    """Oracle implementing the documented compositing contract
    (training/volumetric_rendering.py:34-74), noise_std=0."""
    rgbs = rgb_sigma[..., :-1]
    sigmas = rgb_sigma[..., -1:]
    deltas = z_vals[:, :, 1:] - z_vals[:, :, :-1]
    deltas = deltas * torch.norm(rays_d_cam, p=2, dim=-1, keepdim=True).unsqueeze(2)
    delta_inf = 1e10 * torch.ones_like(deltas[:, :, :1])
    deltas = torch.cat([deltas, delta_inf], -2)
    if clamp_mode == "softplus":
        alphas = 1 - torch.exp(-deltas * torch.nn.functional.softplus(sigmas))
    else:
        alphas = 1 - torch.exp(-deltas * torch.relu(sigmas))
    alphas_shifted = torch.cat([torch.ones_like(alphas[:, :, :1]), 1 - alphas + 1e-10], -2)
    weights = alphas * torch.cumprod(alphas_shifted, -2)[:, :, :-1]
    weights_sum = weights.sum(2)
    if last_back:
        weights[:, :, -1] += 1 - weights_sum
    rgb_final = torch.sum(weights * rgbs, -2)
    depth_final = torch.sum(weights * z_vals, -2)
    if white_back:
        rgb_final = rgb_final + 1 - weights_sum
    return rgb_final, depth_final, weights


@pytest.mark.parametrize("clamp_mode", ["softplus", "relu"])
@pytest.mark.parametrize("last_back,white_back", [(False, False), (True, False), (False, True)])
def test_integrate_rays_matches_torch(rng, clamp_mode, last_back, white_back):
    B, R, S, C = 2, 10, 12, 5
    fs = rng.randn(B, R, S, C + 1).astype(np.float32)
    rays = rng.randn(B, R, 3).astype(np.float32)
    z = np.sort(rng.rand(B, R, S, 1).astype(np.float32) + 2.0, axis=2)

    got_f, got_d, got_w = render.integrate_rays(
        jnp.asarray(fs), jnp.asarray(rays), jnp.asarray(z),
        clamp_mode=clamp_mode, last_back=last_back, white_back=white_back,
    )
    want_f, want_d, want_w = torch_fancy_integration(
        torch.from_numpy(fs), torch.from_numpy(rays), torch.from_numpy(z),
        clamp_mode, last_back, white_back,
    )
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_d), want_d.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), atol=1e-5, rtol=1e-4)


def test_weights_sum_at_most_one(rng):
    B, R, S = 1, 6, 20
    fs = rng.randn(B, R, S, 4).astype(np.float32) * 3
    rays = rng.randn(B, R, 3).astype(np.float32)
    z = np.sort(rng.rand(B, R, S, 1).astype(np.float32), axis=2)
    _, _, w = render.integrate_rays(jnp.asarray(fs), jnp.asarray(rays), jnp.asarray(z))
    s = np.asarray(w.sum(axis=-2))
    assert (s <= 1.0 + 1e-5).all() and (s >= 0).all()


# ----------------------------------------------------------------------- sample_pdf


def torch_sample_pdf(bins, weights, N_importance, det, eps=1e-5):
    """Oracle for the inverse-CDF sampler (volumetric_rendering.py:224-265), det mode."""
    N_rays, N_samples_ = weights.shape
    weights = weights + eps
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    u = torch.linspace(0, 1, N_importance).expand(N_rays, N_importance).contiguous()
    inds = torch.searchsorted(cdf, u)
    below = torch.clamp_min(inds - 1, 0)
    above = torch.clamp_max(inds, N_samples_)
    inds_sampled = torch.stack([below, above], -1).view(N_rays, 2 * N_importance)
    cdf_g = torch.gather(cdf, 1, inds_sampled).view(N_rays, N_importance, 2)
    bins_g = torch.gather(bins, 1, inds_sampled).view(N_rays, N_importance, 2)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom[denom < eps] = 1
    return bins_g[..., 0] + (u - cdf_g[..., 0]) / denom * (bins_g[..., 1] - bins_g[..., 0])


def test_sample_pdf_matches_torch_det(rng):
    R, S, N = 7, 14, 9
    bins = np.sort(rng.rand(R, S + 1).astype(np.float32) * 2 + 2, axis=1)
    weights = rng.rand(R, S).astype(np.float32)
    got = render.sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), N, det=True)
    want = torch_sample_pdf(torch.from_numpy(bins), torch.from_numpy(weights), N, det=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4)


def test_sample_pdf_random_in_range(rng):
    R, S, N = 4, 10, 16
    bins = np.sort(rng.rand(R, S + 1).astype(np.float32), axis=1)
    weights = rng.rand(R, S).astype(np.float32)
    out = np.asarray(
        render.sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights), N)
    )
    assert (out >= bins[:, :1] - 1e-5).all() and (out <= bins[:, -1:] + 1e-5).all()


# ---------------------------------------------------------------------------- camera


def test_cam2world_orthonormal_and_origin():
    origins, phi, theta = render.sample_camera_origins(None, 4, radius=2.7)
    c2w = render.create_cam2world_matrix(-origins, origins)
    R = np.asarray(c2w[:, :3, :3])
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2w[:, :3, 3]), np.asarray(origins), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2w[:, 3]), [[0, 0, 0, 1]] * 4, atol=1e-6)


def torch_create_cam2world(forward, origin):
    """Oracle for create_cam2world_matrix (volumetric_rendering.py:195-213)."""
    fwd = forward / forward.norm(dim=-1, keepdim=True)
    up = torch.tensor([0.0, 1.0, 0.0]).expand_as(fwd)
    left = torch.cross(up, fwd, dim=-1)
    left = left / left.norm(dim=-1, keepdim=True)
    up = torch.cross(fwd, left, dim=-1)
    up = up / up.norm(dim=-1, keepdim=True)
    rot = torch.eye(4).unsqueeze(0).repeat(fwd.shape[0], 1, 1)
    rot[:, :3, :3] = torch.stack((-left, up, -fwd), dim=-1)
    tr = torch.eye(4).unsqueeze(0).repeat(fwd.shape[0], 1, 1)
    tr[:, :3, 3] = origin
    return tr @ rot


def test_cam2world_matches_torch_oracle(rng):
    fwd = rng.randn(5, 3).astype(np.float32)
    org = rng.randn(5, 3).astype(np.float32)
    got = np.asarray(render.create_cam2world_matrix(jnp.asarray(fwd), jnp.asarray(org)))
    want = torch_create_cam2world(torch.from_numpy(fwd), torch.from_numpy(org)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_initial_rays_geometry():
    pts, z, d = render.get_initial_rays(2, 8, (4, 4), fov=18.0, ray_start=2.25, ray_end=3.3)
    assert pts.shape == (2, 16, 8, 3) and z.shape == (2, 16, 8, 1) and d.shape == (2, 16, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[0, 0, 0, 0]), 2.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[0, 0, -1, 0]), 3.3, atol=1e-6)
    # first pixel is top-left: y positive, x negative
    assert float(d[0, 0, 1]) > 0 and float(d[0, 0, 0]) < 0
    # z component: -1/tan(fov/2) before normalization -> all z negative
    assert (np.asarray(d)[..., 2] < 0).all()


def test_look_at_pose_front_view():
    c2w = np.asarray(render.look_at_pose(math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7))
    # Front pose: camera at [0, 0, 2.7] looking at origin -> identity rotation.
    np.testing.assert_allclose(
        c2w[0], np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.7], [0, 0, 0, 1]]), atol=1e-4
    )


def test_make_label_25_canonical():
    c2w = render.look_at_pose(math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7)
    lab = np.asarray(render.make_label_25(c2w))
    np.testing.assert_allclose(lab[0], render.CANONICAL_POSE_25, atol=1e-4)


def test_transform_rays_roundtrip(rng):
    # Identity camera leaves camera-space points unchanged.
    pts, z, d = render.get_initial_rays(1, 4, (3, 3), 18.0, 2.25, 3.3)
    eye = jnp.eye(4)[None]
    wpts, wdirs, worg = render.transform_rays_to_world(pts, d, eye)
    np.testing.assert_allclose(np.asarray(wpts), np.asarray(pts), atol=1e-6)
    np.testing.assert_allclose(np.asarray(worg), 0.0, atol=1e-6)


# -------------------------------------------------------------------------- renderer


def test_renderer_shapes_and_determinism(rng):
    r = TriplaneRenderer()
    params = r.init(jax.random.PRNGKey(0))
    B, res = 1, 32
    img_v = jnp.asarray(rng.randn(B, res, res, 96).astype(np.float32) * 0.1)
    seg_v = jnp.asarray(rng.randn(B, res, res, 57).astype(np.float32) * 0.1)
    c2w = render.look_at_pose(math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7)
    rp = RenderParams(img_size=16, num_steps=12)
    out1 = r.render(params, img_v, seg_v, c2w, rp, key=None)
    out2 = r.render(params, img_v, seg_v, c2w, rp, key=None)
    assert out1["feature"].shape == (B, 16, 16, 32)
    assert out1["seg"].shape == (B, 16, 16, 19)
    assert out1["depth"].shape == (B, 16, 16, 1)
    np.testing.assert_allclose(np.asarray(out1["feature"]), np.asarray(out2["feature"]))
    ws = np.asarray(out1["weights_sum"])
    assert (ws <= 1 + 1e-4).all() and (ws >= 0).all()


def test_sample_voxel_contract(rng):
    r = TriplaneRenderer()
    params = r.init(jax.random.PRNGKey(1))
    img_v = jnp.asarray(rng.randn(2, 16, 16, 96).astype(np.float32))
    seg_v = jnp.asarray(rng.randn(2, 16, 16, 57).astype(np.float32))
    coords = jnp.asarray(rng.rand(2, 100, 3).astype(np.float32) * 2 - 1)
    out = r.sample_voxel(params, img_v, seg_v, coords)
    assert out.shape == (2, 100, 52)
    # seg channels are the raw tri-plane samples (no decoder)
    from ide3d_tpu.ops import sample_from_triplane

    np.testing.assert_allclose(
        np.asarray(out[..., 32:51]),
        np.asarray(sample_from_triplane(coords, seg_v)),
        atol=1e-5,
    )


def test_fine_steps_budget_reallocation():
    """RenderParams.fine_steps: static-budget importance reallocation — fewer
    coarse + more importance samples, same total per ray (PERF.md lever).
    Output shapes hold and renders stay finite; fine_steps=None == 1:1 split."""
    import jax

    from ide3d_tpu.render.renderer import RenderParams, TriplaneRenderer

    R = TriplaneRenderer(feature_channels=8, seg_channels=5)
    params = R.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img_v = jnp.asarray(rng.randn(1, 16, 16, 3 * 8).astype(np.float32))
    seg_v = jnp.asarray(rng.randn(1, 16, 16, 3 * 5).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 2.7
    c2w = jnp.asarray(c2w)[None]

    rp_realloc = RenderParams(img_size=8, num_steps=6, fine_steps=18)
    out = R.render(params, img_v, seg_v, c2w, rp_realloc)
    assert out["feature"].shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out["feature"])).all()

    # equal-split equivalence: fine_steps=S must equal fine_steps=None
    rp_a = RenderParams(img_size=8, num_steps=8, fine_steps=None)
    rp_b = RenderParams(img_size=8, num_steps=8, fine_steps=8)
    out_a = R.render(params, img_v, seg_v, c2w, rp_a)
    out_b = R.render(params, img_v, seg_v, c2w, rp_b)
    np.testing.assert_allclose(np.asarray(out_a["feature"]),
                               np.asarray(out_b["feature"]), atol=1e-6)


def test_integrate_rays_merged_equals_sort_then_integrate():
    """Sort-free compositing (integrate_rays_merged) must equal the sorted
    cumprod path on the same unsorted samples — incl. ties, last_back,
    white_back, both clamp modes."""
    import jax

    from ide3d_tpu.render.integration import integrate_rays, integrate_rays_merged
    from ide3d_tpu.render.renderer import _sort_by_depth

    rng = np.random.RandomState(0)
    B, R, S, C = 2, 7, 12, 5
    feats = rng.randn(B, R, S, C + 1).astype(np.float32)
    rays_d = rng.randn(B, R, 3).astype(np.float32)
    z = rng.rand(B, R, S, 1).astype(np.float32) * 2 + 2.0
    # inject exact ties to exercise the index tie-break
    z[:, :, 3] = z[:, :, 7]

    for kwargs in (
        dict(),
        dict(last_back=True),
        dict(white_back=True),
        dict(clamp_mode="relu"),
    ):
        zs, fs = _sort_by_depth(jnp.asarray(z), jnp.asarray(feats))
        out_s, depth_s, w_s = integrate_rays(fs, jnp.asarray(rays_d), zs, **kwargs)
        out_m, depth_m, w_m = integrate_rays_merged(
            jnp.asarray(feats), jnp.asarray(rays_d), jnp.asarray(z), **kwargs
        )
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                                   atol=2e-5, rtol=2e-5, err_msg=str(kwargs))
        np.testing.assert_allclose(np.asarray(depth_m), np.asarray(depth_s),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            float(jnp.sum(w_m)), float(jnp.sum(w_s)), rtol=2e-5
        )

    # jit must equal eager and stay finite: XLA's reassociation of the fused
    # log(exp(-x)+ε) overflowed at the 1e10 last-delta sentinel before the
    # analytic log(1-α) fix — eager never showed it.
    out_j, depth_j, w_j = jax.jit(integrate_rays_merged)(
        jnp.asarray(feats), jnp.asarray(rays_d), jnp.asarray(z)
    )
    out_e, depth_e, w_e = integrate_rays_merged(
        jnp.asarray(feats), jnp.asarray(rays_d), jnp.asarray(z)
    )
    assert np.isfinite(np.asarray(out_j)).all()
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_e), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(w_j), np.asarray(w_e), atol=2e-5, rtol=2e-5)
