"""Tri-plane volume renderer: the `G.synthesis.renderer` of the rebuilt generator.

Behavioral contract (recovered from the pickled generator's call sites, SURVEY.md §2.1):
  * `sample_voxel(img_v, seg_v, coords[B,N,3]) -> [B,N,52]` = 32 feature channels ++
    19 semantic channels ++ 1 density (sigma LAST) — extract_shapes.py:146-147,
    inversion/utils/models_utils.py:104-105,
  * pi-GAN-style rendering: stratified coarse pass, hierarchical importance pass via
    `sample_pdf`, alpha compositing of features and semantics along the SAME weights
    (training/volumetric_rendering.py:34-74,224-265),
  * ray segment [2.25, 3.3], fov 18 deg, camera radius 2.7, render_size 64, 96 steps
    (gen_images.py:96-103, extract_shapes.py:133-136).

TPU design:
  * planes are channels-last `[B, res, res, 3*C]`; the gather runs over a flattened
    spatial view with the channel axis on the 128-lane dimension (ops/grid_sample.py),
  * the sigma/feature decoder is a tiny 2-layer MLP applied to the summed tri-plane
    features — one [B*R*S, 32]x[32, 64] matmul pair, ideal MXU shape once rays are
    flattened,
  * both passes evaluate all rays of the batch in one call — no python chunk loop at
    render resolution (the reference chunks with max_batch only for the 512^3 sigma
    grid; we expose `sample_voxel` for that use case and `lax.map` chunking in
    apps/extract_shapes),
  * everything is static-shape; hierarchical sampling extends the sample axis
    statically (S -> S+F) and composites the merged samples SORT-FREE
    (integration.integrate_rays_merged: order-free masked-matmul transmittance
    instead of a physical permutation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.bias_act import bias_act
from ..ops.grid_sample import sample_from_triplane
from .camera import get_initial_rays, perturb_z_vals, transform_rays_to_world
from .integration import integrate_rays, integrate_rays_merged, sample_pdf


def _sort_by_depth(z: jax.Array, vals: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort samples along the depth axis WITHOUT argsort+gather.

    TPU note: `argsort` + broadcast `take_along_axis` on a [B,R,2S,C] tensor costs
    ~275 ms/frame on v5e (measured) — scattered row gathers defeat the vector units.
    The sample axis is tiny (2S <= 192), so we compute each element's rank with an
    O(S^2) comparison matrix (ties broken by index, always a valid permutation) and
    apply the permutation as a one-hot MATMUL, which lands on the MXU: ~4 GFLOP
    total, sub-millisecond. This is the kind of reformulation the survey's
    "TPU-first design" mandate is about.

    z: [B, R, S, 1]; vals: [B, R, S, C]. Returns both sorted by z ascending.
    """
    zf = z[..., 0]  # [B,R,S]
    S = zf.shape[-1]
    zi = zf[..., :, None]  # element i
    zj = zf[..., None, :]  # element j
    less = (zj < zi).astype(jnp.int32)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)  # row = i
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)  # col = j
    # stable tie-break: equal-z element j precedes i iff j < i
    tie = ((zj == zi) & (j_idx < i_idx)).astype(jnp.int32)
    rank = (less + tie).sum(axis=-1)  # [B,R,S] target position of element i
    perm = jax.nn.one_hot(rank, S, dtype=vals.dtype)  # [B,R,S(i),S(k)]
    vals_sorted = jnp.einsum("brik,bric->brkc", perm, vals)
    z_sorted = jnp.einsum("brik,bri->brk", perm.astype(zf.dtype), zf)[..., None]
    return z_sorted, vals_sorted


@dataclasses.dataclass(frozen=True)
class RenderParams:
    """Static rendering configuration (the reference's `render_params` dict,
    gen_images.py:96-103). Pose comes from the cam2world matrix, not from
    h_mean/v_mean — callers sample poses explicitly with render.camera utilities."""

    img_size: int = 64
    # coarse steps; hierarchical adds fine_steps more. 96 = the reference budget
    # (gen_images.py:102 + sample_pdf importance pass)
    num_steps: int = 96
    # importance samples for the hierarchical pass; None = num_steps (the
    # reference 1:1 split). A TPU-friendly STATIC-budget reallocation lever:
    # e.g. num_steps=64, fine_steps=128 spends the same 192 samples/ray with
    # more of the budget guided by the coarse density (NerfAcc-style occupancy
    # skipping without dynamic shapes, PERF.md "related techniques").
    fine_steps: Optional[int] = None
    fov: float = 18.0
    ray_start: float = 2.25
    ray_end: float = 3.3
    hierarchical: bool = True
    clamp_mode: str = "softplus"
    nerf_noise: float = 0.0
    last_back: bool = False
    white_back: bool = False
    # principal-point shift in NDC units (equivariance metrics)
    pixel_offset: Tuple[float, float] = (0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class TriplaneRenderer:
    """Static module; params are a dict pytree created by `init`."""

    feature_channels: int = 32
    seg_channels: int = 19
    decoder_hidden: int = 64
    # coords scale: world coords are multiplied by this before plane lookup; the
    # reference samples the [-1,1] tri-plane cube directly with world coordinates
    # (extract_shapes.py:103 scales the probe cube by 0.9 only for shape export).
    coord_scale: float = 1.0

    @property
    def out_channels(self) -> int:
        return self.feature_channels + self.seg_channels + 1  # 52

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        c, h = self.feature_channels, self.decoder_hidden
        # He-style init; equalized-lr scaling is applied at call time (StyleGAN
        # convention, inversion/networks.py:136-165).
        return {
            "dec_w1": jax.random.normal(k1, (c, h), dtype=jnp.float32),
            "dec_b1": jnp.zeros((h,), dtype=jnp.float32),
            "dec_w2": jax.random.normal(k2, (h, c + 1), dtype=jnp.float32),
            "dec_b2": jnp.zeros((c + 1,), dtype=jnp.float32),
        }

    # ------------------------------------------------------------------ sampling

    def decode_features(self, params: dict, feat: jax.Array) -> jax.Array:
        """[..., 32] tri-plane features -> [..., 33] (32 features ++ sigma)."""
        c, h = self.feature_channels, self.decoder_hidden
        w1 = params["dec_w1"].astype(feat.dtype) * (1.0 / jnp.sqrt(jnp.float32(c)).astype(feat.dtype))
        w2 = params["dec_w2"].astype(feat.dtype) * (1.0 / jnp.sqrt(jnp.float32(h)).astype(feat.dtype))
        x = feat @ w1
        x = bias_act(x, params["dec_b1"].astype(feat.dtype), act="lrelu")
        x = x @ w2 + params["dec_b2"].astype(feat.dtype)
        return x

    def sample_voxel(
        self,
        params: dict,
        img_v: jax.Array,
        seg_v: jax.Array,
        coords: jax.Array,
        volume: Optional[jax.Array] = None,
        coords_grad: bool = False,
    ) -> jax.Array:
        """Contract: extract_shapes.py:146. coords [B,N,3] world -> [B,N,52],
        layout [feat(32) | seg(19) | sigma(1)].

        The texture and semantic plane stacks are sampled with ONE fused gather
        over the concatenated channels (rows narrower than 128 lanes cost the same
        as wide ones on TPU — see ops/grid_sample.sample_from_triplane_fused).
        `volume` is the optional VolumeGAN voxel branch [B,D,H,W,feat] of the
        hybrid representation (models/feature_volume.py; contract
        inversion/networks.py:1853-1917): its trilinearly-sampled features are
        ADDED to the tri-plane features before decoding.

        coords_grad=False (default) takes the fused-scatter fast path in which
        COORDINATES ARE NOT DIFFERENTIABLE — their cotangents are silently
        zero. Pass coords_grad=True when optimizing anything behind `coords`
        (e.g. camera pose)."""
        return self._sample_52(params, self.build_table(img_v, seg_v), coords,
                               volume=volume, coords_grad=coords_grad)

    def build_table(self, img_v: jax.Array, seg_v: jax.Array) -> jax.Array:
        """Quad table over the concatenated texture+semantic plane channels;
        build once per plane set, reuse across render passes / sigma chunks."""
        from ..ops.grid_sample import build_triplane_quad_table

        B, H, W, _ = img_v.shape
        fc, sc = self.feature_channels, self.seg_channels
        combined = jnp.concatenate(
            [img_v.reshape(B, H, W, 3, fc), seg_v.reshape(B, H, W, 3, sc)], axis=-1
        )
        return build_triplane_quad_table(combined)

    def _sample_52(
        self,
        params: dict,
        quad: jax.Array,
        coords: jax.Array,
        volume: Optional[jax.Array] = None,
        coords_grad: bool = False,
    ) -> jax.Array:
        from ..ops.grid_sample import sample_from_3dgrid, sample_from_quad_table

        coords = coords * self.coord_scale
        fc = self.feature_channels
        # coords_grad=False (the train-path default): fine_z is
        # stop_gradient'd and rays are camera-only, so coordinate gradients
        # are structurally zero — take the per-image-gather / fused-scatter
        # fast form (ops/grid_sample.py), whose custom_vjp returns ZERO
        # coordinate cotangents. Callers differentiating through coords
        # (pose optimization) must pass coords_grad=True.
        sampled = sample_from_quad_table(coords, quad, coords_grad=coords_grad)
        feat, seg = sampled[..., :fc], sampled[..., fc:]
        if volume is not None:
            # hybrid tri-plane/voxel representation: add the 3D-grid features
            feat = feat + sample_from_3dgrid(coords, volume).astype(feat.dtype)
        decoded = self.decode_features(params, feat)  # [B, N, fc+1]
        return jnp.concatenate(
            [decoded[..., :fc], seg, decoded[..., -1:]], axis=-1
        )

    # ----------------------------------------------------------------- rendering

    def render_coarse(
        self,
        params: dict,
        img_v: Optional[jax.Array],  # [B, res, res, 3*32]; None when quad given
        seg_v: Optional[jax.Array],  # [B, res, res, 3*19]
        cam2world: jax.Array,  # [B, 4, 4]
        rp: RenderParams,
        key: Optional[jax.Array] = None,
        volume: Optional[jax.Array] = None,
        quad: Optional[jax.Array] = None,  # prebuilt table (build_table), cached
        # per identity by interactive callers (apps/viz_renderer.py)
        ray_slice: Optional[Tuple[jax.Array, int]] = None,
        coords_grad: bool = False,  # False = fused-scatter fast path; sample
        # COORDINATES (and thus camera pose) are NOT differentiable (zero
        # cotangents). Set True to optimize through the camera.
    ) -> dict:
        """Phase 1: quad table + coarse pass (+ importance z when hierarchical).

        Returns the intermediate state consumed by `render_fine`. Splitting the
        frame at this boundary into TWO XLA programs measured ~10% faster than
        one fused program on v5e (PERF.md round 2) — `render` composes both for
        the single-program path used in training.

        `ray_slice=(start, length)` restricts the pass to a contiguous block of
        `length` rays beginning at (possibly traced) index `start` — the
        multi-chip ray-sharding hook (parallel/render.py): each device renders
        its block of the pixel grid and the feature image is all-gathered before
        superres. Per-ray work is independent, so sliced outputs equal the same
        rows of the full render. Pair with `render_fine(..., flat=True)`."""
        B = cam2world.shape[0]
        S = rp.num_steps
        W = H = rp.img_size
        Rr = W * H

        k_perturb = k_noise = k_fine = None
        if key is not None:
            k_perturb, k_noise, k_fine = jax.random.split(key, 3)

        points_cam, z_vals, rays_d_cam = get_initial_rays(
            B, S, (W, H), rp.fov, rp.ray_start, rp.ray_end, offset=rp.pixel_offset
        )
        if k_perturb is not None:
            points_cam, z_vals = perturb_z_vals(k_perturb, points_cam, z_vals, rays_d_cam)

        pts, dirs, origins = transform_rays_to_world(points_cam, rays_d_cam, cam2world)

        if ray_slice is not None:
            start, Rr = ray_slice
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, Rr, axis=1)
            pts, dirs, origins = sl(pts), sl(dirs), sl(origins)
            z_vals, rays_d_cam = sl(z_vals), sl(rays_d_cam)

        if quad is None:
            quad = self.build_table(img_v, seg_v)  # shared by coarse + fine passes
        coarse = self._sample_52(params, quad, pts.reshape(B, Rr * S, 3),
                                 volume=volume, coords_grad=coords_grad)
        coarse = coarse.reshape(B, Rr, S, self.out_channels)

        st = {
            "quad": quad, "coarse": coarse, "z_vals": z_vals,
            "rays_d_cam": rays_d_cam, "dirs": dirs, "origins": origins,
        }
        if volume is not None:
            st["volume"] = volume
        if k_noise is not None:
            st["k_noise"] = k_noise
        if rp.hierarchical:
            # Weights-only coarse pass.
            _, _, weights = integrate_rays(
                coarse,
                rays_d_cam,
                z_vals,
                noise_key=k_noise,
                noise_std=rp.nerf_noise,
                clamp_mode=rp.clamp_mode,
            )
            w_flat = weights.reshape(B * Rr, S)[:, 1:-1]
            z_flat = z_vals.reshape(B * Rr, S)
            z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
            F = rp.fine_steps if rp.fine_steps is not None else S
            fine_z = sample_pdf(k_fine, z_mid, w_flat, F, det=(key is None))
            st["fine_z"] = jax.lax.stop_gradient(fine_z).reshape(B, Rr, F, 1)
        return st

    def render_fine(
        self, params: dict, st: dict, rp: RenderParams, flat: bool = False,
        coords_grad: bool = False,
    ) -> dict:
        """Phase 2: fine pass + depth sort + compositing. Consumes render_coarse
        output; returns the `render` result dict. `flat=True` keeps the ray axis
        unreshaped ([B, Rr, C] instead of [B, H, W, C]) — required when the
        coarse pass rendered a `ray_slice` block (parallel/render.py).
        `coords_grad` must match the render_coarse call (static Python flag,
        kept out of the traced `st` pytree); the default False fast path has
        ZERO coordinate/camera cotangents (see sample_voxel)."""
        coarse, z_vals = st["coarse"], st["z_vals"]
        rays_d_cam = st["rays_d_cam"]
        B, Rr, S, _ = coarse.shape
        W = H = rp.img_size
        k_noise = st.get("k_noise")
        volume = st.get("volume")

        if rp.hierarchical:
            fine_z = st["fine_z"]
            F = fine_z.shape[2]
            fine_pts = st["origins"][:, :, None, :] + st["dirs"][:, :, None, :] * fine_z
            fine = self._sample_52(
                params, st["quad"], fine_pts.reshape(B, Rr * F, 3), volume=volume,
                coords_grad=coords_grad,
            )
            fine = fine.reshape(B, Rr, F, self.out_channels)

            all_z = jnp.concatenate([z_vals, fine_z], axis=-2)  # [B,R,S+F,1]
            all_out = jnp.concatenate([coarse, fine], axis=-2)
            # SORT-FREE compositing of the merged (unsorted) samples — replaces
            # the one-hot permutation einsum over all channels with scalar
            # masked-matmul reductions (integration.integrate_rays_merged;
            # numerically equal to sort + integrate, pinned by tests).
            comp, depth, weights = integrate_rays_merged(
                all_out,
                rays_d_cam,
                all_z,
                noise_key=k_noise,
                noise_std=rp.nerf_noise,
                clamp_mode=rp.clamp_mode,
                last_back=rp.last_back,
                white_back=rp.white_back,
            )
        else:
            comp, depth, weights = integrate_rays(
                coarse,
                rays_d_cam,
                z_vals,
                noise_key=k_noise,
                noise_std=rp.nerf_noise,
                clamp_mode=rp.clamp_mode,
                last_back=rp.last_back,
                white_back=rp.white_back,
            )

        fc = self.feature_channels
        if flat:
            return {
                "feature": comp[..., :fc],
                "seg": comp[..., fc:],
                "depth": depth,
                "weights_sum": weights.sum(axis=-2),
            }
        assert Rr == H * W, "sliced coarse state requires flat=True"
        return {
            "feature": comp[..., :fc].reshape(B, H, W, fc),
            "seg": comp[..., fc:].reshape(B, H, W, self.seg_channels),
            "depth": depth.reshape(B, H, W, 1),
            "weights_sum": weights.sum(axis=-2).reshape(B, H, W, 1),
        }

    def render(
        self,
        params: dict,
        img_v: jax.Array,  # [B, res, res, 3*32]
        seg_v: jax.Array,  # [B, res, res, 3*19]
        cam2world: jax.Array,  # [B, 4, 4]
        rp: RenderParams,
        key: Optional[jax.Array] = None,
        volume: Optional[jax.Array] = None,  # hybrid voxel branch [B,D,H,W,feat]
        coords_grad: bool = False,
    ) -> dict:
        """Volume-render feature image + semantics + depth at rp.img_size.

        Returns dict(feature [B,H,W,32], seg [B,H,W,19], depth [B,H,W,1],
        weights_sum [B,H,W,1]).

        coords_grad=False (default, the train path): sample coordinates — and
        therefore the camera pose behind them — are NOT differentiable; the
        fused-scatter fast path returns zero coordinate cotangents. Pass
        coords_grad=True to optimize through `cam2world`.
        """
        st = self.render_coarse(params, img_v, seg_v, cam2world, rp, key=key,
                                volume=volume, coords_grad=coords_grad)
        return self.render_fine(params, st, rp, coords_grad=coords_grad)
