"""Stage timing for the flagship frame at the reference budget (PERF.md method:
per-iteration scalar readback minus measured tunnel RTT; block_until_ready is
unreliable on the axon backend).

Stages: plane generation | quad-table build | coarse gather+decode |
hierarchical resample (sample_pdf + fine gather + sort) | integrate | superres |
full frame. Run on an otherwise-idle chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, args, iters=12, warmup=3, rtt=0.0):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    return max(sorted(ts)[len(ts) // 2] - rtt, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-steps", type=int, default=96)
    args = ap.parse_args()

    from ide3d_tpu import render
    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams

    rp = RenderParams(img_size=64, num_steps=args.num_steps, hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    S = G.synthesis
    R = S.renderer
    params = jax.jit(G.init)(jax.random.PRNGKey(0))
    sp = params["synthesis"]

    z = jax.random.normal(jax.random.PRNGKey(1), (1, G.cfg.z_dim))
    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    ws = G.mapping(params["mapping"], z, c)
    dt = jnp.dtype(G.cfg.dtype)

    @jax.jit
    def noop(x):
        return jnp.sum(x)

    probe = jnp.ones((8, 128))
    rtts = []
    for _ in range(12):
        t0 = time.perf_counter()
        float(noop(probe))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"rtt {rtt*1e3:.1f} ms")

    planes_fn = jax.jit(lambda p, w: S.generate_planes(p, w))
    img_v, seg_v = planes_fn(sp, ws)
    img_v, seg_v = img_v.astype(dt), seg_v.astype(dt)

    quad_fn = jax.jit(lambda iv, sv: R.build_table(iv, sv))
    quad = quad_fn(img_v, seg_v)

    from ide3d_tpu.render.camera import get_initial_rays, transform_rays_to_world

    B, Sn, W = 1, rp.num_steps, rp.img_size
    Rr = W * W
    pts_cam, z_vals, rays_d = get_initial_rays(B, Sn, (W, W), rp.fov, rp.ray_start, rp.ray_end)
    c2w = c[:, :16].reshape(-1, 4, 4)
    pts, dirs, origins = transform_rays_to_world(pts_cam, rays_d, c2w)
    flat_pts = pts.reshape(B, Rr * Sn, 3)

    coarse_fn = jax.jit(lambda p, q, x: R._sample_52(p, q, x))
    coarse = coarse_fn(sp["renderer"], quad, flat_pts)

    from ide3d_tpu.render.integration import (
        integrate_rays,
        integrate_rays_merged,
        sample_pdf,
    )

    def hier(p, q, coarse, z_vals):
        co = coarse.reshape(B, Rr, Sn, R.out_channels)
        _, _, weights = integrate_rays(co, rays_d, z_vals, clamp_mode=rp.clamp_mode)
        w_flat = weights.reshape(B * Rr, Sn)[:, 1:-1]
        z_flat = z_vals.reshape(B * Rr, Sn)
        z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
        fz = sample_pdf(None, z_mid, w_flat, Sn, det=True).reshape(B, Rr, Sn, 1)
        fpts = origins[:, :, None, :] + dirs[:, :, None, :] * fz
        fine = R._sample_52(p, q, fpts.reshape(B, Rr * Sn, 3))
        fine = fine.reshape(B, Rr, Sn, R.out_channels)
        az = jnp.concatenate([z_vals, fz], axis=-2)
        ao = jnp.concatenate([co, fine], axis=-2)
        comp, depth, wts = integrate_rays_merged(ao, rays_d, az, clamp_mode=rp.clamp_mode)
        return comp

    hier_fn = jax.jit(hier)
    comp = hier_fn(sp["renderer"], quad, coarse, z_vals)

    # --- sub-stage microprobes (what the 'coarse gather+decode' ms is made of)
    from ide3d_tpu.ops.grid_sample import sample_from_quad_table

    fc = R.feature_channels
    gather_fn = jax.jit(lambda q, x: sample_from_quad_table(x, q))
    sampled = gather_fn(quad, flat_pts)
    decode_fn = jax.jit(lambda p, f: R.decode_features(p, f))
    _ = decode_fn(sp["renderer"], sampled[..., :fc])

    def rows_only(q, x):
        """The raw row gather of sample_from_quad_table, no lerp/mask epilogue."""
        Bq, P, H1, W1, C4 = q.shape
        H, W = H1 - 1, W1 - 1
        x32 = x.astype(jnp.float32)
        cx = jnp.stack([x32[..., 0], x32[..., 1], x32[..., 0]], axis=0)
        cy = jnp.stack([x32[..., 1], x32[..., 2], x32[..., 2]], axis=0)
        fx = (cx + 1.0) * W * 0.5 - 0.5
        fy = (cy + 1.0) * H * 0.5 - 0.5
        xq = jnp.clip(jnp.floor(fx).astype(jnp.int32) + 1, 0, W)
        yq = jnp.clip(jnp.floor(fy).astype(jnp.int32) + 1, 0, H)
        flat = q.reshape(Bq * 3 * H1 * W1, C4)
        base = (
            jnp.arange(Bq, dtype=jnp.int32)[None, :] * 3
            + jnp.arange(3, dtype=jnp.int32)[:, None]
        )[..., None] * (H1 * W1)
        idx = base + yq * W1 + xq
        rows = jnp.take(flat, idx.reshape(-1), axis=0)
        return jnp.sum(rows.astype(jnp.float32), axis=0)  # tiny reduce epilogue

    rows_fn = jax.jit(rows_only)
    _ = rows_fn(quad, flat_pts)

    def pdf_only(coarse, z_vals):
        co = coarse.reshape(B, Rr, Sn, R.out_channels)
        _, _, weights = integrate_rays(co, rays_d, z_vals, clamp_mode=rp.clamp_mode)
        w_flat = weights.reshape(B * Rr, Sn)[:, 1:-1]
        z_flat = z_vals.reshape(B * Rr, Sn)
        z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
        return sample_pdf(None, z_mid, w_flat, Sn, det=True)

    pdf_fn = jax.jit(pdf_only)
    _ = pdf_fn(coarse, z_vals)

    fine_all_z = jnp.concatenate(
        [z_vals, z_vals + 0.001], axis=-2
    )
    merged_in = jnp.concatenate(
        [coarse.reshape(B, Rr, Sn, R.out_channels)] * 2, axis=-2
    )
    merge_fn = jax.jit(
        lambda ao, az: integrate_rays_merged(ao, rays_d, az, clamp_mode=rp.clamp_mode)[0]
    )
    _ = merge_fn(merged_in, fine_all_z)

    feature = comp[..., : R.feature_channels].reshape(B, W, W, R.feature_channels)
    raw_fn = jax.jit(
        lambda p, f, w: S._raw_rgb()(p["raw_rgb"], f.astype(dt), w[:, len(S.voxel_block_resolutions) + 1])
    )
    img_raw = raw_fn(sp, feature, ws)
    sr_fn = jax.jit(lambda p, f, ir, w: S.superresolve(p, f, ir, w))

    full_fn = jax.jit(lambda p, w, c: S(p, w, c, return_seg=True)[0])

    stages = {
        "planes (vb stack)": (planes_fn, (sp, ws)),
        "quad table build": (quad_fn, (img_v, seg_v)),
        "coarse gather+decode": (coarse_fn, (sp["renderer"], quad, flat_pts)),
        "hier (pdf+fine+merge-integrate)": (hier_fn, (sp["renderer"], quad, coarse, z_vals)),
        "superres": (sr_fn, (sp, feature, img_raw, ws)),
        "  sub: rows-only gather": (rows_fn, (quad, flat_pts)),
        "  sub: quad sample (gather+lerp)": (gather_fn, (quad, flat_pts)),
        "  sub: decode MLP": (decode_fn, (sp["renderer"], sampled[..., :fc])),
        "  sub: coarse pdf": (pdf_fn, (coarse, z_vals)),
        "  sub: merged integrate (192)": (merge_fn, (merged_in, fine_all_z)),
        "FULL frame": (full_fn, (sp, ws, c)),
    }
    total = 0.0
    for name, (fn, a) in stages.items():
        t = sync_time(fn, a, rtt=rtt)
        if name != "FULL frame" and not name.startswith("  sub"):
            total += t
        print(f"{name:34s} {t*1e3:7.2f} ms")
    print(f"{'sum of stages':34s} {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
