"""Extract + visualize geometry (CLI contract: render_mesh.py:26-85).

The reference marching-cubes the sigma grid (mcubes) and renders an orbit video
with pyrender. TPU-native equivalent:
  * mesh export via the dependency-free marching-tetrahedra (utils/marching.py)
    -> .obj/.ply,
  * orbit geometry video rendered DIRECTLY from the sigma field with the
    framework's own ray marcher — depth is converted to normal-shaded frames
    (no GL stack needed; runs on the accelerator).

Usage:
    python -m ide3d_tpu.apps.render_mesh --network random:0 --seed 0 \
        --voxel-resolution 128 --outdir meshes/ [--video orbit.mp4]
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trunc", type=float, default=0.7)
    ap.add_argument("--voxel-resolution", type=int, default=128)
    ap.add_argument("--cube-size", type=float, default=0.3)
    ap.add_argument("--level", type=float, default=10.0, help="sigma iso level")
    ap.add_argument("--video", default=None)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..render.renderer import RenderParams
    from ..utils.marching import marching_tetrahedra, save_obj, save_ply
    from .common import load_generator
    from .extract_shapes import create_samples

    G, params = load_generator(args.network)
    S = G.synthesis
    os.makedirs(args.outdir, exist_ok=True)

    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    z = jnp.asarray(np.random.RandomState(args.seed).randn(1, G.cfg.z_dim), jnp.float32)
    ws = G.mapping(params["mapping"], z, c, truncation_psi=args.trunc)
    img_v, seg_v = jax.jit(S.generate_planes)(params["synthesis"], ws)

    # sigma grid (chunked)
    N = args.voxel_resolution
    samples = 0.9 * create_samples(N, args.cube_size)
    M = 2**17
    pad = (-len(samples)) % M
    chunks = jnp.asarray(np.pad(samples, ((0, pad), (0, 0))).reshape(-1, M, 3))

    @jax.jit
    def sigma_of(chunks):
        def one(coords):
            out = S.renderer.sample_voxel(params["synthesis"]["renderer"], img_v, seg_v,
                                          coords[None])
            return out[0, :, -1]

        return jax.lax.map(one, chunks)

    sig = np.asarray(sigma_of(chunks)).reshape(-1)[: N**3].reshape(N, N, N)
    print(f"sigma range [{sig.min():.2f}, {sig.max():.2f}]")

    level = args.level
    if not (sig.min() < level < sig.max()):
        level = float(np.percentile(sig, 98))
        print(f"requested iso level {args.level} outside sigma range; using "
              f"98th percentile {level:.2f}")

    verts, faces = marching_tetrahedra(sig, level=level)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces")
    save_obj(os.path.join(args.outdir, f"{args.seed}.obj"), verts, faces)
    save_ply(os.path.join(args.outdir, f"{args.seed}.ply"), verts, faces)

    if args.video:
        # normal-shaded orbit via the framework's own renderer depth output
        rp = RenderParams(img_size=G.cfg.render_size, num_steps=64, hierarchical=True)

        @jax.jit
        def depth_frame(c25):
            r = S.renderer.render(
                params["synthesis"]["renderer"],
                img_v, seg_v, c25[:, :16].reshape(-1, 4, 4), rp,
            )
            return r["depth"][0, ..., 0], r["weights_sum"][0, ..., 0]

        frames = []
        for i in range(args.frames):
            yaw = math.pi / 2 + 0.6 * math.sin(2 * math.pi * i / args.frames)
            c2w = render.look_at_pose(yaw, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7)
            d, wsum = depth_frame(render.make_label_25(c2w))
            d = np.asarray(d)
            mask = np.asarray(wsum) > 0.5
            # normals from depth gradient
            gy, gx = np.gradient(d)
            nz = np.ones_like(d) * 0.02
            n = np.stack([-gx, -gy, nz], -1)
            n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-8
            light = np.array([0.3, 0.3, 0.9])
            shade = np.clip((n @ light), 0, 1) * mask
            frames.append((np.repeat(shade[..., None], 3, -1) * 255).astype(np.uint8))

        from .common import write_video

        out_path = write_video(args.video, frames, fps=24)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
