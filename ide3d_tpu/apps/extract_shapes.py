"""Extract 3D density grids from the generator (CLI contract: extract_shapes.py:153).

Usage:
    python -m ide3d_tpu.apps.extract_shapes --network random:0 --seeds 0-2 \
        --voxel-resolution 256 --cube-size 0.3 --outdir shapes/

Per seed: map z -> w+, run the vb plane stack once, then evaluate
`renderer.sample_voxel` over an N^3 probe cube in fixed-size chunks
(`lax.map`-style static chunking replacing the reference's max_batch while loop,
extract_shapes.py:144-148) keeping only sigma (the last of the 52 channels).
Saves {seed}.npy (+ .mrc when mrcfile is installed).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def create_samples(N: int, cube_length: float) -> np.ndarray:
    """Probe cube point grid (contract: extract_shapes.py:74-96 — index order z
    fastest, then y, then x; voxel_origin at the cube corner)."""
    voxel_origin = np.array([0.0, 0.0, 0.0]) - cube_length / 2
    voxel_size = cube_length / (N - 1)
    overall = np.arange(N**3, dtype=np.int64)
    samples = np.zeros((N**3, 3), dtype=np.float32)
    samples[:, 2] = overall % N
    samples[:, 1] = (overall // N) % N
    samples[:, 0] = (overall // (N * N)) % N
    samples[:, 0] = samples[:, 0] * voxel_size + voxel_origin[2]
    samples[:, 1] = samples[:, 1] * voxel_size + voxel_origin[1]
    samples[:, 2] = samples[:, 2] * voxel_size + voxel_origin[0]
    return samples


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--trunc", type=float, default=1.0)
    ap.add_argument("--cube-size", type=float, default=0.3)
    ap.add_argument("--voxel-resolution", type=int, default=256)
    ap.add_argument("--max-batch", type=int, default=2**18)
    ap.add_argument("--outdir", default="shapes")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from .common import load_generator, parse_range

    G, params = load_generator(args.network)
    S = G.synthesis
    os.makedirs(args.outdir, exist_ok=True)

    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    N = args.voxel_resolution
    samples = 0.9 * create_samples(N, args.cube_size)  # extract_shapes.py:103
    M = args.max_batch
    pad = (-len(samples)) % M
    samples_p = np.pad(samples, ((0, pad), (0, 0)))
    chunks = jnp.asarray(samples_p.reshape(-1, M, 3), jnp.float32)

    planes_fn = jax.jit(lambda p, w: S.generate_planes(p, w))

    @jax.jit
    def sigma_chunks(rparams, img_v, seg_v, chunks):
        def one(coords):
            out = S.renderer.sample_voxel(rparams, img_v, seg_v, coords[None])
            return out[0, :, -1]

        return jax.lax.map(one, chunks)

    for seed in parse_range(args.seeds):
        z = jnp.asarray(np.random.RandomState(seed).randn(1, G.cfg.z_dim), jnp.float32)
        ws = G.mapping(params["mapping"], z, c, truncation_psi=args.trunc)
        img_v, seg_v = planes_fn(params["synthesis"], ws)
        sig = sigma_chunks(params["synthesis"]["renderer"], img_v, seg_v, chunks)
        sig = np.asarray(sig).reshape(-1)[: N**3].reshape(N, N, N)
        np.save(os.path.join(args.outdir, f"{seed}.npy"), sig)
        try:
            import mrcfile

            with mrcfile.new_mmap(
                os.path.join(args.outdir, f"{seed}.mrc"),
                overwrite=True, shape=sig.shape, mrc_mode=2,
            ) as mrc:
                mrc.data[:] = sig
        except ImportError:
            pass
        print(f"seed {seed}: sigma grid {sig.shape}, range [{sig.min():.3f}, {sig.max():.3f}]")


if __name__ == "__main__":
    main()
