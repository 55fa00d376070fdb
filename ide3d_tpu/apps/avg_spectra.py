"""Average power-spectrum analysis (contract: avg_spectra.py:1-276).

Compares the azimuthally-averaged FFT power spectrum of generated vs real images
(the StyleGAN3 aliasing diagnostic).

Usage:
    python -m ide3d_tpu.apps.avg_spectra --network random:0 --num 16 --out spectra.npz
    python -m ide3d_tpu.apps.avg_spectra --data imgs/ --num 16 --out spectra_real.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def power_spectrum(images: np.ndarray) -> np.ndarray:
    """[N, H, W, C] -> mean 2D power spectrum [H, W] (Hann-windowed, per-channel
    mean), matching avg_spectra.py's spectrum accumulation."""
    x = images.mean(axis=-1)  # luma-ish
    n, h, w = x.shape
    win = np.hanning(h)[:, None] * np.hanning(w)[None, :]
    f = np.fft.fftshift(np.fft.fft2(x * win[None]), axes=(1, 2))
    return (np.abs(f) ** 2).mean(axis=0)


def azimuthal_average(spec: np.ndarray) -> np.ndarray:
    h, w = spec.shape
    y, x = np.indices((h, w))
    r = np.hypot(x - w / 2, y - h / 2).astype(np.int64)
    tbin = np.bincount(r.ravel(), spec.ravel())
    nr = np.bincount(r.ravel())
    return tbin / np.maximum(nr, 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    imgs = []
    if args.network:
        import jax
        import jax.numpy as jnp

        from .. import render
        from .common import load_generator

        G, params = load_generator(args.network)

        @jax.jit
        def gen(params, z, c):
            return G(params, z, c)

        c = jnp.asarray(render.CANONICAL_POSE_25)[None]
        for i in range(args.num):
            z = jnp.asarray(np.random.RandomState(i).randn(1, G.cfg.z_dim), jnp.float32)
            imgs.append(np.asarray(gen(params, z, c))[0])
    else:
        assert args.data
        from ..data import ImageFolderDataset

        ds = ImageFolderDataset(args.data)
        for i in range(min(args.num, len(ds))):
            imgs.append(ds[i][0].astype(np.float32) / 127.5 - 1.0)

    spec = power_spectrum(np.stack(imgs))
    radial = azimuthal_average(spec)
    np.savez(args.out, spectrum=spec, radial=radial)
    print(f"wrote {args.out}: spectrum {spec.shape}, radial {radial.shape}")


if __name__ == "__main__":
    main()
