"""Export a generator checkpoint as a frozen AOT serving artifact.

The deployment counterpart of the reference's pickle distribution (legacy.py):
instead of a pickle that re-executes embedded source at load time, this writes
serialized StableHLO programs (weights baked in) that any JAX runtime executes
without the model code — see io/export.py.

    python -m ide3d_tpu.apps.export_model --network <ckpt-dir|random:N> \
        --outdir artifact/ [--trunc 0.7] [--batch 1] [--platforms tpu,cpu]

Smoke-load with --check: reload the artifact and render one frame.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True, help="checkpoint dir or random:<seed>")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--trunc", type=float, default=1.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override ray-sample budget (default: config)")
    ap.add_argument("--no-seg", action="store_true")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu "
                         "(default: current backend)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and render one frame")
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..io.export import export_generator, load_artifact
    from .common import load_generator

    G, params = load_generator(args.network)
    rp = G.cfg.render
    if args.num_steps is not None:
        rp = dataclasses.replace(rp, num_steps=args.num_steps)
    platforms = args.platforms.split(",") if args.platforms else None

    meta = export_generator(
        G, params, args.outdir, batch=args.batch, truncation_psi=args.trunc,
        return_seg=not args.no_seg, render_params=rp, platforms=platforms,
    )
    print(f"wrote {args.outdir}: {meta}")

    if args.check:
        art = load_artifact(args.outdir)
        z = jax.random.normal(jax.random.PRNGKey(0), (args.batch, meta["z_dim"]))
        c = jnp.broadcast_to(
            jnp.asarray(render.CANONICAL_POSE_25), (args.batch, meta["c_dim"])
        )
        ws = art.map_z(z, c)
        out = art.render(ws, c)
        img = out[0] if meta["return_seg"] else out
        print(f"check: rendered {tuple(img.shape)}, "
              f"finite={bool(jnp.isfinite(img).all())}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
