"""Apply a StyleCLIP mapper edit to inverted latents (PTI pivots).

Reference: inversion/scripts/pti_styleclip.py — for each inverted image's pivot
latent, load a pretrained LevelsMapper (named edits in STYLECLIP_EDITS) and
render w + 0.1 * mapper(w) with the (optionally PTI-tuned) generator.

    python -m ide3d_tpu.apps.styleclip_edit --network ckpt/ \
        --latents pti_out/face.npz --mapper mappers/afro.pt --edit-name afro \
        --outdir edits/ [--strength 0.1] [--yaws -0.4,0,0.4]
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--latents", required=True,
                    help="npz with 'ws' [1,18,512] (run_pti output) — or a .pt")
    ap.add_argument("--mapper", required=True,
                    help="mapper checkpoint: torch .pt (pretrained StyleCLIP) "
                         "or a native orbax dir from train_styleclip_mapper")
    ap.add_argument("--edit-name", default=None,
                    help="named edit (configures which w+ groups move)")
    ap.add_argument("--strength", type=float, default=0.1)
    ap.add_argument("--yaws", default="0", help="comma list of yaw offsets")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from .. import render
    from ..editing.latent_editor import (STYLECLIP_EDITS, LevelsMapper,
                                         import_levels_mapper,
                                         levels_mapper_for_edit)
    from .common import load_generator, save_image_grid

    G, g_params = load_generator(args.network)

    if args.latents.endswith(".pt"):
        from ..io.torch_import import load_torch_state_dict

        ws = np.asarray(list(load_torch_state_dict(args.latents).values())[0])
    else:
        ws = np.load(args.latents)["ws"]
    ws = jnp.asarray(ws.reshape(1, G.num_ws, G.w_dim), jnp.float32)

    if os.path.isdir(args.mapper):
        from ..io.checkpoint import load_checkpoint

        params, _ = load_checkpoint(args.mapper)
        if args.edit_name in STYLECLIP_EDITS:
            mapper = levels_mapper_for_edit(args.edit_name, G.num_ws)
            mapper = LevelsMapper(w_dim=G.w_dim, num_ws=G.num_ws,
                                  use_coarse=mapper.use_coarse,
                                  use_medium=mapper.use_medium,
                                  use_fine=mapper.use_fine)
        else:
            mapper = LevelsMapper(w_dim=G.w_dim, num_ws=G.num_ws,
                                  use_coarse="course" in params,
                                  use_medium="medium" in params,
                                  use_fine="fine" in params)
    else:
        from ..io.torch_import import load_torch_state_dict

        mapper, params = import_levels_mapper(
            load_torch_state_dict(args.mapper), num_ws=G.num_ws)
        mapper = LevelsMapper(w_dim=G.w_dim, num_ws=G.num_ws,
                              use_coarse=mapper.use_coarse,
                              use_medium=mapper.use_medium,
                              use_fine=mapper.use_fine)

    ws_edit = mapper.edit(params, ws, strength=args.strength)

    os.makedirs(args.outdir, exist_ok=True)
    frames = []
    for yaw in [float(y) for y in args.yaws.split(",")]:
        c = render.make_label_25(render.look_at_pose(
            yaw + math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7))
        for w in (ws, ws_edit):
            frames.append(np.asarray(G.synthesis(g_params["synthesis"], w, c))[0])
    name = args.edit_name or "edit"
    save_image_grid(np.stack(frames), os.path.join(args.outdir, f"{name}.png"),
                    grid=(len(frames) // 2, 2))
    print(f"wrote {args.outdir}/{name}.png (rows: yaw; cols: original | edited)")


if __name__ == "__main__":
    main()
