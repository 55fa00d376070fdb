"""Golden-value regression tests.

The reference's checkpoint-parity tests (SURVEY.md §4b) need pretrained weights
that aren't shipped; until they are importable, these goldens freeze OUR tiny
generator's outputs at fixed seeds so any unintended numeric drift in the
ops/render/model stack fails loudly. Regenerate intentionally with:

    python tests/test_golden.py --regen
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_tiny_g.npz")


def _build():
    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams
    from ide3d_tpu import render

    cfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16,
        channel_base=512, channel_max=32, sr_channel_base=256, sr_channel_max=16,
        feature_channels=8, dtype="float32",
        render=RenderParams(img_size=8, num_steps=4, hierarchical=True),
    )
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(42), (1, cfg.z_dim))
    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    out = G(params, z, c, return_all=True)
    ws = G.mapping(params["mapping"], z, c)
    img_v, seg_v = G.synthesis.generate_planes(params["synthesis"], ws)
    coords = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 3), minval=-0.5, maxval=0.5)
    voxel = G.synthesis.renderer.sample_voxel(
        params["synthesis"]["renderer"], img_v, seg_v, coords
    )
    return {
        "img": np.asarray(out["img"]),
        "seg_raw": np.asarray(out["seg_raw"]),
        "depth": np.asarray(out["depth"]),
        "ws": np.asarray(ws),
        "voxel": np.asarray(voxel),
    }


def test_golden_outputs_stable():
    got = _build()
    if not os.path.exists(GOLDEN_PATH):
        np.savez_compressed(GOLDEN_PATH, **got)
        raise AssertionError(
            "golden file was missing — regenerated; commit it and re-run"
        )
    ref = np.load(GOLDEN_PATH)
    for key in ref.files:
        np.testing.assert_allclose(
            got[key], ref[key], atol=2e-4, rtol=2e-4,
            err_msg=f"golden mismatch for {key!r} — if the change is intentional, "
            f"regenerate with `python tests/test_golden.py --regen`",
        )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        np.savez_compressed(GOLDEN_PATH, **_build())
        print(f"regenerated {GOLDEN_PATH}")
