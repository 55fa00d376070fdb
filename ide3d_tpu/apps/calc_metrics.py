"""Metric evaluation CLI (contract: calc_metrics.py:97 / apps/calc_metrics.py).

Usage:
    python -m ide3d_tpu.apps.calc_metrics --network random:0 --data path/to/imgs \
        --metrics fid,kid --num-items 1000 [--detector inception --detector-weights x.pth]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--data", default=None)
    ap.add_argument("--metrics", default="fid")
    ap.add_argument("--num-items", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--detector", choices=["pixel", "inception", "vgg16"], default="pixel")
    ap.add_argument("--detector-weights", default=None,
                    help="torch state_dict (.pth) for the chosen detector")
    ap.add_argument("--cache-dir", default=".metric_cache")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--mesh-devices", type=int, default=0,
                    help="shard extraction over an n-device 'data' mesh "
                         "(the reference's NCCL-rank feature sharding, "
                         "metric_utils.py:209-259)")
    ap.add_argument("--mesh-platform", choices=["native", "cpu"],
                    default="native",
                    help="'cpu' forces n VIRTUAL CPU devices (machinery "
                         "validation on a single-accelerator host); 'native' "
                         "uses the runtime's real devices")
    args = ap.parse_args(argv)

    mesh = None
    if args.mesh_devices:
        import jax

        if args.mesh_platform == "cpu":
            # virtual CPU devices; must precede the first backend touch (the
            # sitecustomize axon preset clobbers env-var overrides)
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.mesh_devices)
        from ..parallel import create_mesh

        mesh = create_mesh(args.mesh_devices)

    from ..metrics import calc_metric
    from ..metrics.features import make_detector
    from .common import load_generator

    G, g_params = load_generator(args.network)

    if args.detector == "pixel" and args.metrics != "ppl2_wend":
        print("WARNING: pixel detector gives scores NOT comparable with "
              "Inception-based references; pass --detector inception "
              "--detector-weights for real numbers.")
    det, dp = make_detector(args.detector, args.detector_weights)

    dataset = None
    if args.data:
        from ..data import ImageFolderDataset

        dataset = ImageFolderDataset(args.data, resolution=G.cfg.img_resolution)

    for metric in args.metrics.split(","):
        rec = calc_metric(
            metric.strip(), run_dir=args.run_dir, G=G, g_params=g_params,
            dataset=dataset, detector=det, detector_params=dp,
            num_items=args.num_items, batch_size=args.batch,
            cache_dir=args.cache_dir, mesh=mesh,
        )
        print(json.dumps(rec, default=float))


if __name__ == "__main__":
    main()
