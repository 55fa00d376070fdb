"""A/B the frame's XLA-program split points on real hardware.

XLA schedules the fused hierarchical frame worse than the sum of its stages
(PERF.md round 2); the shipped latency path chains two programs cut at the
coarse/fine renderer boundary. This tool measures every candidate cut
configuration of models/generator.make_pipelined_frame with bench.py's timing
discipline (per-frame scalar readback minus measured dispatch RTT) so finer
splits can be judged on-device, not guessed.

    python tools/ab_phase_split.py --iters 30
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--num-steps", type=int, default=96)
    ap.add_argument("--fine-steps", type=int, default=None)
    args = ap.parse_args()

    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.models.generator import make_pipelined_frame
    from ide3d_tpu.render.renderer import RenderParams
    from ide3d_tpu import render
    import math

    rp = RenderParams(img_size=64, num_steps=args.num_steps,
                      fine_steps=args.fine_steps, hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    params = jax.jit(G.init)(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, G.cfg.z_dim))
    c0 = jnp.asarray(render.CANONICAL_POSE_25)[None]
    ws = G.mapping(params["mapping"], z, c0)
    cams = [render.make_label_25(render.look_at_pose(
        math.pi / 2 + 0.5 * math.sin(2 * math.pi * i / 24), math.pi / 2,
        [0.0, 0.0, 0.0], radius=2.7)) for i in range(args.iters + args.warmup)]

    @jax.jit
    def _checksum(img, seg):
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    from bench import _rtt_baseline as rtt_baseline  # one RTT discipline

    configs = [
        ("fused", ()),
        ("2p coarse|fine (shipped)", ("coarse",)),
        ("2p planes|rest", ("planes",)),
        ("2p render|sr", ("fine",)),
        ("3p planes|coarse|rest", ("planes", "coarse")),
        ("3p coarse|fine|sr", ("coarse", "fine")),
        ("4p all cuts", ("planes", "coarse", "fine")),
    ]

    results = []
    for name, cuts in configs:
        frame = make_pipelined_frame(G.synthesis, rp, return_seg=True, cuts=cuts)

        def run(i):
            img, seg = frame(params["synthesis"], ws, cams[i])
            float(_checksum(img, seg))

        for i in range(args.warmup):
            run(i)
        rtt = rtt_baseline()
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            run(args.warmup + i)
            times.append(time.perf_counter() - t0)
        ms = max(sorted(times)[len(times) // 2] - rtt, 1e-6) * 1e3
        results.append((name, ms))
        print(f"{name:28s} {ms:7.2f} ms/frame  ({1e3 / ms:6.1f} fps)", flush=True)

    best = min(results, key=lambda r: r[1])
    print(f"\nbest: {best[0]} @ {best[1]:.2f} ms")


if __name__ == "__main__":
    main()
