"""Device-op profile of the REAL compiled train step via jax.profiler traces.

The tunneled TPU backend supports device-side op tracing (XLA Ops thread in
the trace), which gives the true per-op time breakdown of the compiled
programs — sharper than config A/Bs (tools/ab_train_step.py) and immune to
the isolated-probe undercounting PERF.md warns about.

    python tools/profile_device_trace.py --steps 3 --top 40
    python tools/profile_device_trace.py --what frame   # inference frame

Prints per-op-category totals and the top individual ops by device time.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_train_step(batch_size, num_steps):
    from ide3d_tpu import render
    from ide3d_tpu.models.discriminator import Discriminator, DiscriminatorConfig
    from ide3d_tpu.models.generator import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render import RenderParams
    from ide3d_tpu.train.gan import (GanTrainConfig, d_input_channels,
                                     init_gan_state, make_gan_train_step)

    rp = RenderParams(img_size=64, num_steps=num_steps, fine_steps=num_steps,
                      hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    tcfg = GanTrainConfig()
    D = Discriminator(DiscriminatorConfig(
        img_resolution=G.cfg.img_resolution,
        img_channels=d_input_channels(tcfg, G.cfg)))
    state = init_gan_state(jax.random.PRNGKey(0), G, D, tcfg)
    step = make_gan_train_step(G, D, tcfg, split=True)
    B, R = batch_size, G.cfg.img_resolution
    k = jax.random.PRNGKey(1)
    ki, ks, _ = jax.random.split(k, 3)
    batch = {
        "img": jax.random.uniform(ki, (B, R, R, 3), minval=-1, maxval=1),
        "seg": jax.nn.one_hot(
            jax.random.randint(ks, (B, R, R), 0, G.cfg.seg_channels),
            G.cfg.seg_channels) * 2.0 - 1.0,
        "c": jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25)),
    }
    def run(i, state):
        state, stats = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i),
                            jnp.asarray(0.5, jnp.float32))
        _ = float(stats["loss_d"])
        return state
    return run, state


def build_frame(num_steps):
    from ide3d_tpu import render
    from ide3d_tpu.models.generator import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render import RenderParams

    rp = RenderParams(img_size=64, num_steps=num_steps, fine_steps=num_steps,
                      hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    params = jax.jit(G.init)(jax.random.PRNGKey(0))
    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    ws = G.mapping(params["mapping"], jnp.zeros((1, G.cfg.z_dim)), c)
    fwd = jax.jit(lambda p, w, cc: G.synthesis(p["synthesis"], w, cc, return_seg=True))

    def run(i, _):
        img, seg = fwd(params, ws, c)
        _ = float(img.sum())
        return None
    return run, None


CATEGORIES = [
    ("gather", re.compile(r"gather|take", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv", re.compile(r"convolution|conv2d", re.I)),
    ("matmul", re.compile(r"dot|matmul|gemm", re.I)),
    ("sort/cumsum", re.compile(r"sort|cumsum|reduce_window", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("allreduce", re.compile(r"all-reduce|collective", re.I)),
]


def categorize(name):
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-steps", type=int, default=96)
    ap.add_argument("--what", choices=["train", "frame"], default="train")
    ap.add_argument("--logdir", default="/tmp/ide3d_trace")
    ap.add_argument("--hlo", nargs="*", default=None,
                    help="compiled-HLO text dump(s) to attribute op names to "
                         "source_file:line (module-level budget)")
    args = ap.parse_args()

    if args.what == "train":
        run, carry = build_train_step(args.batch, args.num_steps)
    else:
        run, carry = build_frame(args.num_steps)

    carry = run(0, carry)  # warm/compile
    jax.profiler.start_trace(args.logdir)
    for i in range(1, args.steps + 1):
        carry = run(i, carry)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.logdir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device pid + XLA Ops tids
    pids = {e["pid"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    tids = {(e["pid"], e["tid"]) for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Ops" and e["pid"] in pids}
    ops = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in tids:
            ops[e["name"]] += e.get("dur", 0)
    total = sum(ops.values())
    per_step = total / 1e3 / args.steps
    print(f"device op time: {total/1e3:.1f} ms over {args.steps} steps "
          f"({per_step:.1f} ms/step)")
    cats = collections.Counter()
    for name, d in ops.items():
        cats[categorize(name)] += d
    print("\nby category (ms/step):")
    for cat, d in cats.most_common():
        print(f"  {d/1e3/args.steps:9.2f}  {cat}")
    print(f"\ntop {args.top} ops (ms/step):")
    for name, d in ops.most_common(args.top):
        print(f"  {d/1e3/args.steps:9.2f}  {name[:110]}")

    if args.hlo:
        # Join op names with source_file:line metadata from a compiled-HLO text
        # dump (jit.lower(...).compile().as_text()) for a module-level budget.
        src = {}
        pat = re.compile(
            r"%(\S+) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)")
        for hlo_path in args.hlo:
            with open(hlo_path) as f:
                for line in f:
                    m = pat.search(line)
                    if m:
                        name, fname, lineno = m.groups()
                        src[name] = f"{os.path.basename(fname)}:{lineno}"
        by_src = collections.Counter()
        unattributed = collections.Counter()
        for name, d in ops.items():
            key = src.get(name)
            if key is None:
                unattributed[name] += d
            else:
                by_src[key] += d
        print(f"\nby source line (ms/step, top {args.top}):")
        for key, d in by_src.most_common(args.top):
            print(f"  {d/1e3/args.steps:9.2f}  {key}")
        un = sum(unattributed.values())
        print(f"\nunattributed: {un/1e3/args.steps:.2f} ms/step; top:")
        for name, d in unattributed.most_common(10):
            print(f"  {d/1e3/args.steps:9.2f}  {name[:90]}")


if __name__ == "__main__":
    main()
