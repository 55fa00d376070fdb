"""Multi-chip rendering: shard the RAY axis (single-frame latency) or the
FRAME axis (offline video throughput) over the mesh.

The reference scales only by data parallelism (DDP batches,
apps/train_hybrid_encoder.py:45-50); its per-frame render is single-GPU. On a
TPU slice the natural latency lever is different: the volume-rendering hot loop
(tri-plane gather + decode over W*H rays x S samples, PERF.md stage profile) is
embarrassingly parallel over RAYS, so one frame can ride the whole slice —
SURVEY.md §2.2 "the renderer should shard rays across devices for throughput".

Design (shard_map over the 1-D mesh, inputs replicated):
  * every device runs the cheap replicated prologue itself — vb plane stack +
    quad table (~2.4 ms, PERF.md) — instead of paying an ICI broadcast of the
    ~200-channel table;
  * each device renders a contiguous block of W*H/n rays end-to-end (coarse
    pass, per-ray sample_pdf, fine pass, sort-free compositing) via the
    `ray_slice` hook of TriplaneRenderer.render_coarse — per-ray work is
    independent, so the math is UNCHANGED: sliced outputs are literally rows of
    the single-device render;
  * the composited feature/seg/raw rows are all-gathered (tiled) — the only
    collective in the frame, [B, W*H, 52] in the compute dtype — and the 2D
    superres epilogue runs replicated (3.3 ms, cheaper than a halo-exchanged
    sharded conv stack at 64² inputs).

Noise is disabled (interactive contract: noise_mode='const', deterministic
z-bins) so every device traces the identical program and `check_rep` can prove
the output replicated.

Validated on an 8-virtual-device CPU mesh against the fused single-device
render (tests/test_parallel_render.py: exact row equality).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map  # jax.shard_map renames check_rep
from jax.sharding import Mesh, PartitionSpec as P


def make_ray_sharded_frame(
    S,  # models.generator.Ide3dSynthesisNetwork
    mesh: Mesh,
    render_params=None,
    return_seg: bool = True,
    axis: str = "data",
):
    """Build frame(params, ws, c) -> img | (img, seg) where the volume-render
    ray loop is split over `mesh`'s `axis`. Inputs/outputs are replicated
    (batch stays whole — this scales SINGLE-frame latency, not batch
    throughput; use the pjit DP steps for throughput)."""
    cfg = S.cfg
    rp = render_params or cfg.render
    dt = jnp.dtype(cfg.dtype)
    R = S.renderer
    n = mesh.shape[axis]
    total_rays = rp.img_size * rp.img_size
    assert total_rays % n == 0, (
        f"{total_rays} rays not divisible by mesh axis '{axis}' size {n}"
    )
    r_loc = total_rays // n

    def body(params, ws, c):
        # replicated prologue (cheaper than broadcasting the quad table)
        img_v, seg_v = S.generate_planes(params, ws)
        quad = R.build_table(img_v.astype(dt), seg_v.astype(dt))
        volume = None
        if cfg.use_feature_volume:
            volume = S._feature_volume()(params["feature_volume"], ws[:, 0]).astype(dt)
        cam2world = c[:, :16].reshape(-1, 4, 4).astype(jnp.float32)

        # this device's contiguous ray block
        start = jax.lax.axis_index(axis) * r_loc
        st = R.render_coarse(
            params["renderer"], None, None, cam2world, rp,
            volume=volume, quad=quad, ray_slice=(start, r_loc),
        )
        rout = R.render_fine(params["renderer"], st, rp, flat=True)

        # the frame's one collective: gather composited rows from all devices
        feature = jax.lax.all_gather(rout["feature"], axis, axis=1, tiled=True)
        seg_raw = jax.lax.all_gather(rout["seg"], axis, axis=1, tiled=True)
        B = feature.shape[0]
        H = W = rp.img_size
        feature = feature.reshape(B, H, W, -1)
        seg_raw = seg_raw.reshape(B, H, W, -1)

        # replicated 2D epilogue (raw head + superres), as in __call__
        n_vb = len(S.voxel_block_resolutions)
        if cfg.raw_head == "slice":
            img_raw = feature[..., :3].astype(jnp.float32)
        else:
            raw_row = S._vb_num_conv_total if cfg.vb_ref_compat else n_vb + 1
            img_raw = S._raw_rgb()(
                params["raw_rgb"], feature.astype(dt), ws[:, raw_row]
            ).astype(jnp.float32)
        img = S.superresolve(params, feature, img_raw, ws)
        if return_seg:
            return img, S._upsample_seg(seg_raw)
        return img

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_rep=False,  # axis_index breaks the replication checker; equality
        # with the single-device render is pinned by tests instead
    )
    return jax.jit(sharded)


def make_frame_sharded_chunks(
    S,  # models.generator.Ide3dSynthesisNetwork
    post,  # out_dict (synthesis return_all) -> pytree of per-frame arrays
    mesh: Optional[Mesh] = None,
    render_params=None,
    axis: str = "data",
):
    """Offline video throughput: chunk_fn(params, ws_k, cs_k) renders K frames
    — ws_k [K, num_ws, w_dim], cs_k [K, 25] — with the FRAME axis sharded over
    `mesh` (data parallelism over frames, the gen_videos contract: every frame
    is independent). Each device `lax.scan`s its K/n local frames through the
    full synthesis and applies `post` (uint8 conversion, seg colorization, …)
    on device; outputs stay frame-sharded (leading axis K) — no collective at
    all, the host pull stitches shards.

    mesh=None (or a 1-device mesh) degenerates to a plain jitted scan — the
    single-chip gen_videos path uses the same code.

    Exact-equality with the single-device scan is pinned on an 8-virtual-device
    CPU mesh (tests/test_parallel_render.py): noise_mode='const' makes every
    frame's program deterministic, so sharding cannot change the math.

    Params must be replicated over `mesh` (or uncommitted): checkpoints restore
    onto one device — `jax.device_put(params, NamedSharding(mesh, P()))` first,
    as apps/gen_videos.py does.
    """
    cfg = S.cfg
    rp = render_params or cfg.render

    def local_scan(params, ws_k, cs_k):
        def body(_, wc):
            w, c = wc
            out = S(params, w[None], c[None], render_params=rp, return_all=True)
            return None, post(out)
        _, ys = jax.lax.scan(body, None, (ws_k, cs_k))
        return ys

    if mesh is None or mesh.size == 1:
        return jax.jit(local_scan)

    n = mesh.shape[axis]
    sharded = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    fn = jax.jit(sharded)

    def chunk_fn(params, ws_k, cs_k):
        assert ws_k.shape[0] % n == 0, (
            f"chunk size {ws_k.shape[0]} not divisible by mesh axis "
            f"'{axis}' size {n}"
        )
        return fn(params, ws_k, cs_k)

    return chunk_fn
