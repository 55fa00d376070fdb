"""Hybrid-encoder training: one jitted step covering both reference branches.

Reference loop: apps/train_hybrid_encoder.py:155-392 —
  * synthetic branch (:254-289): z -> G -> (img, BiSeNet pseudo-mask) -> E ->
    losses: 50*smoothL1(ws), l2*MSE(reconstruction), entropy*CE(BiSeNet(rec) vs
    BiSeNet(gen)), cycle*smoothL1(re-encoded ws),
  * real branch (:292-334): dataset (img, seg, label) -> E -> G(return_raw) ->
    vgg + l2 + lpips + id + entropy + cycle.

TPU design: both branches live in ONE loss function -> one fwd/bwd XLA program;
G and BiSeNet params are frozen (stop_gradient'd held constants), E trains with
Adam(1e-4, betas (0.9, 0.99)) (reference :213). Perceptual/ID losses are injected
as feature callbacks (None = disabled, e.g. before torch weight import).
Parallelism: pure DP — batch sharded on the mesh 'data' axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.bisenet import BiSeNet
from ..models.encoder import HybridEncoder
from ..models.generator import Ide3dGenerator
from ..utils.seg import id_remap
from . import losses as L


@dataclasses.dataclass(frozen=True)
class EncoderTrainConfig:
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.99
    w_ws: float = 50.0
    w_l2: float = 1.0
    w_entropy: float = 1.0
    w_cycle: float = 1.0
    w_vgg: float = 1.0
    w_lpips: float = 1.0
    w_id: float = 1.0
    truncation: float = 1.0
    train_gen: bool = True  # synthetic branch
    train_real: bool = True  # real branch
    start_from_latent_avg: bool = True


class EncoderTrainState(NamedTuple):
    step: jax.Array
    params_e: Any
    opt_e: Any


def init_encoder_state(key: jax.Array, E: HybridEncoder, tcfg: EncoderTrainConfig):
    params_e = E.init(key)
    opt = optax.adam(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2)
    return EncoderTrainState(jnp.zeros((), jnp.int32), params_e, opt.init(params_e))


def make_encoder_train_step(
    E: HybridEncoder,
    G: Ide3dGenerator,
    tcfg: EncoderTrainConfig,
    bisenet: Optional[BiSeNet] = None,
    vgg_feats: Optional[Callable] = None,  # x -> [feature maps]
    lpips_fn: Optional[Callable] = None,  # (x, y) -> per-sample distances
    id_embed: Optional[Callable] = None,  # x -> embeddings
    mesh=None,
):
    """Returns step(state, g_params, bisenet_params, batch, rng) -> (state, stats).

    g_params/bisenet_params are frozen (the reference loads G_ema/D/BiSeNet frozen,
    train_hybrid_encoder.py:192-208). batch: dict(img, seg, c) or None fields when a
    branch is disabled.
    """
    opt = optax.adam(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2)

    def parse_seg(bp, img):
        """BiSeNet pseudo-parsing -> (ids [B,H,W], onehot*2-1 [B,H,W,19])
        (dnnlib/seg_tools.py:101-124 parsing_img + face_parsing)."""
        logits20 = bisenet(bp, img)
        ids20 = jnp.argmax(logits20, axis=-1)
        ids19 = id_remap(ids20)
        onehot = jax.nn.one_hot(ids19, 19, dtype=jnp.float32)
        return ids19, onehot * 2.0 - 1.0, logits20

    def e_forward(params_e, img, seg, g_params):
        ws = E(params_e, img, seg)
        if tcfg.start_from_latent_avg:
            ws = ws + g_params["mapping"]["w_avg"][None, None, :]
        return ws

    def loss_fn(params_e, g_params, bp, batch, rng):
        # uint8 wire batches expand on device (fused; no-op for f32 batches)
        from .gan import expand_compact_batch

        batch = expand_compact_batch(batch, G.cfg.seg_channels)
        stats: Dict[str, jax.Array] = {}
        total = jnp.zeros(())
        k_z, k_noise = jax.random.split(rng)

        if tcfg.train_gen:
            B = batch["c"].shape[0]
            z = jax.random.normal(k_z, (B, G.cfg.z_dim))
            w_samples = G.mapping(g_params["mapping"], z, batch["c"])
            if tcfg.truncation < 1.0:
                w_avg = g_params["mapping"]["w_avg"][None, None, :]
                w_samples = w_avg + (w_samples - w_avg) * tcfg.truncation
            w_samples = jax.lax.stop_gradient(w_samples)
            gen_img, gen_seg = G.synthesis(
                g_params["synthesis"], w_samples, batch["c"], return_seg=True
            )
            gen_img = jax.lax.stop_gradient(gen_img)
            if bisenet is not None:
                gen_ids, gen_seg_pm, _ = parse_seg(bp, gen_img)
                gen_seg_pm = jax.lax.stop_gradient(gen_seg_pm)
            else:
                # no face parser available: pseudo-mask from the generator's own
                # semantic branch (argmax one-hot, {-1,1})
                ids = jnp.argmax(jax.lax.stop_gradient(gen_seg), axis=-1)
                gen_ids = ids
                gen_seg_pm = jax.nn.one_hot(ids, gen_seg.shape[-1]) * 2.0 - 1.0

            rec_ws = e_forward(params_e, gen_img, gen_seg_pm, g_params)
            loss_ws = L.smooth_l1(rec_ws, w_samples) * tcfg.w_ws
            stats["loss_ws"] = loss_ws
            total = total + loss_ws

            rec_img = G.synthesis(g_params["synthesis"], rec_ws, batch["c"])
            loss_l2 = L.l2(rec_img, gen_img) * tcfg.w_l2
            stats["loss_gen_l2"] = loss_l2
            total = total + loss_l2

            if bisenet is not None:
                _, rec_seg_pm, rec_logits = parse_seg(bp, rec_img)
                ce = L.cross_entropy_seg(rec_logits, jnp.argmax(
                    jax.lax.stop_gradient(bisenet(bp, gen_img)), axis=-1)) * tcfg.w_entropy
                stats["loss_gen_entropy"] = ce
                total = total + ce
                # cycle: re-encode the reconstruction's parsed seg
                cyc_ws = e_forward(params_e, gen_img, rec_seg_pm, g_params)
                cyc = L.smooth_l1(jax.lax.stop_gradient(rec_ws), cyc_ws) * tcfg.w_cycle
                stats["loss_cycle"] = cyc
                total = total + cyc

        if tcfg.train_real and "img" in batch:
            real_img, real_seg, real_c = batch["img"], batch["seg"], batch["c"]
            rec_ws = e_forward(params_e, real_img, real_seg, g_params)
            rec_img = G.synthesis(g_params["synthesis"], rec_ws, real_c)
            loss_l2 = L.l2(rec_img, real_img) * tcfg.w_l2
            stats["loss_real_l2"] = loss_l2
            total = total + loss_l2

            if vgg_feats is not None:
                v = L.multiscale_feature_loss(vgg_feats, rec_img, real_img) * tcfg.w_vgg
                stats["loss_vgg"] = v
                total = total + v
            if lpips_fn is not None:
                lp = jnp.mean(lpips_fn(rec_img, jax.lax.stop_gradient(real_img))) * tcfg.w_lpips
                stats["loss_lpips"] = lp
                total = total + lp
            if id_embed is not None:
                idl = L.cosine_id_loss(id_embed, rec_img, real_img) * tcfg.w_id
                stats["loss_id"] = idl
                total = total + idl
            if bisenet is not None:
                real_ids = jnp.argmax(jax.lax.stop_gradient(bisenet(bp, real_img)), axis=-1)
                _, rec_seg_pm, rec_logits = parse_seg(bp, rec_img)
                ce = L.cross_entropy_seg(rec_logits, real_ids) * tcfg.w_entropy
                stats["loss_real_entropy"] = ce
                total = total + ce
                cyc_ws = e_forward(params_e, real_img, rec_seg_pm, g_params)
                cyc = L.smooth_l1(jax.lax.stop_gradient(rec_ws), cyc_ws) * tcfg.w_cycle
                stats["loss_real_cycle"] = cyc
                total = total + cyc

        stats["loss_total"] = total
        return total, stats

    def step(state: EncoderTrainState, g_params, bp, batch, rng):
        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_e, g_params, bp, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_e, state.params_e)
        params_e = optax.apply_updates(state.params_e, updates)
        return EncoderTrainState(state.step + 1, params_e, opt_state), stats

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    # batch dim sharded over EVERY mesh axis: identical on the 1-D 'data'
    # mesh, and on a ('slice', 'data') multi-slice mesh the grad all-reduce
    # decomposes into ICI + DCN stages (parallel/mesh.py dp_spec)
    data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
