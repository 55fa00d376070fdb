"""Semantic-aware 3D GAN training: the loop the reference never released.

The reference repo ships no IDE-3D training code ("Training scipts will be released
soon", README.md:186); this step is specced from the discriminator contract
(dual-branch D(cat[img, img_raw_up], c), apps/train_hybrid_encoder.py:302, plus the
paper's seg-conditioned D) and standard StyleGAN2 training:

  * non-saturating logistic losses,
  * R1 gradient penalty on real images via jax.grad-of-grad (replacing
    conv2d_gradfix — JAX double-backward just works),
  * G_ema tracked functionally,
  * generator-pose conditioning swap (generator renders at a camera resampled from
    the dataset pose distribution — the EG3D/IDE-3D convention).

Parallelism: pure DP over the mesh 'data' axis; the step is jitted with batch
sharded on dim 0 and params replicated — XLA inserts the gradient all-reduce that
DDP did in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import Discriminator, DiscriminatorConfig
from ..models.generator import GeneratorConfig, Ide3dGenerator


@dataclasses.dataclass(frozen=True)
class GanTrainConfig:
    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    r1_gamma: float = 1.0
    r1_interval: int = 16
    ema_beta: float = 0.998
    use_seg_d: bool = True  # D also sees the semantic channels (paper Sec. 3.2)
    style_mixing_prob: float = 0.9  # StyleGAN2 mixing regularization
    w_avg_beta: float = 0.995  # mapping w_avg EMA (networks.py:257)


class GanTrainState(NamedTuple):
    step: jax.Array
    params_g: Any
    params_d: Any
    params_g_ema: Any
    opt_g: Any
    opt_d: Any


def d_input_channels(tcfg: GanTrainConfig, gcfg: GeneratorConfig) -> int:
    ch = gcfg.img_channels * 2  # rgb ++ upsampled raw rgb
    if tcfg.use_seg_d:
        ch += gcfg.seg_channels
    return ch


def make_optimizers(tcfg: GanTrainConfig):
    opt_g = optax.adam(tcfg.g_lr, b1=tcfg.beta1, b2=tcfg.beta2)
    opt_d = optax.adam(tcfg.d_lr, b1=tcfg.beta1, b2=tcfg.beta2)
    return opt_g, opt_d


def init_gan_state(
    key: jax.Array, G: Ide3dGenerator, D: Discriminator, tcfg: GanTrainConfig
) -> GanTrainState:
    kg, kd = jax.random.split(key)
    params_g = G.init(kg)
    params_d = D.init(kd)
    opt_g, opt_d = make_optimizers(tcfg)
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        params_g_ema=jax.tree_util.tree_map(jnp.copy, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
    )


def _d_input(tcfg: GanTrainConfig, img, img_raw, seg):
    R = img.shape[1]
    raw_up = jax.image.resize(img_raw, (img.shape[0], R, R, img_raw.shape[-1]), "bilinear")
    parts = [img, raw_up]
    if tcfg.use_seg_d:
        parts.append(seg)
    return jnp.concatenate(parts, axis=-1)


def make_gan_train_step(
    G: Ide3dGenerator,
    D: Discriminator,
    tcfg: GanTrainConfig,
    mesh=None,
):
    """Returns step(state, batch, rng) -> (state, stats).

    batch: dict(img [B,R,R,3] in [-1,1], seg [B,R,R,19] one-hot*2-1, c [B,25]).
    If `mesh` is given the step is jitted with batch sharded over 'data' and state
    replicated (single-program multi-chip; XLA handles the grad all-reduce).
    """
    opt_g, opt_d = make_optimizers(tcfg)

    def synth_fake(params_g, z, c, rng):
        k_mix, k_z2, k_cut, k_noise = jax.random.split(rng, 4)
        ws = G.mapping(params_g["mapping"], z, c)
        if tcfg.style_mixing_prob > 0:
            # StyleGAN2 mixing regularization: with prob p, rows >= cutoff come
            # from a second latent.
            z2 = jax.random.normal(k_z2, z.shape)
            ws2 = G.mapping(params_g["mapping"], z2, c)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_cut, (z.shape[0], 1), 1, num_ws)
            do_mix = (
                jax.random.uniform(k_mix, (z.shape[0], 1)) < tcfg.style_mixing_prob
            )
            rows = jnp.arange(num_ws)[None, :]
            take2 = (rows >= cutoff) & do_mix
            ws = jnp.where(take2[..., None], ws2, ws)
        out = G.synthesis(
            params_g["synthesis"], ws, c, noise_mode="random", rng=k_noise,
            return_all=True,
        )
        return out

    def g_loss_fn(params_g, params_d, z, c, rng):
        out = synth_fake(params_g, z, c, rng)
        d_in = _d_input(tcfg, out["img"], out["img_raw"], out["seg"])
        logits = D(params_d, d_in, c)
        loss = jnp.mean(jax.nn.softplus(-logits))
        return loss, {"loss_g": loss, "fake_logits": logits.mean()}

    def _real_input(batch):
        # Raw input for D's second branch = downsampled real image, the standard
        # dual-discrimination trick (EG3D) the IDE-3D D follows.
        real_img = batch["img"]
        rs = G.cfg.render_size
        real_raw = jax.image.resize(
            real_img, (real_img.shape[0], rs, rs, real_img.shape[-1]), "bilinear"
        )
        return _d_input(tcfg, real_img, real_raw, batch["seg"])

    def d_loss_fn(params_d, params_g, batch, z, rng):
        c = batch["c"]
        out = synth_fake(params_g, z, c, rng)
        fake_in = _d_input(tcfg, out["img"], out["img_raw"], out["seg"])
        fake_logits = D(params_d, jax.lax.stop_gradient(fake_in), c)
        real_logits = D(params_d, _real_input(batch), c)
        loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(jax.nn.softplus(-real_logits))
        return loss, {"loss_d": loss, "real_logits": real_logits.mean()}

    def r1_penalty_fn(params_d, batch):
        """R1 = E||grad_x D(x_real)||^2, differentiated w.r.t. D's params — the
        double-backward that needed conv2d_gradfix in torch (SURVEY.md §2.2) and is
        native jax.grad-of-grad here."""
        real_in = _real_input(batch)
        c = batch["c"]

        def d_sum(x):
            return D(params_d, x, c).sum()

        grad_x = jax.grad(d_sum)(real_in)
        return jnp.sum(jnp.square(grad_x)) / real_in.shape[0]

    def step(state: GanTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        kz_g, kz_d, kr_g, kr_d = jax.random.split(rng, 4)
        B = batch["img"].shape[0]
        z_g = jax.random.normal(kz_g, (B, G.cfg.z_dim))
        z_d = jax.random.normal(kz_d, (B, G.cfg.z_dim))

        # --- D step with lazy R1 (full-strength penalty every r1_interval steps,
        # StyleGAN2 lazy regularization; both cond branches compile once).
        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d, state.params_g, batch, z_d, kr_d
        )

        def with_r1(grads):
            r1_val, r1_grads = jax.value_and_grad(r1_penalty_fn)(state.params_d, batch)
            scale = tcfg.r1_gamma / 2.0 * tcfg.r1_interval
            grads = jax.tree_util.tree_map(lambda g, r: g + scale * r, grads, r1_grads)
            return grads, r1_val

        def without_r1(grads):
            return grads, jnp.zeros(())

        apply_r1 = (state.step % tcfg.r1_interval) == 0
        d_grads, r1_val = jax.lax.cond(apply_r1, with_r1, without_r1, d_grads)
        d_stats = {**d_stats, "r1_penalty": r1_val}

        updates_d, opt_d_state = opt_d.update(d_grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # --- G step
        (g_loss, g_stats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g, params_d, z_g, batch["c"], kr_g
        )
        updates_g, opt_g_state = opt_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        # --- w_avg EMA (functional replacement of the mapping buffer update,
        # networks.py:307-310; needed for truncation at inference time)
        w_batch = G.mapping(params_g["mapping"], z_g, batch["c"], broadcast=False)
        new_w_avg = jax.lax.stop_gradient(w_batch.mean(axis=0)) * (
            1.0 - tcfg.w_avg_beta
        ) + params_g["mapping"]["w_avg"] * tcfg.w_avg_beta
        params_g = {
            **params_g,
            "mapping": {**params_g["mapping"], "w_avg": new_w_avg},
        }

        # --- EMA
        ema = jax.tree_util.tree_map(
            lambda e, p: e * tcfg.ema_beta + p * (1.0 - tcfg.ema_beta),
            state.params_g_ema,
            params_g,
        )

        stats = {**d_stats, **g_stats}
        new_state = GanTrainState(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_g_ema=ema,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
        )
        return new_state, stats

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
