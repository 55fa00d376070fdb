"""Semantic-aware 3D GAN training: the loop the reference never released.

The reference repo ships no IDE-3D training code ("Training scipts will be released
soon", README.md:186); this step is specced from the discriminator contract
(dual-branch D(cat[img, img_raw_up], c), apps/train_hybrid_encoder.py:302, plus the
paper's seg-conditioned D) and standard StyleGAN2 training:

  * non-saturating logistic losses,
  * R1 gradient penalty on real images via jax.grad-of-grad (replacing
    conv2d_gradfix — JAX double-backward just works),
  * G_ema tracked functionally,
  * generator-pose conditioning swap: with prob `gpc_swap_prob` the MAPPING is
    conditioned on another sample's camera while rendering (and D conditioning)
    stay at the true camera — the EG3D generator-pose-conditioning convention,
  * ADA inside the jitted D/G losses: the same per-sample transform hits real AND
    fake inputs (and, geometrically, the seg channels) — train/augment.py,
  * optional StyleGAN2 lazy path-length regularization on G (pl_weight > 0).

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
from .augment import AugmentConfig, augment_d_input


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
    # EG3D generator-pose-conditioning swap probability (mapping sees a camera
    # resampled from the batch pose distribution; rendering stays at the true c).
    gpc_swap_prob: float = 0.5
    # ADA: applied inside the D/G losses when the step's ada_p argument > 0.
    use_ada: bool = True
    aug: AugmentConfig = AugmentConfig()
    # StyleGAN2 lazy path-length regularization (0 = off).
    pl_weight: float = 0.0
    pl_interval: int = 4
    pl_decay: float = 0.01
    # G-first phase order with fake reuse: run the G update first (vs the
    # pre-step D, the stylegan2-ada phase order Gmain->Dmain), keep the fakes it
    # synthesized (stop-gradient, PRE-augmentation), and feed them to the D
    # update instead of synthesizing a second independent batch. Eliminates one
    # full G forward per step (the D phase's synth_fake). The D update then
    # scores the same z-batch the G update pushed on — the classic
    # one-z-per-step GAN schedule; ADA still draws independent augmentation
    # keys per loss. Semantics intentionally differ from fake_reuse=False
    # (which matches D-first + fresh z); both orders are standard.
    fake_reuse: bool = True


class GanTrainState(NamedTuple):
    step: jax.Array
    params_g: Any
    params_d: Any
    params_g_ema: Any
    opt_g: Any
    opt_d: Any
    pl_mean: Any = 0.0  # scalar; kept as a plain float default to avoid backend
    # initialization at import time (init_gan_state provides the array)


def expand_compact_batch(batch: Dict[str, jax.Array],
                         num_classes: int = 19) -> Dict[str, jax.Array]:
    """Wire-format batch (img uint8 [B,H,W,3], seg uint8 class indices
    [B,H,W]) -> the train-step contract (img f32 in [-1,1], seg f32 one-hot
    in {-1,1}). Jit this and run it ON DEVICE: the f32 one-hot batch is ~22x
    the compact one's bytes at 512^2 (87 MB vs 4 MB at batch 4), and shipping
    it host->device was measured as the training-loop bottleneck on a
    tunneled link (1.2 imgs/s vs the 6.1 imgs/s device-bound step; PERF.md
    round 4). The reference DataLoader likewise ships uint8 and normalizes on
    the accelerator (training_loop.py phase-data path). No-op for keys
    already in the step format, so callers can pass either layout."""
    out = dict(batch)
    img = out.get("img")
    if img is not None and img.dtype == jnp.uint8:
        out["img"] = img.astype(jnp.float32) / 127.5 - 1.0
    seg = out.get("seg")
    if seg is not None and seg.dtype == jnp.uint8:
        out["seg"] = jax.nn.one_hot(seg, num_classes, dtype=jnp.float32) * 2.0 - 1.0
    return out


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
        pl_mean=jnp.zeros(()),
    )


def pose_swap(c: Optional[jax.Array], key: jax.Array, prob: float) -> Optional[jax.Array]:
    """EG3D generator-pose conditioning: per-sample, with probability `prob`,
    replace the MAPPING-conditioning camera with another sample's camera (a roll
    of the batch = a draw from the dataset pose distribution). Rendering and D
    conditioning keep the true c."""
    if prob <= 0 or c is None:
        return c
    swap = jax.random.uniform(key, (c.shape[0], 1)) < prob
    return jnp.where(swap, jnp.roll(c, 1, axis=0), c)


def make_gan_train_step(
    G: Ide3dGenerator,
    D: Discriminator,
    tcfg: GanTrainConfig,
    mesh=None,
    split: bool = False,
):
    """Returns step(state, batch, rng) -> (state, stats).

    batch: dict(img [B,R,R,3] in [-1,1], seg [B,R,R,19] one-hot*2-1, c [B,25]).
    If `mesh` is given the step is jitted with batch sharded over 'data' and state
    replicated (single-program multi-chip; XLA handles the grad all-reduce).

    split=True compiles the D phase and the G phase as TWO chained XLA programs
    instead of one. Semantics are identical (same RNG derivation, same loss
    closures; tests/test_train.py::test_gan_train_step_split_matches_fused).
    Measured on v5e at the flagship config: 2.09 vs 1.97 imgs/s (~6% — the
    scheduling pathology PERF.md documents for the fused inference frame is
    much smaller here), plus per-phase compiled programs exposed for profiling
    (step.d_jit / step.g_jit). Dispatches pipeline on device, so the host
    boundary adds no synchronization.
    """
    opt_g, opt_d = make_optimizers(tcfg)

    def _map_ws(params_g, z, c, rng):
        """Mapping with pose-conditioning swap + style mixing."""
        k_swap, k_mix, k_z2, k_cut = jax.random.split(rng, 4)
        c_map = pose_swap(c, k_swap, tcfg.gpc_swap_prob)
        ws = G.mapping(params_g["mapping"], z, c_map)
        if tcfg.style_mixing_prob > 0:
            # StyleGAN2 mixing regularization: with prob p, rows >= cutoff come
            # from a second latent.
            z2 = jax.random.normal(k_z2, z.shape)
            ws2 = G.mapping(params_g["mapping"], z2, c_map)
            num_ws = ws.shape[1]
            cutoff = jax.random.randint(k_cut, (z.shape[0], 1), 1, num_ws)
            do_mix = (
                jax.random.uniform(k_mix, (z.shape[0], 1)) < tcfg.style_mixing_prob
            )
            rows = jnp.arange(num_ws)[None, :]
            take2 = (rows >= cutoff) & do_mix
            ws = jnp.where(take2[..., None], ws2, ws)
        return ws

    def synth_fake(params_g, z, c, rng):
        k_map, k_noise = jax.random.split(rng)
        ws = _map_ws(params_g, z, c, k_map)
        out = G.synthesis(
            params_g["synthesis"], ws, c, noise_mode="random", rng=k_noise,
            return_all=True,
        )
        return out

    def _d_triple_fake(out):
        R = out["img"].shape[1]
        raw_up = jax.image.resize(
            out["img_raw"], (out["img"].shape[0], R, R, out["img_raw"].shape[-1]),
            "bilinear",
        )
        return out["img"], raw_up, out["seg"]

    def _d_triple_real(batch):
        # Raw input for D's second branch = downsampled real image, the standard
        # dual-discrimination trick (EG3D) the IDE-3D D follows.
        real_img = batch["img"]
        rs = G.cfg.render_size
        real_raw = jax.image.resize(
            real_img, (real_img.shape[0], rs, rs, real_img.shape[-1]), "bilinear"
        )
        raw_up = jax.image.resize(real_raw, real_img.shape, "bilinear")
        return real_img, raw_up, batch["seg"]

    def _d_in(triple, ada_key, ada_p):
        """Concatenate the D input, applying ADA inside the loss (same transform
        family for real and fake; seg warped with the RGB — VERDICT item 3)."""
        img, raw_up, seg = triple
        if tcfg.use_ada and ada_key is not None:
            img, raw_up, seg = augment_d_input(ada_key, img, raw_up, seg, ada_p, tcfg.aug)
        parts = [img, raw_up]
        if tcfg.use_seg_d:
            parts.append(seg)
        return jnp.concatenate(parts, axis=-1)

    def g_loss_fn(params_g, params_d, z, c, rng, ada_p):
        k_synth, k_aug = jax.random.split(rng)
        out = synth_fake(params_g, z, c, k_synth)
        triple = _d_triple_fake(out)
        d_in = _d_in(triple, k_aug, ada_p)
        logits = D(params_d, d_in, c)
        loss = jnp.mean(jax.nn.softplus(-logits))
        aux = {"loss_g": loss, "fake_logits": logits.mean()}
        if tcfg.fake_reuse:
            # hand the PRE-augmentation fakes to the D phase (stop-gradient:
            # they are constants w.r.t. both updates there)
            aux["_fake_triple"] = jax.lax.stop_gradient(triple)
        return loss, aux

    def d_loss_fn(params_d, params_g, batch, z, rng, ada_p, fake_triple=None):
        c = batch["c"]
        k_synth, k_aug_f, k_aug_r = jax.random.split(rng, 3)
        if fake_triple is None:
            out = synth_fake(params_g, z, c, k_synth)
            fake_triple = _d_triple_fake(out)
        fake_triple = jax.lax.stop_gradient(fake_triple)
        real_triple = _d_triple_real(batch)
        B = c.shape[0]
        group_size = D._epilogue().mbstd_group_size
        if B % group_size == 0:
            # ONE batched D application over INTERLEAVED fake/real rows
            # (instead of two B-sized programs): halves D-phase program count
            # and doubles MXU batch. minibatch_stddev groups are STRIDED
            # (group of sample s = {t : t ≡ s mod n}, n = 2B/group_size), so a
            # plain concat [fake ++ real] would MIX fake and real rows inside
            # every stddev group — a silent dynamics change vs StyleGAN2-ADA
            # (round-3 VERDICT Weak #2). Interleaving (fake0, real0, fake1,
            # real1, ...) keeps every strided group single-half whenever
            # B % mbstd_group_size == 0 (then n = 2B/group_size is even and
            # group parity is constant), making the batched logits EXACTLY
            # equal to two separate D calls — pinned in
            # tests/test_train.py::test_batched_d_matches_two_calls.
            both_triple = tuple(
                jnp.stack([f, r], axis=1).reshape((-1,) + f.shape[1:])
                for f, r in zip(fake_triple, real_triple))
            d_in = _d_in(both_triple, k_aug_f, ada_p)
            logits = D(params_d, d_in, jnp.repeat(c, 2, axis=0))
            fake_logits, real_logits = logits[0::2], logits[1::2]
        else:
            # No interleave keeps the strided stddev groups single-half at
            # this batch size — fall back to the reference semantics of two
            # independent D applications (StyleGAN2-ADA loss.py run_D twice).
            fake_logits = D(params_d, _d_in(fake_triple, k_aug_f, ada_p), c)
            real_logits = D(params_d, _d_in(real_triple, k_aug_r, ada_p), c)
        loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(jax.nn.softplus(-real_logits))
        return loss, {
            "loss_d": loss,
            "real_logits": real_logits.mean(),
            # per-sample sign statistic for the ADA controller (mean over the
            # GLOBAL batch under jit; augment.ada_accumulate consumes it)
            "real_signs": jnp.sign(real_logits).mean(),
        }

    def r1_penalty_fn(params_d, batch, ada_key, ada_p):
        """R1 = E||grad_x D(aug(x_real))||^2, differentiated w.r.t. D's params —
        the double-backward that needed conv2d_gradfix in torch (SURVEY.md §2.2)
        and is native jax.grad-of-grad here. The gradient is taken w.r.t. the
        PRE-augmentation inputs THROUGH the ADA pipe — stylegan2-ada's Dr1
        branch runs run_D (which augments) on the requires_grad real image, so
        the penalty regularizes D on the same augmented manifold it is trained
        on (stylegan2-ada loss.py)."""
        c = batch["c"]
        triple = _d_triple_real(batch)

        def d_sum(img, raw_up, seg):
            real_in = _d_in((img, raw_up, seg), ada_key, ada_p)
            return D(params_d, real_in, c).sum()

        grads = jax.grad(d_sum, argnums=(0, 1, 2))(*triple)
        sq = sum(jnp.sum(jnp.square(g)) for g in grads)
        return sq / triple[0].shape[0]

    def pl_penalty_fn(params_g, z, c, rng, pl_mean):
        """StyleGAN2 path-length regularization: ws-jacobian norm of the synthesis
        output pulled toward its running mean. Returns (penalty, new_pl_lengths)."""
        k_map, k_noise, k_y = jax.random.split(rng, 3)
        ws = _map_ws(params_g, z, c, k_map)

        def synth_ws(ws_in):
            img = G.synthesis(
                params_g["synthesis"], ws_in, c, noise_mode="random", rng=k_noise
            )
            noise = jax.random.normal(k_y, img.shape) / jnp.sqrt(
                jnp.asarray(img.shape[1] * img.shape[2], jnp.float32)
            )
            return jnp.sum(img * noise)

        grads = jax.grad(synth_ws)(ws)
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grads), axis=2), axis=1))
        penalty = jnp.mean(jnp.square(pl_lengths - pl_mean))
        return penalty, pl_lengths.mean()

    # --- phase bodies. BOTH phases derive their keys from the SAME 6-way split
    # of the step rng, so fused and split execution are bit-identical.

    def d_phase(params_d, opt_d_state, step_i, params_g, batch, rng, ada_p,
                fake_triple=None):
        """D update: loss grads + lazy R1 + Adam. Returns (params_d, opt_d, stats).

        With tcfg.fake_reuse the G phase's stop-gradient fakes arrive via
        `fake_triple` and no synthesis runs here (params_g is unused)."""
        # uint8 wire batches expand on device (fused into this program; no-op
        # for f32 batches) — see expand_compact_batch.
        batch = expand_compact_batch(batch, G.cfg.seg_channels)
        _kz_g, kz_d, _kr_g, kr_d, _kr_pl, kr_r1 = jax.random.split(rng, 6)
        B = batch["img"].shape[0]
        # z is only consumed when the D phase synthesizes its own fakes; with
        # fake_reuse the G phase's stop-gradient fakes arrive via fake_triple
        # and drawing z here would be dead compute in the compiled program.
        z_d = (None if fake_triple is not None
               else jax.random.normal(kz_d, (B, G.cfg.z_dim)))
        ada_p = jnp.asarray(ada_p, jnp.float32)

        # lazy R1: full-strength penalty every r1_interval steps (StyleGAN2
        # lazy regularization; both cond branches compile once).
        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            params_d, params_g, batch, z_d, kr_d, ada_p, fake_triple
        )

        def with_r1(grads):
            r1_val, r1_grads = jax.value_and_grad(r1_penalty_fn)(
                params_d, batch, kr_r1, ada_p)
            scale = tcfg.r1_gamma / 2.0 * tcfg.r1_interval
            grads = jax.tree_util.tree_map(lambda g, r: g + scale * r, grads, r1_grads)
            return grads, r1_val

        def without_r1(grads):
            return grads, jnp.zeros(())

        apply_r1 = (step_i % tcfg.r1_interval) == 0
        d_grads, r1_val = jax.lax.cond(apply_r1, with_r1, without_r1, d_grads)
        d_stats = {**d_stats, "r1_penalty": r1_val}

        updates_d, opt_d_state = opt_d.update(d_grads, opt_d_state, params_d)
        params_d = optax.apply_updates(params_d, updates_d)
        return params_d, opt_d_state, d_stats

    def g_phase(params_g, opt_g_state, ema, pl_mean, step_i, params_d, batch,
                rng, ada_p):
        """G update vs the UPDATED D, + lazy PL reg, w_avg EMA, G_ema.

        Returns (params_g, opt_g, ema, pl_mean, stats)."""
        batch = expand_compact_batch(batch, G.cfg.seg_channels)
        kz_g, _kz_d, kr_g, _kr_d, kr_pl, _kr_r1 = jax.random.split(rng, 6)
        B = batch["img"].shape[0]
        z_g = jax.random.normal(kz_g, (B, G.cfg.z_dim))
        ada_p = jnp.asarray(ada_p, jnp.float32)

        (g_loss, g_stats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            params_g, params_d, z_g, batch["c"], kr_g, ada_p
        )
        fake_triple = g_stats.pop("_fake_triple", None)

        # --- lazy path-length regularization (StyleGAN2; off when pl_weight == 0)
        pl_mean = jnp.asarray(pl_mean, jnp.float32)
        if tcfg.pl_weight > 0:

            def with_pl(args):
                grads, pl_mean_in = args
                (pl_val, pl_len), pl_grads = jax.value_and_grad(
                    pl_penalty_fn, has_aux=True
                )(params_g, z_g, batch["c"], kr_pl, pl_mean_in)
                scale = tcfg.pl_weight * tcfg.pl_interval
                grads = jax.tree_util.tree_map(
                    lambda g, r: g + scale * r, grads, pl_grads
                )
                new_mean = pl_mean_in + tcfg.pl_decay * (pl_len - pl_mean_in)
                return grads, pl_val, new_mean

            def without_pl(args):
                grads, pl_mean_in = args
                return grads, jnp.zeros(()), pl_mean_in

            apply_pl = (step_i % tcfg.pl_interval) == 0
            g_grads, pl_val, pl_mean = jax.lax.cond(
                apply_pl, with_pl, without_pl, (g_grads, pl_mean)
            )
            g_stats = {**g_stats, "pl_penalty": pl_val}

        updates_g, opt_g_state = opt_g.update(g_grads, opt_g_state, params_g)
        new_params_g = optax.apply_updates(params_g, updates_g)

        # --- w_avg EMA (functional replacement of the mapping buffer update,
        # networks.py:307-310; needed for truncation at inference time)
        w_batch = G.mapping(new_params_g["mapping"], z_g, batch["c"], broadcast=False)
        new_w_avg = jax.lax.stop_gradient(w_batch.mean(axis=0)) * (
            1.0 - tcfg.w_avg_beta
        ) + new_params_g["mapping"]["w_avg"] * tcfg.w_avg_beta
        new_params_g = {
            **new_params_g,
            "mapping": {**new_params_g["mapping"], "w_avg": new_w_avg},
        }

        # --- EMA
        ema = jax.tree_util.tree_map(
            lambda e, p: e * tcfg.ema_beta + p * (1.0 - tcfg.ema_beta),
            ema,
            new_params_g,
        )
        if tcfg.fake_reuse:
            return new_params_g, opt_g_state, ema, pl_mean, g_stats, fake_triple
        return new_params_g, opt_g_state, ema, pl_mean, g_stats

    def step(
        state: GanTrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        ada_p: jax.Array = 0.0,
    ):
        if tcfg.fake_reuse:
            # G-first (stylegan2-ada phase order): G updates vs the pre-step D,
            # then D trains on the same (stop-gradient) fakes — one synthesis.
            params_g, opt_g_state, ema, pl_mean, g_stats, fakes = g_phase(
                state.params_g, state.opt_g, state.params_g_ema, state.pl_mean,
                state.step, state.params_d, batch, rng, ada_p)
            params_d, opt_d_state, d_stats = d_phase(
                state.params_d, state.opt_d, state.step, params_g, batch,
                rng, ada_p, fakes)
        else:
            params_d, opt_d_state, d_stats = d_phase(
                state.params_d, state.opt_d, state.step, state.params_g, batch,
                rng, ada_p)
            params_g, opt_g_state, ema, pl_mean, g_stats = g_phase(
                state.params_g, state.opt_g, state.params_g_ema, state.pl_mean,
                state.step, params_d, batch, rng, ada_p)

        stats = {**d_stats, **g_stats}
        new_state = GanTrainState(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_g_ema=ema,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            pl_mean=pl_mean,
        )
        return new_state, stats

    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        # batch dim sharded over EVERY mesh axis: identical on the 1-D 'data'
        # mesh, and on a ('slice', 'data') multi-slice mesh the grad all-reduce
        # decomposes into ICI + DCN stages (parallel/mesh.py dp_spec)
        data = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    if not split:
        if mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        return jax.jit(
            step,
            in_shardings=(repl, data, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    # --- split compilation: one program per phase, chained by the host. The
    # device executes programs in dispatch order, so the first program has
    # finished reading any buffer the second donates; no extra synchronization.
    # step_i is passed to both programs and incremented on device in the LAST
    # program's tail (avoiding a per-step eager scalar op, which is a full
    # dispatch on the tunneled backend).

    if tcfg.fake_reuse:
        # G-first order: g_jit produces the (data-sharded) fake triple, d_jit
        # consumes it and increments the step counter.
        def d_phase_inc(params_d, opt_d_state, step_i, params_g, batch, rng,
                        ada_p, fake_triple):
            out = d_phase(params_d, opt_d_state, step_i, params_g, batch, rng,
                          ada_p, fake_triple)
            return out + (step_i + 1,)

        if mesh is None:
            g_jit = jax.jit(g_phase, donate_argnums=(0, 1, 2, 3))
            d_jit = jax.jit(d_phase_inc, donate_argnums=(0, 1))
        else:
            g_jit = jax.jit(
                g_phase,
                in_shardings=(repl, repl, repl, repl, repl, repl, data, repl,
                              repl),
                out_shardings=(repl, repl, repl, repl, repl, data),
                donate_argnums=(0, 1, 2, 3),
            )
            d_jit = jax.jit(
                d_phase_inc,
                in_shardings=(repl, repl, repl, repl, data, repl, repl, data),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1),
            )

        def step_split(
            state: GanTrainState,
            batch: Dict[str, jax.Array],
            rng: jax.Array,
            ada_p: jax.Array = 0.0,
        ):
            params_g, opt_g_state, ema, pl_mean, g_stats, fakes = g_jit(
                state.params_g, state.opt_g, state.params_g_ema, state.pl_mean,
                state.step, state.params_d, batch, rng, ada_p)
            params_d, opt_d_state, d_stats, new_step = d_jit(
                state.params_d, state.opt_d, state.step, params_g, batch,
                rng, ada_p, fakes)
            new_state = GanTrainState(
                step=new_step,
                params_g=params_g,
                params_d=params_d,
                params_g_ema=ema,
                opt_g=opt_g_state,
                opt_d=opt_d_state,
                pl_mean=pl_mean,
            )
            return new_state, {**d_stats, **g_stats}

        step_split.d_jit = d_jit
        step_split.g_jit = g_jit
        return step_split

    def g_phase_inc(params_g, opt_g_state, ema, pl_mean, step_i, params_d,
                    batch, rng, ada_p):
        out = g_phase(params_g, opt_g_state, ema, pl_mean, step_i, params_d,
                      batch, rng, ada_p)
        return out + (step_i + 1,)

    if mesh is None:
        d_jit = jax.jit(d_phase, donate_argnums=(0, 1))
        g_jit = jax.jit(g_phase_inc, donate_argnums=(0, 1, 2, 3))
    else:
        d_jit = jax.jit(
            d_phase,
            in_shardings=(repl, repl, repl, repl, data, repl, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
        g_jit = jax.jit(
            g_phase_inc,
            in_shardings=(repl, repl, repl, repl, repl, repl, data, repl, repl),
            out_shardings=(repl, repl, repl, repl, repl, repl),
            donate_argnums=(0, 1, 2, 3),
        )

    def step_split(
        state: GanTrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        ada_p: jax.Array = 0.0,
    ):
        params_d, opt_d_state, d_stats = d_jit(
            state.params_d, state.opt_d, state.step, state.params_g, batch,
            rng, ada_p)
        params_g, opt_g_state, ema, pl_mean, g_stats, new_step = g_jit(
            state.params_g, state.opt_g, state.params_g_ema, state.pl_mean,
            state.step, params_d, batch, rng, ada_p)
        new_state = GanTrainState(
            step=new_step,
            params_g=params_g,
            params_d=params_d,
            params_g_ema=ema,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            pl_mean=pl_mean,
        )
        return new_state, {**d_stats, **g_stats}

    # expose the compiled phases for profiling (tools/profile_train_step.py)
    step_split.d_jit = d_jit
    step_split.g_jit = g_jit
    return step_split
