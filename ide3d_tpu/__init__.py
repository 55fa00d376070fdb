"""ide3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
MrTornado24/IDE-3D (SIGGRAPH Asia 2022): a semantic-aware 3D portrait GAN with
hybrid GAN inversion and interactive semantic-mask editing.

This is a ground-up redesign for TPU hardware, NOT a port:
  * channels-last (NHWC) layouts everywhere so the channel axis rides the 128-lane VPU/MXU,
  * modulated convolutions executed as ONE batched conv with input/output scaling
    (mathematically identical to the reference's per-sample grouped-conv trick,
    reference: inversion/networks.py:55-130) — no per-sample weights, MXU-friendly,
  * FIR resampling (upfirdn2d) as a single `lax.conv_general_dilated` call
    (reference CUDA kernel: torch_utils/ops/upfirdn2d.cu),
  * a fused Pallas tri-plane gather + ray-march path for the volume renderer,
  * one `jax.sharding.Mesh` + `pjit`/`shard_map` for all parallelism (replacing
    the reference's gloo/NCCL DDP; see apps/train_hybrid_encoder.py:45-50).

Package layout:
  ops/       kernel layer (bias_act, upfirdn2d, modulated conv, grid/tri-plane sampling, Pallas kernels)
  render/    camera + volumetric rendering math (training/volumetric_rendering.py contract)
  models/    network family (mapping, synthesis, dual-path seg blocks, G/D, encoders, BiSeNet)
  parallel/  mesh construction, sharding rules, cross-device stats
  io/        checkpointing (native) + torch-pickle weight import
  data/      dataset pipeline (zip/dir images + 19-ch seg + 25-dim camera labels)
  train/     training steps (encoder, GAN, PTI inversion)
  metrics/   FID/KID/PR/PPL/IS evaluation
  apps/      CLI entry points (gen_images, gen_videos, extract_shapes, painter backend, ...)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the first compile of the full pipeline takes
# minutes (especially over a tunneled TPU); caching makes every subsequent process
# start in seconds. Disable with IDE3D_TPU_NO_CACHE=1.
import os as _os

if not _os.environ.get("IDE3D_TPU_NO_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "IDE3D_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/ide3d_tpu_xla")
    )
    try:
        # Respect an already-configured cache (tests point at their own dir), and
        # keep CPU / TPU entries separate — mixing them makes XLA load AOT results
        # compiled for a different machine (SIGILL risk).
        if getattr(_jax.config, "jax_compilation_cache_dir", None) is None:
            _platform_tag = _os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
            _cache_dir = _os.path.join(_cache_dir, _platform_tag or "default")
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
