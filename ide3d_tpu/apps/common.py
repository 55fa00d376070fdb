"""Shared CLI plumbing for the apps layer."""

from __future__ import annotations

import re
from typing import List, Union

import numpy as np


def parse_range(s: Union[str, List[int]]) -> List[int]:
    """'1,2,5-10' -> [1,2,5,...,10] (CLI contract: gen_images.py:18-32)."""
    if isinstance(s, list):
        return s
    ranges: List[int] = []
    range_re = re.compile(r"^(\d+)-(\d+)$")
    for p in s.split(","):
        m = range_re.match(p)
        if m:
            ranges.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            ranges.append(int(p))
    return ranges


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1), grid=None):
    """images [N, H, W, C] -> single PNG grid."""
    import PIL.Image

    lo, hi = drange
    img = (images - lo) / (hi - lo) * 255.0
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    n, h, w, c = img.shape
    if grid is None:
        gw = int(np.ceil(np.sqrt(n)))
        gh = int(np.ceil(n / gw))
    else:
        gw, gh = grid
    canvas = np.zeros((gh * h, gw * w, c), dtype=np.uint8)
    for i in range(n):
        y, x = divmod(i, gw)
        canvas[y * h : (y + 1) * h, x * w : (x + 1) * w] = img[i]
    if c == 1:
        canvas = canvas[..., 0]
    PIL.Image.fromarray(canvas).save(path)


def write_video(path: str, frames, fps: int = 24):
    """Write an RGB uint8 frame list to disk. Tries imageio (needs an ffmpeg
    backend), then OpenCV's mp4 writer, then falls back to an animated GIF next
    to the requested path. Returns the path actually written."""
    import os

    frames = [np.ascontiguousarray(f) for f in frames]
    try:
        # gate on the ffmpeg backend: without it imageio falls back to a PIL
        # writer that dies at GC time with "unknown file extension" (an
        # unraisable warning in tests), so don't even construct it
        import imageio_ffmpeg  # noqa: F401
        import imageio

        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        assert vw.isOpened()
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
    except Exception:
        pass
    import PIL.Image

    gif = os.path.splitext(path)[0] + ".gif"
    imgs = [PIL.Image.fromarray(f) for f in frames]
    imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return gif


def load_generator(network: str):
    """Load a generator from a native checkpoint dir, or build a fresh one for
    `random:<seed>` specs (until pretrained weights are importable)."""
    import jax

    from ..models import GeneratorConfig, Ide3dGenerator

    if network.startswith("random"):
        parts = network.split(":")
        seed = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        # `random:<seed>[:tiny|small]` — reduced configs (matching the
        # train_gan presets) for CPU-mesh machinery runs (e.g. sharded 50k
        # metric extraction) where the flagship G would be CPU-prohibitive.
        preset = parts[2] if len(parts) > 2 else "full"
        from ..render.renderer import RenderParams

        if preset == "tiny":
            cfg = GeneratorConfig(
                img_resolution=32, render_size=8, plane_resolution=16,
                channel_base=512, channel_max=32, sr_channel_base=256,
                sr_channel_max=16, feature_channels=8, dtype="float32",
                render=RenderParams(img_size=8, num_steps=4))
        elif preset == "small":
            cfg = GeneratorConfig(
                img_resolution=64, render_size=16, plane_resolution=64,
                channel_base=8192, channel_max=128, sr_channel_base=4096,
                sr_channel_max=64, feature_channels=16, dtype="float32",
                render=RenderParams(img_size=16, num_steps=12))
        else:
            cfg = GeneratorConfig()
        G = Ide3dGenerator(cfg)
        # jit the init: one compiled program instead of hundreds of tunneled dispatches
        params = jax.jit(G.init)(jax.random.PRNGKey(seed))
        return G, params

    from ..io.checkpoint import config_from_jsonable, load_checkpoint

    params, meta = load_checkpoint(network)
    cfg = config_from_jsonable(meta.get("config") or {})
    if not isinstance(cfg, GeneratorConfig):
        cfg = GeneratorConfig()
    G = Ide3dGenerator(cfg)
    if "G_ema" in params:
        params = params["G_ema"]
    return G, params


def make_e4e_pivot_fn(G, ckpt: str, variant: str = "auto"):
    """One-shot e4e pivot function img [B,H,W,3] in [-1,1] -> w+ [B,num_ws,512].

    The reference E4ELatentCreator resizes to the e4e's 256^2 input and adds the
    decoder latent average (e4e_latent_creator.py:14-17); the produced w+ depth
    is the e4e DECODER's, so rows are broadcast/truncated onto this G's num_ws
    (shared by run_pti's first-stage pivots and latent_creator's e4e leg)."""
    import jax
    import jax.numpy as jnp

    from ..models.e4e import load_e4e, pivot_from_image

    model, params, w_avg, report = load_e4e(ckpt, variant=variant)
    num_ws = G.num_ws

    @jax.jit
    def pivot(img):
        x = jax.image.resize(img, (img.shape[0], 256, 256, 3), "bilinear")
        w = pivot_from_image(model, params, w_avg, x)
        if w.shape[1] < num_ws:
            w = jnp.concatenate(
                [w, jnp.repeat(w[:, -1:], num_ws - w.shape[1], axis=1)], axis=1)
        return w[:, :num_ws]

    return pivot, report
