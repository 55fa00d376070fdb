"""Painter backend: the interactive semantic-mask editing loop.

Reference product loop (Painter/run_UI.py:167-206 `run_deep_model`): per brush
stroke / slider move —
  1. one-hot the edited 19-class mask, scale to {-1, 1} (:170-174),
  2. render the current appearance: gen_img = G.synthesis(w, cam) (:193),
  3. re-encode: rec_ws = E(gen_img, edited_seg) + w_avg (:195-196),
  4. appearance lock: rec_ws[:, 8:] = w_prev[:, 8:] when editing an inversion (:198),
  5. re-render: fake = G.synthesis(rec_ws, cam) (:199).

That is two full G passes + one E pass per interaction. Here the loop runs as a
CHAIN of jitted XLA programs with no host round trips between them (async
dispatch, one sync on the output): each G pass uses the two-program frame split
that measured ~10% faster than fused programs on v5e (PERF.md round 2,
models/generator.make_two_phase_frame), plus one encode program. Static shapes
throughout, so it never recompiles across strokes; camera pose is data. The
frontend (apps/web_ui.py, or any UI) calls `PainterSession.edit(mask, yaw,
pitch)` and gets back (image, colorized seg, new latent state).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import render
from ..models.encoder import HybridEncoder
from ..models.generator import Ide3dGenerator
from ..utils.seg import mask2color, mask2onehot


def free_view_trajectory(traj_type: str = "orbit"):
    """Painter free-view capture paths (Painter/run_UI.py:244-288), returned as
    (yaw, pitch) SLIDER OFFSETS — the reference stores absolute angles around
    pi/2 and PainterSession.camera adds the pi/2 back.

    'front': 240-frame Lissajous wobble around the frontal view (:247-251);
    'orbit': 8 x 15-frame linear sweeps — yaw 0.5->0.3->0.5->0.7->0.5 (x pi),
    then pitch 0.5->0.4->0.5->0.6->0.5 (:252-287).
    """
    half = math.pi / 2
    traj = []
    if traj_type == "front":
        for i in range(240):
            h = math.pi * (0.5 + 0.1 * math.cos(2 * math.pi * i / (0.5 * 240)))
            v = math.pi * (0.5 - 0.05 * math.sin(2 * math.pi * i / (0.5 * 240)))
            traj.append((h - half, v - half))
    elif traj_type == "orbit":
        for a, b in ((0.5, 0.3), (0.3, 0.5), (0.5, 0.7), (0.7, 0.5)):
            for t in np.linspace(a, b, 15):
                traj.append((float(t * math.pi - half), 0.0))
        for a, b in ((0.5, 0.4), (0.4, 0.5), (0.5, 0.6), (0.6, 0.5)):
            for t in np.linspace(a, b, 15):
                traj.append((0.0, float(t * math.pi - half)))
    else:
        raise ValueError(f"unknown trajectory {traj_type!r} (want 'front' or 'orbit')")
    return traj


def make_edit_step(G: Ide3dGenerator, E: HybridEncoder, lock_appearance: bool = True):
    """Build the edit step:

    edit_step(g_params, e_params, mask_onehot_pm [1,R,R,19], w_prev [1,18,512],
              c [1,25]) -> (img [1,R,R,3], seg [1,R,R,19], rec_ws [1,18,512])

    Internally a chain of jitted programs (G two-phase render -> encode ->
    G two-phase render) — async-dispatched, no host sync until the caller reads
    the output.
    """
    from ..models.generator import make_two_phase_frame

    n_geo = G.synthesis.num_ws_geo
    frame_noseg = make_two_phase_frame(G.synthesis, return_seg=False)
    frame_seg = make_two_phase_frame(G.synthesis, return_seg=True)

    @jax.jit
    def encode(g_params, e_params, gen_img, seg_pm, w_prev):
        rec_ws = E(e_params, gen_img, seg_pm)
        rec_ws = rec_ws + g_params["mapping"]["w_avg"][None, None, :]
        if lock_appearance:
            rec_ws = jnp.concatenate([rec_ws[:, :n_geo], w_prev[:, n_geo:]], axis=1)
        return rec_ws

    def edit_from_render(g_params, e_params, gen_img, seg_pm, w_prev, c):
        """Steady-state brush-stroke path: the 'current appearance' render of
        (w_prev, c) is exactly the frame the PREVIOUS edit (or view) returned,
        so when the session still holds it the first G pass is free — the edit
        costs 1×G + E instead of the reference's 2×G + E (run_UI.py:193
        recomputes it every stroke)."""
        rec_ws = encode(g_params, e_params, gen_img, seg_pm, w_prev)
        img, seg = frame_seg(g_params["synthesis"], rec_ws, c)
        return img, seg, rec_ws

    def edit_step(g_params, e_params, seg_pm, w_prev, c):
        gen_img = frame_noseg(g_params["synthesis"], w_prev, c)
        return edit_from_render(g_params, e_params, gen_img, seg_pm, w_prev, c)

    edit_step.from_render = edit_from_render
    return edit_step


@dataclasses.dataclass
class PainterSession:
    """Stateful host-side session wrapping the jitted edit loop (the Ex class of
    Painter/run_UI.py:54, minus Qt)."""

    G: Ide3dGenerator
    E: HybridEncoder
    g_params: dict
    e_params: dict
    w: Optional[jax.Array] = None  # current latent state, carried across edits
    inversion: bool = False
    record: bool = False  # session logging (Painter/converter_log_to_video.py)

    def __post_init__(self):
        self._log: list = []
        self._edit_step = make_edit_step(self.G, self.E, lock_appearance=True)
        self._edit_step_free = make_edit_step(self.G, self.E, lock_appearance=False)

        @jax.jit
        def _render(g_params, ws, c):
            return self.G.synthesis(g_params["synthesis"], ws, c, return_seg=True)

        self._render = _render

        # Free-view fast path: planes + quad table cached per latent (the
        # visualizer's backbone-cache trick, viz/renderer.py:373-377) — pose-only
        # slider moves skip plane generation entirely.
        S = self.G.synthesis
        dt = jnp.dtype(self.G.cfg.dtype)
        rp = self.G.cfg.render
        self._plane_quad_fn = jax.jit(
            lambda p, w: S.renderer.build_table(
                *(x.astype(dt) for x in S.generate_planes(p, w))
            )
        )

        def _pose1(p, quad, c):
            return S.renderer.render_coarse(
                p["renderer"], None, None, c[:, :16].reshape(-1, 4, 4), rp, quad=quad
            )

        def _pose2(p, st, ws):
            rout = S.renderer.render_fine(p["renderer"], st, rp)
            n_vb = len(S.voxel_block_resolutions)
            img_raw = S._raw_rgb()(
                p["raw_rgb"], rout["feature"].astype(dt), ws[:, n_vb + 1]
            ).astype(jnp.float32)
            img = S.superresolve(p, rout["feature"], img_raw, ws)
            return img, S._upsample_seg(rout["seg"])

        p1, p2 = jax.jit(_pose1), jax.jit(_pose2)
        self._pose_frame = lambda p, quad, ws, c: p2(p, p1(p, quad, c), ws)
        # the cached-quad path assumes the dedicated raw head and no per-latent
        # voxel volume; other configs fall back to the fused render
        self._can_cache_quad = (
            self.G.cfg.raw_head == "torgb" and not self.G.cfg.use_feature_volume
        )
        self._quad_cache_w = None
        self._quad_cache = None

        # Frame cache: the last on-device render of (self.w, c). The next edit's
        # first G pass re-renders exactly that frame (run_UI.py:193), so holding
        # it makes steady-state brush strokes 1×G + E instead of 2×G + E
        # (numerically identical — pinned by tests/test_apps.py).
        self._frame_cache = None  # (w object, c ndarray, img device array)

        # on-device uint8 conversion: host pulls are the interactive bottleneck
        # on remote-host links (see apps/viz_renderer.py / PERF.md)
        self._img_u8 = jax.jit(
            lambda x: jnp.clip(jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8)
        )
        self._seg_u8 = jax.jit(lambda s: mask2color(s).astype(jnp.uint8))

    # ------------------------------------------------------------------ latents

    def set_seed(self, seed: int, truncation_psi: float = 0.7):
        """Random identity (Painter 'style cycling', run_UI.py:297-303)."""
        z = jnp.asarray(np.random.RandomState(seed).randn(1, self.G.cfg.z_dim), jnp.float32)
        c = jnp.asarray(render.CANONICAL_POSE_25)[None]
        self.w = self.G.mapping(
            self.g_params["mapping"], z, c, truncation_psi=truncation_psi
        )
        self.inversion = False
        return self.w

    def set_inversion(self, ws: jax.Array):
        """Load a target code from inversion (run_UI.py:31-46)."""
        self.w = ws
        self.inversion = True

    # --------------------------------------------------------------------- loop

    def camera(self, yaw: float = 0.0, pitch: float = 0.0) -> jax.Array:
        """Slider angles -> 25-dim label (run_UI.py:184-187, offsets around pi/2)."""
        c2w = render.look_at_pose(
            yaw + math.pi / 2, pitch + math.pi / 2, [0.0, 0.0, 0.0], radius=2.7
        )
        return render.make_label_25(c2w)

    def view(self, yaw: float = 0.0, pitch: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
        """Free-view render of the current latent (no mask edit). Pose-only
        moves reuse the cached plane/quad table of the current latent."""
        assert self.w is not None, "call set_seed or set_inversion first"
        c = self.camera(yaw, pitch)
        if self._can_cache_quad:
            if self._quad_cache_w is not self.w:
                self._quad_cache = self._plane_quad_fn(self.g_params["synthesis"], self.w)
                self._quad_cache_w = self.w
            img, seg = self._pose_frame(
                self.g_params["synthesis"], self._quad_cache, self.w, c
            )
        else:
            img, seg = self._render(self.g_params, self.w, c)
        self._frame_cache = (self.w, np.asarray(c), img)
        return (np.asarray(self._img_u8(img[0])),
                np.asarray(self._seg_u8(seg))[0])

    def edit(
        self, mask: np.ndarray, yaw: float = 0.0, pitch: float = 0.0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Apply an edited integer mask [R, R] (uint8 class ids) at the given view.

        Updates the session latent (self.w = rec_ws, run_UI.py:203) and returns
        (rgb uint8 [R,R,3], colorized seg uint8 [R,R,3])."""
        assert self.w is not None, "call set_seed or set_inversion first"
        seg_pm = (mask2onehot(jnp.asarray(mask)[None]) * 2.0 - 1.0)
        c = self.camera(yaw, pitch)
        step = self._edit_step if self.inversion else self._edit_step_free
        fc = self._frame_cache
        if fc is not None and fc[0] is self.w and np.array_equal(fc[1], np.asarray(c)):
            # steady-state stroke at an unchanged view: the first G pass is the
            # frame we already rendered
            img, seg, rec_ws = step.from_render(
                self.g_params, self.e_params, fc[2], seg_pm, self.w, c
            )
        else:
            img, seg, rec_ws = step(self.g_params, self.e_params, seg_pm, self.w, c)
        if self.record:
            import time as _time

            self._log.append(
                {"mask": np.asarray(mask, np.uint8), "yaw": yaw, "pitch": pitch,
                 "t": _time.time()}
            )
        self.w = rec_ws
        self._frame_cache = (rec_ws, np.asarray(c), img)
        return (np.asarray(self._img_u8(img[0])),
                np.asarray(self._seg_u8(seg))[0])

    def render_trajectory(self, traj_type: str = "orbit", stride: int = 1,
                          ws: Optional[jax.Array] = None):
        """freeview_render (run_UI.py:306-310): play a capture path on the
        current latent, yielding RGB uint8 frames (pose-only moves ride the
        cached plane/quad table, so this is the fast path).

        Passing an explicit `ws` renders that latent WITHOUT touching any
        session state (no frame/quad cache writes) — the thread-safe snapshot
        path: web_ui's orbit captures self.w under its lock, then renders the
        whole trajectory outside it so edits aren't blocked for the duration."""
        if ws is None:
            for yaw, pitch in free_view_trajectory(traj_type)[::max(1, stride)]:
                rgb, _ = self.view(yaw, pitch)
                yield rgb
            return
        quad = (self._plane_quad_fn(self.g_params["synthesis"], ws)
                if self._can_cache_quad else None)
        for yaw, pitch in free_view_trajectory(traj_type)[::max(1, stride)]:
            c = self.camera(yaw, pitch)
            if quad is not None:
                img, _ = self._pose_frame(self.g_params["synthesis"], quad, ws, c)
            else:
                img, _ = self._render(self.g_params, ws, c)
            yield np.asarray(self._img_u8(img[0]))

    # -------------------------------------------------------------- session log

    def save_log(self, path: str):
        """Persist the edit session (masks + camera angles) for replay
        (the reference's Painter session log, Painter/converter_log_to_video.py)."""
        assert self._log, "nothing recorded (set record=True)"
        np.savez_compressed(
            path,
            masks=np.stack([e["mask"] for e in self._log]),
            yaw=np.asarray([e["yaw"] for e in self._log]),
            pitch=np.asarray([e["pitch"] for e in self._log]),
            t=np.asarray([e["t"] for e in self._log]),
        )

    def replay_log(self, path: str):
        """Re-run a recorded session; yields (rgb, seg_color) frames."""
        data = np.load(path)
        for i in range(len(data["yaw"])):
            yield self.edit(data["masks"][i], float(data["yaw"][i]), float(data["pitch"][i]))

