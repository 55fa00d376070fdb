"""Painter web UI tests: route layer over a tiny session (the product loop of
Painter/run_UI.py:167-206 driven through the HTTP API surface)."""

import base64
import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def app():
    from ide3d_tpu.apps.web_ui import PainterWebApp, build_session

    return PainterWebApp(build_session("random:0", tiny=True))


def _json(resp):
    status, ctype, payload = resp
    assert status == 200, payload
    assert ctype == "application/json"
    return json.loads(payload)


def test_index_and_meta(app):
    status, ctype, payload = app.handle("GET", "/", {}, b"")
    assert status == 200 and ctype == "text/html"
    assert b"Apply edit" in payload

    meta = _json(app.handle("GET", "/api/meta", {}, b""))
    assert meta["resolution"] == 64
    assert meta["classes"]["hair"] == 13
    assert len(meta["palette"]) == 19


def test_seed_view_edit_loop(app):
    R = 64
    out = _json(app.handle("POST", "/api/seed", {},
                           json.dumps({"seed": 3, "trunc": 0.7}).encode()))
    assert out["render"] and out["seg_ids"]
    ids = np.frombuffer(base64.b64decode(out["seg_ids"]), np.uint8)
    assert ids.shape == (R * R,) and ids.max() < 19

    # free-view re-render (no edit): latent state must NOT advance
    w_before = np.asarray(app.session.w)
    out_v = _json(app.handle("GET", "/api/view", {"yaw": "0.3", "pitch": "-0.1"}, b""))
    assert out_v["render"]
    np.testing.assert_array_equal(np.asarray(app.session.w), w_before)

    # paint a hair rectangle onto the mask and apply the edit
    mask = ids.reshape(R, R).copy()
    mask[5:20, 5:20] = 13
    body = json.dumps({
        "mask": base64.b64encode(mask.reshape(-1)).decode(),
        "yaw": 0.1, "pitch": 0.0,
    }).encode()
    out_e = _json(app.handle("POST", "/api/edit", {}, body))
    assert out_e["render"] and out_e["seg_ids"]
    # the edit advances the session latent (run_UI.py:203 self.w = rec_ws)
    assert np.abs(np.asarray(app.session.w) - w_before).max() > 0

    # render payloads are valid PNGs
    import PIL.Image
    import io

    img = PIL.Image.open(io.BytesIO(base64.b64decode(out_e["render"])))
    assert img.size == (R, R)


def test_orbit_and_session_video(app):
    """Free-view capture buttons (run_UI.py:244-310) + the log -> video round
    trip: a scripted session must yield playable capture files."""
    from ide3d_tpu.apps.painter import free_view_trajectory

    # trajectory contract: reference frame counts and angle ranges
    orbit = free_view_trajectory("orbit")
    front = free_view_trajectory("front")
    assert len(orbit) == 120 and len(front) == 240
    assert abs(orbit[0][0]) < 1e-6 and abs(orbit[0][1]) < 1e-6  # starts frontal
    yaws = np.asarray([y for y, _ in orbit])
    assert yaws.min() < -0.6 and yaws.max() > 0.6  # 0.3pi..0.7pi sweep

    out = _json(app.handle("POST", "/api/orbit", {},
                           json.dumps({"type": "orbit", "stride": 30}).encode()))
    assert out["frames"] == 4 and out["ext"] in ("mp4", "gif")
    data = base64.b64decode(out["video"])
    assert len(data) > 100
    if out["ext"] == "gif":
        assert data[:3] == b"GIF"

    # session video: edits so far (recorded by the /api/edit route) stitched
    out_s = _json(app.handle("GET", "/api/session_video", {}, b""))
    assert out_s["frames"] >= 1 and out_s["video"]

    # unknown trajectory type errors cleanly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        app.orbit({"type": "barrel-roll"})


def test_unknown_route(app):
    status, _, _ = app.handle("GET", "/nope", {}, b"")
    assert status == 404


def test_load_mask_roundtrip(app):
    """'Open real mask' endpoint: grayscale class-id PNG and palette-colored PNG
    both land as canvas ids at the session resolution."""
    import io

    import PIL.Image

    from ide3d_tpu.utils.seg import COLOR_MAP

    R = 64
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 19, (128, 128)).astype(np.uint8)  # off-resolution input

    buf = io.BytesIO()
    PIL.Image.fromarray(ids, mode="L").save(buf, "PNG")
    out = _json(app.handle("POST", "/api/load_mask", {},
                           json.dumps({"png": base64.b64encode(buf.getvalue()).decode()}).encode()))
    got = np.frombuffer(base64.b64decode(out["seg_ids"]), np.uint8).reshape(R, R)
    assert got.max() < 19
    # nearest-neighbor resize keeps only original class ids
    assert set(np.unique(got)) <= set(np.unique(ids))

    colored = COLOR_MAP.astype(np.uint8)[ids]
    buf2 = io.BytesIO()
    PIL.Image.fromarray(colored).save(buf2, "PNG")
    out2 = _json(app.handle("POST", "/api/load_mask", {},
                            json.dumps({"png": base64.b64encode(buf2.getvalue()).decode()}).encode()))
    got2 = np.frombuffer(base64.b64decode(out2["seg_ids"]), np.uint8).reshape(R, R)
    # palette inversion must agree with the grayscale path
    np.testing.assert_array_equal(got2, got)
