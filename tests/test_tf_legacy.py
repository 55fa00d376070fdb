"""TF1-era legacy pickle conversion (io/tf_legacy.py vs legacy.py:143-327).

Fixture strategy: build tiny FRAMEWORK networks first, inverse-map their params
into TF-layout variable dicts (the inverse of every transpose/flip/+1 rule in
legacy.py:203-241,283-303), pickle them as a (G, D, Gs) tuple of
dnnlib.tflib.network.Network states, and assert the import pipeline recovers
the original framework params EXACTLY — a bijectivity test that pins every
layout rule. No torch and no TF needed.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ide3d_tpu.io import tf_legacy
from ide3d_tpu.io.torch_import import load_network_pkl
from ide3d_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from ide3d_tpu.models.stylegan2 import StyleGan2Config, StyleGan2Generator

RES, W = 16, 16
G_CFG = StyleGan2Config(
    z_dim=W, c_dim=0, w_dim=W, img_resolution=RES, img_channels=3,
    channel_base=256, channel_max=32, mapping_num_layers=2,
    conv_clamp=None)  # TF-era checkpoints have no clamp (legacy.py:166)
D_CFG = DiscriminatorConfig(
    c_dim=0, img_resolution=RES, img_channels=3, channel_base=256,
    channel_max=32)


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _tf_g_variables(params):
    """Framework StyleGan2Generator params -> TF variable dict (inverse of
    convert_tf_generator_sd)."""
    v = {}
    m = params["mapping"]
    v["dlatent_avg"] = m["w_avg"]
    for i in range(G_CFG.mapping_num_layers):
        v[f"mapping/Dense{i}/weight"] = m[f"fc{i}"]["weight"]  # [in,out] both
        v[f"mapping/Dense{i}/bias"] = m[f"fc{i}"]["bias"]
    s = params["synthesis"]
    v["synthesis/4x4/Const/const"] = s["b4"]["const"].transpose(2, 0, 1)[None]

    def put_layer(tf_name, lp, noise_idx, flip=False):
        w = lp["weight"]  # framework HWIO == TF [kh,kw,in,out]
        v[f"{tf_name}/weight"] = w[::-1, ::-1] if flip else w
        v[f"{tf_name}/bias"] = lp["bias"]
        if "noise_const" in lp:
            v[f"synthesis/noise{noise_idx}"] = lp["noise_const"][None, None]
            v[f"{tf_name}/noise_strength"] = lp["noise_strength"]
        v[f"{tf_name}/mod_weight"] = lp["affine"]["weight"]  # [w,in] both
        v[f"{tf_name}/mod_bias"] = lp["affine"]["bias"] - 1

    put_layer("synthesis/4x4/Conv", s["b4"]["conv1"], 0)
    put_layer("synthesis/4x4/ToRGB", s["b4"]["torgb"], None)
    res = 8
    while res <= RES:
        n = int(np.log2(res))
        put_layer(f"synthesis/{res}x{res}/Conv0_up", s[f"b{res}"]["conv0"],
                  2 * n - 5, flip=True)
        put_layer(f"synthesis/{res}x{res}/Conv1", s[f"b{res}"]["conv1"], 2 * n - 4)
        put_layer(f"synthesis/{res}x{res}/ToRGB", s[f"b{res}"]["torgb"], None)
        res *= 2
    return v


def _tf_d_variables(params):
    """Framework Discriminator params -> TF variable dict (inverse of
    convert_tf_discriminator_sd)."""
    v = {}
    res = RES
    while res > 4:
        b = params[f"b{res}"]
        if "fromrgb" in b:
            v[f"{res}x{res}/FromRGB/weight"] = b["fromrgb"]["weight"]
            v[f"{res}x{res}/FromRGB/bias"] = b["fromrgb"]["bias"]
        v[f"{res}x{res}/Conv0/weight"] = b["conv0"]["weight"]
        v[f"{res}x{res}/Conv0/bias"] = b["conv0"]["bias"]
        v[f"{res}x{res}/Conv1_down/weight"] = b["conv1"]["weight"]
        v[f"{res}x{res}/Conv1_down/bias"] = b["conv1"]["bias"]
        v[f"{res}x{res}/Skip/weight"] = b["skip"]["weight"]
        res //= 2
    b4 = params["b4"]
    v["4x4/Conv/weight"] = b4["conv"]["weight"]
    v["4x4/Conv/bias"] = b4["conv"]["bias"]
    # framework fc weight is [R*R*C (HWC-flat), out]; TF Dense0 is
    # [C*R*R (CHW-flat), out]
    fcw = b4["fc"]["weight"]
    C = b4["conv"]["bias"].shape[0]
    R = int(np.sqrt(fcw.shape[0] // C))
    v["4x4/Dense0/weight"] = (
        fcw.T.reshape(-1, R, R, C).transpose(0, 3, 1, 2).reshape(fcw.shape[1], -1).T)
    v["4x4/Dense0/bias"] = b4["fc"]["bias"]
    v["Output/weight"] = b4["out"]["weight"]
    v["Output/bias"] = b4["out"]["bias"]
    return v


def _install_tflib_shim():
    """Create dnnlib.tflib.network.Network so the fixture pickles under the
    exact class path real TF checkpoints use."""
    dnnlib = types.ModuleType("dnnlib")
    tflib = types.ModuleType("dnnlib.tflib")
    network = types.ModuleType("dnnlib.tflib.network")

    class Network:
        def __init__(self, **state):
            self.__dict__.update(state)

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    network.Network = Network
    dnnlib.tflib = tflib
    tflib.network = network
    sys.modules["dnnlib"] = dnnlib
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules["dnnlib.tflib.network"] = network
    return Network


def _make_tf_pickle(tmp_path, g_params, d_params, version=5):
    Network = _install_tflib_shim()
    try:
        def net(variables, **static):
            return Network(version=version, name="t", static_kwargs=static,
                           components={}, variables=sorted(variables.items()))

        g_static = dict(latent_size=W, dlatent_size=W, label_size=0,
                        resolution=RES, num_channels=3, fmap_base=128,
                        fmap_max=32, mapping_layers=2)
        d_static = dict(label_size=0, resolution=RES, num_channels=3,
                        fmap_base=128, fmap_max=32)
        tf_g = net(_tf_g_variables(g_params), **g_static)
        tf_d = net(_tf_d_variables(d_params), **d_static)
        tf_gs = net(_tf_g_variables(g_params), **g_static)
        path = os.path.join(str(tmp_path), "tf_legacy.pkl")
        with open(path, "wb") as f:
            pickle.dump((tf_g, tf_d, tf_gs), f)
        return path
    finally:
        for k in ("dnnlib.tflib.network", "dnnlib.tflib", "dnnlib"):
            del sys.modules[k]


@pytest.fixture(scope="module")
def tiny_nets():
    G = StyleGan2Generator(G_CFG)
    D = Discriminator(D_CFG)
    g_params = _np(jax.jit(G.init)(jax.random.PRNGKey(7)))
    d_params = _np(jax.jit(D.init)(jax.random.PRNGKey(8)))
    # make mod_bias/-strength distinguishable from init zeros/ones
    g_params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.arange(a.size, dtype=np.float32).reshape(a.shape),
        g_params)
    return G, D, g_params, d_params


def test_roundtrip_exact(tmp_path, tiny_nets):
    G, D, g_params, d_params = tiny_nets
    path = _make_tf_pickle(tmp_path, g_params, d_params)
    out = load_network_pkl(path)
    for key in ("G", "G_ema", "D"):
        assert not isinstance(out[key], Exception), f"{key}: {out[key]}"
    G2, gp2, grep = out["G_ema"]
    assert G2.cfg == G.cfg
    flat, flat2 = jax.tree_util.tree_leaves_with_path(g_params), _np(gp2)
    for kp, leaf in flat:
        got = flat2
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(
            leaf, got, err_msg=jax.tree_util.keystr(kp))
    D2, dp2, drep = out["D"]
    assert D2.cfg == D.cfg
    for kp, leaf in jax.tree_util.tree_leaves_with_path(d_params):
        got = _np(dp2)
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(leaf, got, err_msg=jax.tree_util.keystr(kp))
    assert grep.imported > 0 and drep.imported > 0


def test_converted_generator_runs(tmp_path, tiny_nets):
    G, D, g_params, d_params = tiny_nets
    path = _make_tf_pickle(tmp_path, g_params, d_params)
    out = load_network_pkl(path)
    G2, gp2, _ = out["G_ema"]
    z = jax.random.normal(jax.random.PRNGKey(0), (2, G2.cfg.z_dim))
    img = jax.jit(lambda p, z: G2(p, z))(gp2, z)
    assert img.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()
    # ws row plan: num_ws = 2 * n_blocks (torgb rows shared with next conv0)
    assert G2.num_ws == 2 * len(G2.block_resolutions)
    D2, dp2, _ = out["D"]
    logits = jax.jit(lambda p, x: D2(p, x, None))(dp2, img)
    assert logits.shape == (2, 1) and np.isfinite(np.asarray(logits)).all()


def test_version_too_low_rejected(tmp_path, tiny_nets):
    _, _, g_params, d_params = tiny_nets
    path = _make_tf_pickle(tmp_path, g_params, d_params, version=3)
    out = load_network_pkl(path)
    assert isinstance(out["G"], ValueError)  # legacy.py:145 contract


def test_non_tf_payload_not_detected():
    assert not tf_legacy.is_tf_legacy_payload({"G_ema": {}})
    assert not tf_legacy.is_tf_legacy_payload((1, 2, 3))


@pytest.mark.parametrize("prefix", ["", "synthesis/"])
def test_progressive_orig_generator_converts(tmp_path, prefix):
    """Progressive-era ToRGB_lod checkpoints convert into the 'orig'
    architecture (one final ToRGB, no skips) — the legacy.py:195-200 INTENT
    (the reference's own branch is vestigial: its fullmatch expects unprefixed
    names while its lookups require 'synthesis/'-prefixed ones). Both variable
    layouts are accepted here; lower-lod growing leftovers are dropped exactly
    as the torch module would drop them."""
    cfg = StyleGan2Config(
        z_dim=W, c_dim=0, w_dim=W, img_resolution=RES, img_channels=3,
        channel_base=256, channel_max=32, mapping_num_layers=2,
        conv_clamp=None, architecture="orig")
    G = StyleGan2Generator(cfg)
    g_params = _np(jax.jit(G.init)(jax.random.PRNGKey(9)))
    g_params = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.arange(a.size, dtype=np.float32).reshape(a.shape),
        g_params)

    # inverse-map: convs as usual, the single final ToRGB under its
    # progressive name ToRGB_lod0 (+ a fake lod1 leftover head)
    v = {}
    m = g_params["mapping"]
    v["dlatent_avg"] = m["w_avg"]
    for i in range(cfg.mapping_num_layers):
        v[f"mapping/Dense{i}/weight"] = m[f"fc{i}"]["weight"]
        v[f"mapping/Dense{i}/bias"] = m[f"fc{i}"]["bias"]
    s = g_params["synthesis"]
    v["synthesis/4x4/Const/const"] = s["b4"]["const"].transpose(2, 0, 1)[None]

    def put_layer(tf_name, lp, noise_idx, flip=False):
        w = lp["weight"]
        v[f"{tf_name}/weight"] = w[::-1, ::-1] if flip else w
        v[f"{tf_name}/bias"] = lp["bias"]
        if "noise_const" in lp:
            v[f"synthesis/noise{noise_idx}"] = lp["noise_const"][None, None]
            v[f"{tf_name}/noise_strength"] = lp["noise_strength"]
        v[f"{tf_name}/mod_weight"] = lp["affine"]["weight"]
        v[f"{tf_name}/mod_bias"] = lp["affine"]["bias"] - 1

    put_layer("synthesis/4x4/Conv", s["b4"]["conv1"], 0)
    res = 8
    while res <= RES:
        n = int(np.log2(res))
        put_layer(f"synthesis/{res}x{res}/Conv0_up", s[f"b{res}"]["conv0"],
                  2 * n - 5, flip=True)
        put_layer(f"synthesis/{res}x{res}/Conv1", s[f"b{res}"]["conv1"], 2 * n - 4)
        res *= 2
    tr = s[f"b{RES}"]["torgb"]
    v[f"{prefix}ToRGB_lod0/weight"] = tr["weight"]
    v[f"{prefix}ToRGB_lod0/bias"] = tr["bias"]
    v[f"{prefix}ToRGB_lod0/mod_weight"] = tr["affine"]["weight"]
    v[f"{prefix}ToRGB_lod0/mod_bias"] = tr["affine"]["bias"] - 1
    # growing leftover at lod1 (half res) — must be DROPPED, not imported
    ch_half = min(256 // (RES // 2), 32)
    v[f"{prefix}ToRGB_lod1/weight"] = np.ones((1, 1, ch_half, 3), np.float32)
    v[f"{prefix}ToRGB_lod1/bias"] = np.zeros((3,), np.float32)
    v[f"{prefix}ToRGB_lod1/mod_weight"] = np.ones((W, ch_half), np.float32)
    v[f"{prefix}ToRGB_lod1/mod_bias"] = np.zeros((ch_half,), np.float32)

    Network = _install_tflib_shim()
    try:
        g_static = dict(latent_size=W, dlatent_size=W, label_size=0,
                        resolution=RES, num_channels=3, fmap_base=128,
                        fmap_max=32, mapping_layers=2)
        tf_g = Network(version=5, name="t", static_kwargs=g_static,
                       components={}, variables=sorted(v.items()))
        sd, kw = tf_legacy.convert_tf_generator_sd(tf_g)
        assert kw["architecture"] == "orig"
        G2, gp2, rep = tf_legacy.import_tf_generator(tf_g)
    finally:
        for k in ("dnnlib.tflib.network", "dnnlib.tflib", "dnnlib"):
            del sys.modules[k]

    assert G2.cfg.architecture == "orig"
    # exact round trip of every hosted param (incl. the single final torgb;
    # no torgb rows exist on intermediate blocks or b4 in the 'orig' tree)
    assert "torgb" not in gp2["synthesis"]["b4"]
    assert "torgb" not in gp2["synthesis"]["b8"]
    for kp, leaf in jax.tree_util.tree_leaves_with_path(g_params):
        got = _np(gp2)
        for k in kp:
            got = got[k.key]
        np.testing.assert_array_equal(leaf, got, err_msg=jax.tree_util.keystr(kp))
    # forward runs and matches the source network exactly
    z = jax.random.normal(jax.random.PRNGKey(1), (2, W))
    img_src = jax.jit(lambda p, z: G(p, z))(g_params, z)
    img = jax.jit(lambda p, z: G2(p, z))(gp2, z)
    assert img.shape == (2, RES, RES, 3)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_src))
