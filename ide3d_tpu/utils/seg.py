"""19-class face-semantics toolkit (palette, one-hot, remap, colorization).

Data constants (palette, label names, BiSeNet 20->19 remap table) reproduce the
reference's published values (dnnlib/seg_tools.py:13-59) — they are checkpoint/
dataset facts, not code. All tensor ops are jnp, channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# dnnlib/seg_tools.py:13-32
COLOR_MAP = np.array(
    [
        [0, 0, 0],
        [204, 0, 0],
        [76, 153, 0],
        [204, 204, 0],
        [51, 51, 255],
        [204, 0, 204],
        [0, 255, 255],
        [255, 204, 204],
        [102, 51, 0],
        [255, 0, 0],
        [102, 204, 0],
        [255, 255, 0],
        [0, 0, 153],
        [0, 0, 204],
        [255, 51, 153],
        [0, 204, 204],
        [0, 51, 0],
        [255, 153, 51],
        [0, 204, 0],
    ],
    dtype=np.float32,
)

# dnnlib/seg_tools.py:35-55
LABEL_LIST = {
    "background": 0, "skin": 1, "nose": 2, "eye_g": 3, "l_eye": 4, "r_eye": 5,
    "l_brow": 6, "r_brow": 7, "l_ear": 8, "r_ear": 9, "mouth": 10, "u_lip": 11,
    "l_lip": 12, "hair": 13, "hat": 14, "ear_r": 15, "neck_l": 16, "neck": 17,
    "cloth": 18,
}

# BiSeNet 20-class -> IDE-3D 19-class remap (dnnlib/seg_tools.py:59)
BISENET_REMAP = np.array(
    [0, 1, 6, 7, 4, 5, 2, 2, 10, 11, 12, 8, 9, 15, 3, 17, 16, 18, 13, 14],
    dtype=np.int32,
)

NUM_CLASSES = 19


def id_remap(seg: jax.Array) -> jax.Array:
    """Remap BiSeNet class ids to the IDE-3D 19-class ids (seg_tools.py:63)."""
    return jnp.asarray(BISENET_REMAP)[seg.astype(jnp.int32)]


def mask2onehot(mask: jax.Array, num_classes: int = NUM_CLASSES) -> jax.Array:
    """Integer mask [..., H, W] -> one-hot [..., H, W, num_classes] float32
    (seg_tools.py:67-72, channels-last)."""
    return jax.nn.one_hot(mask.astype(jnp.int32), num_classes, dtype=jnp.float32)


def onehot2mask(onehot: jax.Array) -> jax.Array:
    """[..., H, W, C] class scores -> integer mask [..., H, W]."""
    return jnp.argmax(onehot, axis=-1)


def mask2color(seg: jax.Array) -> jax.Array:
    """[B, H, W, C] class scores -> [B, H, W, 3] RGB in 0..255
    (contract: dnnlib/seg_tools.py:75-82, channels-last)."""
    ids = jnp.argmax(seg, axis=-1)
    return jnp.asarray(COLOR_MAP)[ids]
