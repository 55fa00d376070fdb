"""ResNet18 global-feature image encoder.

Contract: inversion/networks.py:1779-1797 (ResNetEncoder) — torchvision
resnet18 minus the classifier head (`children()[:-1]`, i.e. stem + 4 layers +
global average pool), applied after a bicubic resize of the input to 224x224
(align_corners=False), returning the pooled [B, 512] feature vector.

The reference defines this class but no entry point ever instantiates it (dead
code upstream); it is provided here so the networks.py layer family is complete
and so torchvision resnet18 weights can be hosted if a use case appears.
Trunk layout and param-tree keys are shared with the BiSeNet context path
(models/bisenet.resnet18_features — same torchvision BasicBlock schedule), so a
torchvision state_dict imports via the standard mechanical OIHW->HWIO walk
(io/torch_import.state_dict_to_tree; `fc.*` keys are dropped).

Bicubic note: jax.image.resize uses the Keys cubic kernel with a=-0.5; torch's
bicubic uses a=-0.75. Values differ slightly at strong edges; the feature
contract (resize -> conv trunk -> pooled vector) is preserved.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .bisenet import resnet18_features


@dataclasses.dataclass(frozen=True)
class ResNetEncoder:
    """__call__(params, img [B,H,W,3]) -> [B, 512] pooled resnet18 features."""

    input_size: int = 224

    def preprocess(self, x: jax.Array) -> jax.Array:
        """Bicubic resize to 224x224 (networks.py:1791-1793)."""
        B, H, W, C = x.shape
        if (H, W) == (self.input_size, self.input_size):
            return x
        return jax.image.resize(
            x, (B, self.input_size, self.input_size, C), method="cubic"
        )

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        _, _, feat32 = resnet18_features(self.preprocess(x), params)
        return jnp.mean(feat32, axis=(1, 2))  # AdaptiveAvgPool2d(1) -> [B, 512]

    def init(self, key: jax.Array) -> dict:
        """Random torchvision-resnet18-shaped params (tests / no-weights runs)."""
        del key  # deterministic numpy init, matching models/bisenet.py style
        import numpy as np

        rs = np.random.RandomState(0)

        def conv(ci, co, k):
            return {
                "weight": jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32) * 0.05)
            }

        def bn(c):
            return {
                "weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "running_mean": jnp.zeros((c,), jnp.float32),
                "running_var": jnp.ones((c,), jnp.float32),
            }

        def block(ci, co, down):
            p = {
                "conv1": conv(ci, co, 3),
                "bn1": bn(co),
                "conv2": conv(co, co, 3),
                "bn2": bn(co),
            }
            if down:
                p["downsample"] = {"0": conv(ci, co, 1), "1": bn(co)}
            return p

        return {
            "conv1": conv(3, 64, 7),
            "bn1": bn(64),
            "layer1": {"0": block(64, 64, False), "1": block(64, 64, False)},
            "layer2": {"0": block(64, 128, True), "1": block(128, 128, False)},
            "layer3": {"0": block(128, 256, True), "1": block(256, 256, False)},
            "layer4": {"0": block(256, 512, True), "1": block(512, 512, False)},
        }


def import_resnet_encoder(path: str) -> dict:
    """torchvision resnet18 state_dict (.pth) -> ResNetEncoder params."""
    from ..io.torch_import import load_torch_state_dict, state_dict_to_tree

    sd = {
        k: v
        for k, v in load_torch_state_dict(path).items()
        if not k.startswith("fc.")
    }
    return state_dict_to_tree(sd)
