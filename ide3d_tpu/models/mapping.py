"""Mapping network z (+ camera label c) -> w+ (contract: inversion/networks.py:246-325).

8-layer lr=0.01 MLP on the 2nd-moment-normalized latent, optional label embedding,
w broadcast to num_ws rows, truncation toward the tracked w_avg with an optional
cutoff. The w_avg EMA update is returned functionally (new_w_avg) instead of mutating
a buffer — the training step threads it through its state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import FullyConnectedLayer


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


@dataclasses.dataclass(frozen=True)
class MappingNetwork:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    num_ws: int = 18
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.995

    def _dims(self):
        embed = self.w_dim if self.embed_features is None else self.embed_features
        if self.c_dim == 0:
            embed = 0
        layer = self.w_dim if self.layer_features is None else self.layer_features
        features = [self.z_dim + embed] + [layer] * (self.num_layers - 1) + [self.w_dim]
        return embed, features

    def layers(self):
        embed, features = self._dims()
        fcs = [
            FullyConnectedLayer(
                features[i], features[i + 1], activation=self.activation,
                lr_multiplier=self.lr_multiplier,
            )
            for i in range(self.num_layers)
        ]
        embed_layer = (
            FullyConnectedLayer(self.c_dim, embed) if self.c_dim > 0 else None
        )
        return embed_layer, fcs

    def init(self, key: jax.Array) -> dict:
        embed_layer, fcs = self.layers()
        keys = jax.random.split(key, len(fcs) + 1)
        p = {f"fc{i}": fc.init(keys[i]) for i, fc in enumerate(fcs)}
        if embed_layer is not None:
            p["embed"] = embed_layer.init(keys[-1])
        p["w_avg"] = jnp.zeros((self.w_dim,), jnp.float32)
        return p

    def __call__(
        self,
        params: dict,
        z: Optional[jax.Array],
        c: Optional[jax.Array] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        broadcast: bool = True,
    ) -> jax.Array:
        embed_layer, fcs = self.layers()
        x = None
        if self.z_dim > 0:
            assert z is not None and z.shape[-1] == self.z_dim
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            assert c is not None and c.shape[-1] == self.c_dim
            y = normalize_2nd_moment(embed_layer(params["embed"], c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        for i, fc in enumerate(fcs):
            x = fc(params[f"fc{i}"], x)

        if broadcast and self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            w_avg = params["w_avg"]
            if truncation_cutoff is None or not broadcast:
                x = w_avg + (x - w_avg) * truncation_psi
            else:
                head = w_avg + (x[:, :truncation_cutoff] - w_avg) * truncation_psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x

    def update_w_avg(self, params: dict, ws: jax.Array) -> jax.Array:
        """Functional EMA update of w_avg; ws [B, w_dim] pre-broadcast outputs."""
        batch_mean = jax.lax.stop_gradient(ws.mean(axis=0))
        return batch_mean + (params["w_avg"] - batch_mean) * self.w_avg_beta
