"""Pallas kernel tests (interpreter mode on CPU; compiled path is exercised by the
TPU benchmark, see PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from ide3d_tpu.ops.pallas.ray_march import RAY_TILE, sort_integrate_pallas
from ide3d_tpu.render.integration import integrate_rays
from ide3d_tpu.render.renderer import _sort_by_depth


def test_sort_integrate_matches_xla_reference(rng):
    B, R, S, C = 2, 2 * RAY_TILE, 24, 11
    z = jnp.asarray(rng.rand(B, R, S, 1).astype(np.float32) * 1.05 + 2.25)
    vals = jnp.asarray(rng.randn(B, R, S, C + 1).astype(np.float32))
    norm = jnp.asarray(rng.rand(B, R, 1).astype(np.float32) + 0.5)

    feat, depth, wsum = sort_integrate_pallas(z, vals, norm, interpret=True)

    zs, vs = _sort_by_depth(z, vals)
    rays_d = jnp.concatenate([norm, jnp.zeros_like(norm), jnp.zeros_like(norm)], -1)
    comp, dref, w = integrate_rays(vs, rays_d, zs)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(comp), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(dref), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(wsum), np.asarray(w.sum(-2)), atol=3e-4, rtol=3e-4)


def test_sort_integrate_saturated_density(rng):
    """The kernel must stay finite when alpha saturates to 1 (the log(1-alpha)
    -inf hazard its analytic log path exists for)."""
    B, R, S, C = 1, RAY_TILE, 8, 3
    z = jnp.asarray(np.sort(rng.rand(B, R, S, 1).astype(np.float32), axis=2))
    vals = jnp.asarray(rng.randn(B, R, S, C + 1).astype(np.float32))
    vals = vals.at[..., -1].set(100.0)  # huge sigma -> alpha == 1 everywhere
    norm = jnp.ones((B, R, 1), jnp.float32)
    feat, depth, wsum = sort_integrate_pallas(z, vals, norm, interpret=True)
    assert np.isfinite(np.asarray(feat)).all()
    np.testing.assert_allclose(np.asarray(wsum), 1.0, atol=1e-4)
