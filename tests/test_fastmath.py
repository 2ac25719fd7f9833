"""fast_sin accuracy and policy-drift tests."""

import numpy as np

import jax
import jax.numpy as jnp

from conditioned_nerf_gan_tpu.ops.fastmath import fast_sin


def test_fast_sin_accuracy():
    x = jnp.linspace(-45.0, 45.0, 1 << 20)
    err = jnp.abs(fast_sin(x) - jnp.sin(x))
    assert float(err.max()) < 1e-5


def test_fast_sin_gradient_matches_cos():
    x = jnp.linspace(-10.0, 10.0, 4096)
    g = jax.vmap(jax.grad(fast_sin))(x)
    np.testing.assert_allclose(np.asarray(g), np.cos(x), atol=1e-4)


def test_fast_sin_policy_drift_small_at_init_scale():
    """With proper SIREN init the fast-sin output drift is negligible."""
    from conditioned_nerf_gan_tpu.models import make_siren

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (1, 128, 3), minval=-0.5, maxval=0.5)
    z = jax.random.normal(key, (1, 64))
    exact = make_siren("SHORTSIREN", z_dim=64, hidden_dim=64)
    fast = make_siren("SHORTSIREN", z_dim=64, hidden_dim=64, use_fast_sin=True)
    params = exact.init(key, pts, z)
    a = exact.apply(params, pts, z)
    b = fast.apply(params, pts, z)
    assert float(jnp.abs(a - b).max()) < 1e-5
