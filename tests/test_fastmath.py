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


def test_mixed_dot_matches_fp32_and_dtypes():
    """ops/mixed.py: forward ~= fp32 dot to bf16 tolerance; cotangents return
    in the primal dtypes; composes with checkpoint/scan/vmap."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from conditioned_nerf_gan_tpu.ops.mixed import mixed_dot

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 17, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))

    y = mixed_dot(x, w)
    y_ref = jnp.dot(x, w)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=0.05,
                               atol=0.05)

    def f_mixed(x, w):
        return jnp.sum(jnp.sin(mixed_dot(x, w) * 3.0))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(jnp.dot(x, w) * 3.0))

    gm = jax.grad(f_mixed, argnums=(0, 1))(x, w)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    for a, b in zip(gm, gr):
        assert a.dtype == jnp.float32
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 0.05, rel

    # bf16 primal input -> bf16 cotangent (the PointNet fc_c case)
    xb = x.astype(jnp.bfloat16)
    g = jax.grad(lambda xx: jnp.sum(mixed_dot(xx, w)))(xb)
    assert g.dtype == jnp.bfloat16

    # composes with remat + scan + vmap
    def step(c, xi):
        return c, jax.checkpoint(lambda xx: jnp.sum(mixed_dot(xx, w)))(xi)

    _, ys = jax.lax.scan(step, 0.0, x)
    assert ys.shape == (4,)
    g2 = jax.grad(lambda xx: jnp.sum(jax.vmap(lambda t: mixed_dot(t, w))(xx)))(x)
    assert g2.shape == x.shape and g2.dtype == jnp.float32


def test_mixed_fold_einsum_grads_match_autodiff():
    """The folded-FiLM custom VJP must match autodiff of the same einsum to
    bf16 tolerance (r3: keeps the six FiLM dgrad matmuls on the bf16 MXU)."""
    import jax
    import jax.numpy as jnp

    from conditioned_nerf_gan_tpu.ops.mixed import mixed_fold_einsum

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))

    def loss_custom(x, s):
        return jnp.sum(jnp.sin(mixed_fold_einsum(x, s, jnp.bfloat16)) ** 2)

    def loss_ref(x, s):
        y = jnp.einsum("bnk,bkf->bnf", x.astype(jnp.bfloat16),
                       s.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(jnp.sin(y) ** 2)

    v1, (gx1, gs1) = jax.value_and_grad(loss_custom, argnums=(0, 1))(x, s)
    v2, (gx2, gs2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, s)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2),
                               rtol=2e-2, atol=2e-2)
    assert gx1.dtype == jnp.float32 and gs1.dtype == jnp.float32
