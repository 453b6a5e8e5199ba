"""Lightning attention decode (reference sgl-kernel
lightning_attention_decode_kernel.cu + test_lightning_attention_decode.py):
recurrence vs direct numpy, decay semantics over multiple steps."""

import numpy as np

import jax.numpy as jnp

from semi_pd_tpu.ops.lightning_attention import lightning_attention_decode


def test_matches_numpy_single_step():
    rng = np.random.default_rng(0)
    B, H, D, E = 2, 4, 8, 16
    q = rng.normal(size=(B, H, 1, D)).astype(np.float32)
    k = rng.normal(size=(B, H, 1, D)).astype(np.float32)
    v = rng.normal(size=(B, H, 1, E)).astype(np.float32)
    past = rng.normal(size=(B, H, D, E)).astype(np.float32)
    slope = rng.uniform(0.1, 2.0, size=(H,)).astype(np.float32)

    out, new_kv = lightning_attention_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(past),
        jnp.asarray(slope))

    ratio = np.exp(-slope)[None, :, None, None]
    want_kv = ratio * past + np.einsum("bhd,bhe->bhde", k[:, :, 0], v[:, :, 0])
    want_out = np.einsum("bhd,bhde->bhe", q[:, :, 0], want_kv)[:, :, None]
    np.testing.assert_allclose(np.asarray(new_kv), want_kv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=1e-4, atol=1e-4)


def test_recurrence_equals_decayed_sum():
    """After T steps from zero state, kv == sum_t decay^(T-1-t) k_t (x) v_t."""
    rng = np.random.default_rng(1)
    B, H, D, E, T = 1, 2, 4, 4, 5
    slope = np.asarray([0.5, 1.5], np.float32)
    ks = rng.normal(size=(T, B, H, 1, D)).astype(np.float32)
    vs = rng.normal(size=(T, B, H, 1, E)).astype(np.float32)
    q = rng.normal(size=(B, H, 1, D)).astype(np.float32)

    kv = jnp.zeros((B, H, D, E), jnp.float32)
    for t in range(T):
        _, kv = lightning_attention_decode(
            jnp.asarray(q), jnp.asarray(ks[t]), jnp.asarray(vs[t]), kv,
            jnp.asarray(slope))

    ratio = np.exp(-slope)
    want = np.zeros((B, H, D, E), np.float32)
    for t in range(T):
        w = ratio ** (T - 1 - t)
        want += w[None, :, None, None] * np.einsum(
            "bhd,bhe->bhde", ks[t][:, :, 0], vs[t][:, :, 0])
    np.testing.assert_allclose(np.asarray(kv), want, rtol=1e-4, atol=1e-4)
