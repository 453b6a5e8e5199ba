"""Sampling op tests (reference analog: sgl-kernel tests/test_sampling.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_pd_tpu.ops.sampling import (
    SamplingArrays,
    apply_penalties,
    compute_logprobs,
    sample,
)


def _params(B, **kw):
    d = dict(
        temperature=np.ones(B, np.float32),
        top_k=np.zeros(B, np.int32),
        top_p=np.ones(B, np.float32),
        min_p=np.zeros(B, np.float32),
        presence_penalty=np.zeros(B, np.float32),
        frequency_penalty=np.zeros(B, np.float32),
        repetition_penalty=np.ones(B, np.float32),
    )
    d.update({k: np.asarray(v, d[k].dtype) for k, v in kw.items()})
    return SamplingArrays(**{k: jnp.asarray(v) for k, v in d.items()})


def test_greedy():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 50)).astype(np.float32))
    p = _params(4, temperature=np.zeros(4))
    ids = sample(logits, p, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(ids), np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 100)).astype(np.float32))
    p = _params(2, top_k=np.array([3, 100]))
    top3 = np.argsort(np.asarray(logits)[0])[-3:]
    for seed in range(20):
        ids = np.asarray(sample(logits, p, jax.random.PRNGKey(seed)))
        assert ids[0] in top3


def test_top_p_restricts_support():
    # Distribution with one dominant token: top_p=0.5 must always pick it
    logits = np.full((1, 10), -5.0, np.float32)
    logits[0, 7] = 5.0
    p = _params(1, top_p=np.array([0.5]))
    for seed in range(10):
        ids = np.asarray(sample(jnp.asarray(logits), p, jax.random.PRNGKey(seed)))
        assert ids[0] == 7


def test_min_p():
    logits = np.zeros((1, 4), np.float32)
    logits[0] = [10.0, 9.9, 0.0, -1.0]
    # min_p=0.5: only tokens with prob >= 0.5*max_prob survive (ids 0,1)
    p = _params(1, min_p=np.array([0.5]))
    for seed in range(20):
        ids = np.asarray(sample(jnp.asarray(logits), p, jax.random.PRNGKey(seed)))
        assert ids[0] in (0, 1)


def test_penalties():
    B, V = 2, 8
    logits = jnp.zeros((B, V), jnp.float32)
    counts = jnp.zeros((B, V), jnp.int32).at[0, 3].set(2)
    prompt_mask = jnp.zeros((B, V), bool).at[1, 5].set(True)
    p = _params(
        B,
        presence_penalty=np.array([1.0, 0.0]),
        frequency_penalty=np.array([0.5, 0.0]),
        repetition_penalty=np.array([1.0, 2.0]),
    )
    out = np.asarray(apply_penalties(logits, counts, prompt_mask, p))
    assert out[0, 3] == pytest.approx(-1.0 - 2 * 0.5)  # presence + freq*count
    assert out[0, 0] == 0.0
    # repetition on prompt token with logit 0 -> 0*2 or 0/2 = 0; use nonzero
    logits2 = jnp.ones((B, V), jnp.float32)
    out2 = np.asarray(apply_penalties(logits2, counts, prompt_mask, p))
    assert out2[1, 5] == pytest.approx(0.5)  # positive logit divided by 2
    assert out2[1, 4] == 1.0


def test_logprobs():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(3, 20)).astype(np.float32))
    ids = jnp.asarray([1, 5, 19], jnp.int32)
    lp = np.asarray(compute_logprobs(logits, ids))
    ref = np.log(
        np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(-1, keepdims=True)
    )
    np.testing.assert_allclose(lp, ref[np.arange(3), np.asarray(ids)], rtol=1e-5)
