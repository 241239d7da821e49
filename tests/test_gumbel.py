"""Straight-through Gumbel-softmax sampling (reference: model.py:630-676)."""
import jax
import jax.numpy as jnp
import numpy as np

from commu_tpu.models.transformer_xl import gumbel_softmax


def test_one_hot_forward():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 7, 20))
    y = gumbel_softmax(logits, temperature=0.9, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    assert ((np.asarray(y) == 1.0).sum(-1) == 1).all()  # exactly one hard 1


def test_straight_through_gradient():
    logits = jnp.asarray(np.random.RandomState(1).randn(3, 20))

    def f(l):
        return (gumbel_softmax(l, 1.0, jax.random.PRNGKey(1)) ** 2).sum()

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # gradients flow through the soft path


def test_low_temperature_tracks_argmax():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1000, 11) * 8)  # strong preferences
    y = gumbel_softmax(logits, temperature=0.1, rng=jax.random.PRNGKey(2))
    picked = np.asarray(jnp.argmax(y, -1))
    agree = (picked == np.asarray(jnp.argmax(logits, -1))).mean()
    assert agree > 0.8
