"""Fused tied-embedding NLL kernel vs the XLA logits+log_softmax path
(reference: commu/model/model.py:44-51,106-126).  Value and all three
gradients (hidden, tied embedding, output bias) must agree; runs in Pallas
interpreter mode on CPU, the same kernel compiles on TPU
(scripts/verify_tpu.py certifies the Mosaic lowering)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.models.transformer_xl import token_nll
from commu_tpu.ops.fused_nll import fused_token_nll


def _ref_nll(h_btd, emb, bias, targets):
    logits = h_btd.astype(jnp.float32) @ emb.T.astype(jnp.float32) + bias
    return token_nll(logits, targets)


def _setup(b, t, d, v, dtype, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = (jax.random.normal(k[0], (b, t, d)) * 0.7).astype(dtype)
    emb = jax.random.normal(k[1], (v, d)) * 0.1
    bias = jax.random.normal(k[2], (v,)) * 0.05
    targets = jax.random.randint(k[3], (b, t), 0, v)
    return h, emb, bias, targets


# odd sizes (B odd -> rp=1, V/D not multiples of the 8x128 f32 tile) and the
# production-like shape family (B even -> rp=2, D=500, V=729)
SHAPES = [(3, 8, 36, 60), (4, 16, 100, 93), (2, 128, 500, 729)]


@pytest.mark.parametrize("b,t,d,v", SHAPES)
def test_value_parity(b, t, d, v):
    h, emb, bias, targets = _setup(b, t, d, v, jnp.float32)
    ref = _ref_nll(h, emb, bias, targets)
    got = fused_token_nll(jnp.swapaxes(h, 1, 2), emb, bias, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,t,d,v", SHAPES)
def test_gradient_parity(b, t, d, v):
    h, emb, bias, targets = _setup(b, t, d, v, jnp.float32, seed=1)
    # weighted sum so the nll cotangent is non-uniform
    w = jax.random.normal(jax.random.PRNGKey(7), (b, t))

    def ref_loss(h, emb, bias):
        return jnp.sum(_ref_nll(h, emb, bias, targets) * w)

    def ker_loss(h, emb, bias):
        return jnp.sum(
            fused_token_nll(jnp.swapaxes(h, 1, 2), emb, bias, targets) * w)

    rx = jax.grad(ref_loss, argnums=(0, 1, 2))(h, emb, bias)
    rk = jax.grad(ker_loss, argnums=(0, 1, 2))(h, emb, bias)
    for name, a, b_ in zip(("dh", "demb", "dbias"), rx, rk):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_bf16_hidden():
    """bf16 activations: logits are computed in f32 from the bf16 hidden
    (matching ``logits``'s astype(f32)), and dh comes back bf16."""
    h, emb, bias, targets = _setup(4, 16, 100, 93, jnp.bfloat16, seed=2)

    def ref_loss(h):
        return jnp.sum(_ref_nll(h, emb, bias, targets))

    def ker_loss(h):
        return jnp.sum(fused_token_nll(jnp.swapaxes(h, 1, 2), emb, bias,
                                       targets))

    ref = ref_loss(h)
    got = ker_loss(h)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    dh_ref = jax.grad(ref_loss)(h)
    dh = jax.grad(ker_loss)(h)
    assert dh.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dh, dtype=np.float32),
                               np.asarray(dh_ref, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)
