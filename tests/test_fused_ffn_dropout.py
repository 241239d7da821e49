"""Nonzero-dropout gradient parity for the fused FFN block (ADVICE r1).

The TPU PRNG is unavailable off-TPU (and the Mosaic interpret emulation
returns constant bits), so ``_dropout_mask`` is monkeypatched with a pure-jnp
deterministic hash of (seed, b, salt, position) — usable both inside the
interpret-mode kernels and in a plain-jnp replica.  This pins down what the
dropout-free parity tests cannot: that the backward regenerates the SAME mask
at the SAME site (o / h1 / f) for the same (seed, batch-row, salt), and that
the dropout backwards are applied in the right order relative to the
LayerNorm/relu/matmul backwards.  A wrong salt, a swapped site, or a
mask-after-instead-of-before ordering mistake all fail this test.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.ops import fused_ffn

B, D, F, T = 2, 8, 12, 16
P_DROP = 0.3
SEED = 1234
LN_EPS = fused_ffn.LN_EPS


def _hash_mask(seed, b, salt, shape, dropout_p):
    """Deterministic jnp mask: same signature/semantics as the kernel's
    pltpu-backed ``_dropout_mask`` (True = keep)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    s = (jnp.asarray(seed, jnp.int32) + b * 8192 + salt * 2048).astype(
        jnp.uint32)
    h = i * jnp.uint32(2654435761) + j * jnp.uint32(40503) + s * jnp.uint32(97)
    h = (h ^ (h >> 13)) * jnp.uint32(2246822519)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(1000)) >= jnp.uint32(round(dropout_p * 1000))


def _ln(z, g, be):
    mean = jnp.mean(z, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(z * z, axis=0, keepdims=True) - mean * mean,
                      0.0)
    norm = (z - mean) * jax.lax.rsqrt(var + LN_EPS)
    return norm * g[:, None] + be[:, None]


def _replica(x, o, w1, b1, w2, b2, g1, be1, g2, be2):
    """Pure-jnp forward of the fused block, one batch row at a time, with the
    same hash masks the patched kernel uses."""
    # the kernel's keep-scale divides by the REALIZED (width-quantized)
    # dropout rate (fused_attention.keep_scale_for); the replica must match
    from commu_tpu.ops.fused_attention import keep_scale_for
    inv = keep_scale_for(P_DROP, True)
    ys = []
    for b in range(x.shape[0]):
        keep_o = _hash_mask(SEED, b, fused_ffn._SALT_O, (D, T), P_DROP)
        z1 = x[b] + jnp.where(keep_o, o[b] * inv, 0.0)
        a = _ln(z1, g1, be1)
        h1 = jnp.maximum(jnp.einsum("df,dt->ft", w1, a) + b1[:, None], 0.0)
        keep_h = _hash_mask(SEED, b, fused_ffn._SALT_H, (F, T), P_DROP)
        h1_d = jnp.where(keep_h, h1 * inv, 0.0)
        f = jnp.einsum("fd,ft->dt", w2, h1_d) + b2[:, None]
        keep_f = _hash_mask(SEED, b, fused_ffn._SALT_F, (D, T), P_DROP)
        z2 = a + jnp.where(keep_f, f * inv, 0.0)
        ys.append(_ln(z2, g2, be2))
    return jnp.stack(ys)


@pytest.fixture()
def inputs():
    rng = np.random.RandomState(7)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.5, jnp.float32)
    return dict(x=mk(B, D, T), o=mk(B, D, T), w1=mk(D, F), b1=mk(F),
                w2=mk(F, D), b2=mk(D), g1=jnp.ones(D, jnp.float32) + mk(D) / 4,
                be1=mk(D), g2=jnp.ones(D, jnp.float32) + mk(D) / 4,
                be2=mk(D))


def test_ffn_block_dropout_forward_and_grads_match_autodiff(
        inputs, monkeypatch):
    monkeypatch.setattr(fused_ffn, "_dropout_mask", _hash_mask)
    args = [inputs[k] for k in ("x", "o", "w1", "b1", "w2", "b2", "g1",
                                "be1", "g2", "be2")]
    cot = jnp.asarray(np.random.RandomState(9).randn(B, D, T), jnp.float32)

    def kernel_loss(*a):
        y = fused_ffn.ffn_block(*a, jnp.int32(SEED), P_DROP, True)
        return jnp.sum(y * cot), y

    def replica_loss(*a):
        y = _replica(*a)
        return jnp.sum(y * cot), y

    (_, y_k), grads_k = jax.value_and_grad(
        kernel_loss, argnums=tuple(range(10)), has_aux=True)(*args)
    (_, y_r), grads_r = jax.value_and_grad(
        replica_loss, argnums=tuple(range(10)), has_aux=True)(*args)

    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)
    names = ["dx", "do", "dw1", "db1", "dw2", "db2", "dg1", "dbe1", "dg2",
             "dbe2"]
    for name, gk, gr in zip(names, grads_k, grads_r):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_wrong_salt_would_fail(inputs, monkeypatch):
    """Sanity: the test has teeth — regenerating the h1 mask with the wrong
    salt in the backward produces measurably different gradients."""
    monkeypatch.setattr(fused_ffn, "_dropout_mask", _hash_mask)
    args = [inputs[k] for k in ("x", "o", "w1", "b1", "w2", "b2", "g1",
                                "be1", "g2", "be2")]
    cot = jnp.asarray(np.random.RandomState(9).randn(B, D, T), jnp.float32)

    def kernel_loss(*a):
        return jnp.sum(fused_ffn.ffn_block(*a, jnp.int32(SEED), P_DROP,
                                           True) * cot)

    dw1_good = jax.grad(kernel_loss, argnums=2)(*args)

    def bad_replica_loss(*a):
        # identical to _replica except the f-site mask reuses the o salt
        x, o, w1, b1, w2, b2, g1, be1, g2, be2 = a
        from commu_tpu.ops.fused_attention import keep_scale_for
        inv = keep_scale_for(P_DROP, True)
        ys = []
        for b in range(x.shape[0]):
            keep_o = _hash_mask(SEED, b, fused_ffn._SALT_O, (D, T), P_DROP)
            z1 = x[b] + jnp.where(keep_o, o[b] * inv, 0.0)
            a_ = _ln(z1, g1, be1)
            h1 = jnp.maximum(
                jnp.einsum("df,dt->ft", w1, a_) + b1[:, None], 0.0)
            keep_h = _hash_mask(SEED, b, fused_ffn._SALT_H, (F, T), P_DROP)
            h1_d = jnp.where(keep_h, h1 * inv, 0.0)
            f = jnp.einsum("fd,ft->dt", w2, h1_d) + b2[:, None]
            keep_f = _hash_mask(SEED, b, fused_ffn._SALT_O, (D, T), P_DROP)
            z2 = a_ + jnp.where(keep_f, f * inv, 0.0)
            ys.append(_ln(z2, g2, be2))
        return jnp.sum(jnp.stack(ys) * cot)

    dw1_bad = jax.grad(bad_replica_loss, argnums=2)(*args)
    assert not np.allclose(np.asarray(dw1_good), np.asarray(dw1_bad),
                           rtol=1e-3, atol=1e-4)
