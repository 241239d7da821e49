"""The fused kernel's hand-derived dropout backward vs autodiff.

The TPU PRNG is unavailable off-TPU, so this validates the MATH: a pure-JAX
replica of the kernel forward with an injected dropout mask is autodiffed,
and the cotangents are compared against a literal transcription of the
backward kernel's formulas (dv from post-dropout probs; dropout backward
applied to dp BEFORE the softmax backward on clean probabilities)."""
import jax
import jax.numpy as jnp
import numpy as np

T, K, DH = 8, 20, 6
SCALE = 0.3


def _forward(qw, qr, k, v, r_ext, drop_scale):
    """Single-head replica of _attn_core + PV (no masking for clarity)."""
    ac = qw @ k.T
    p_ext = qr @ r_ext.T
    # per-row left shift by (T-1-i), matching _row_shift semantics
    bd = jnp.stack([jnp.roll(p_ext[i], -(T - 1 - i))[:K] for i in range(T)])
    s = (ac + bd) * SCALE
    p_clean = jax.nn.softmax(s, axis=-1)
    probs = p_clean * drop_scale
    return probs @ v, (s, p_clean, probs)


def _manual_bwd(qw, qr, k, v, r_ext, drop_scale, do):
    """Literal transcription of _bwd_kernel's formulas."""
    _, (s, p_clean, probs) = _forward(qw, qr, k, v, r_ext, drop_scale)
    dv = probs.T @ do
    dp = do @ v.T
    dp = dp * drop_scale
    ds = p_clean * (dp - jnp.sum(dp * p_clean, axis=1, keepdims=True))
    ds = ds * SCALE
    dq_ac = ds @ k
    dk = ds.T @ qw
    width = r_ext.shape[0]
    ds_pad = jnp.pad(ds, ((0, 0), (0, width - K)))
    dp_ext = jnp.stack([jnp.roll(ds_pad[i], T - 1 - i) for i in range(T)])
    dqr = dp_ext @ r_ext
    dr = dp_ext.T @ qr
    return dq_ac, dqr, dk, dv, dr


def test_dropout_backward_formulas_match_autodiff():
    rng = np.random.RandomState(0)
    qw = jnp.asarray(rng.randn(T, DH), jnp.float32)
    qr = jnp.asarray(rng.randn(T, DH), jnp.float32)
    k = jnp.asarray(rng.randn(K, DH), jnp.float32)
    v = jnp.asarray(rng.randn(K, DH), jnp.float32)
    r_ext = jnp.asarray(rng.randn(K + T, DH), jnp.float32)
    keep = rng.rand(T, K) >= 0.3
    drop_scale = jnp.asarray(np.where(keep, 1.0 / 0.7, 0.0), jnp.float32)
    do = jnp.asarray(rng.randn(T, DH), jnp.float32)

    def loss(qw, qr, k, v, r_ext):
        out, _ = _forward(qw, qr, k, v, r_ext, drop_scale)
        return (out * do).sum()

    auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qw, qr, k, v, r_ext)
    manual = _manual_bwd(qw, qr, k, v, r_ext, drop_scale, do)
    names = ["dqw(=dq_ac)", "dqr", "dk", "dv", "dr"]
    order = [0, 1, 2, 3, 4]  # autodiff: qw, qr, k, v, r_ext
    for name, a, m in zip(names, auto, manual):
        np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_old_folded_formula_was_wrong():
    """Regression guard: the pre-fix formulation (softmax backward applied to
    post-dropout probs) disagrees with autodiff whenever anything is dropped."""
    rng = np.random.RandomState(1)
    qw = jnp.asarray(rng.randn(T, DH), jnp.float32)
    qr = jnp.asarray(rng.randn(T, DH), jnp.float32)
    k = jnp.asarray(rng.randn(K, DH), jnp.float32)
    v = jnp.asarray(rng.randn(K, DH), jnp.float32)
    r_ext = jnp.asarray(rng.randn(K + T, DH), jnp.float32)
    keep = rng.rand(T, K) >= 0.3
    drop_scale = jnp.asarray(np.where(keep, 1.0 / 0.7, 0.0), jnp.float32)
    do = jnp.asarray(rng.randn(T, DH), jnp.float32)

    def loss(k_):
        out, _ = _forward(qw, qr, k_, v, r_ext, drop_scale)
        return (out * do).sum()

    auto_dk = jax.grad(loss)(k)

    _, (s, p_clean, probs) = _forward(qw, qr, k, v, r_ext, drop_scale)
    dp = (do @ v.T)
    ds_old = probs * (dp - jnp.sum(dp * probs, axis=1, keepdims=True)) * SCALE
    dk_old = ds_old.T @ qw
    assert not np.allclose(np.asarray(dk_old), np.asarray(auto_dk),
                           rtol=1e-3, atol=1e-4)
