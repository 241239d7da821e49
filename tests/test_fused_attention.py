"""Fused Pallas attention vs the XLA einsum path: forward and gradients must
agree across memory states, same_length masking, and reset rows.  Runs in
Pallas interpreter mode on CPU; the same kernel compiles on TPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.config import ModelConfig
from commu_tpu.models.transformer_xl import Memory, TransformerXL, init_memory, token_nll
from commu_tpu.vocab.event_tokens import PAD_ID

N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 48
T, M = 8, 24
VOCAB = 60

XLA_CFG = ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                      inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
                      attn_impl="xla")
PAL_CFG = dataclasses.replace(XLA_CFG, attn_impl="pallas")


def _setup():
    model = TransformerXL(VOCAB, XLA_CFG, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (3, T), 1, VOCAB)
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    params = model.init(jax.random.PRNGKey(0), tokens, memory)["params"]
    pallas_model = TransformerXL(VOCAB, PAL_CFG, dtype=jnp.float32)
    return model, pallas_model, params


@pytest.mark.parametrize("same_length", [False, True])
def test_forward_parity(same_length):
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(0)
    mem_x = init_memory(N_LAYER, 3, M, D_MODEL)
    mem_p = init_memory(N_LAYER, 3, M, D_MODEL)
    for step in range(4):  # memory fill: 0 -> 8 -> 16 -> 24 (full)
        tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
        reset = jnp.asarray([step == 1, False, step == 2])
        lx, mem_x = xla_model.apply({"params": params}, tokens, mem_x, reset,
                                    same_length=same_length)
        lp, mem_p = pal_model.apply({"params": params}, tokens, mem_p, reset,
                                    same_length=same_length)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   rtol=2e-4, atol=2e-4, err_msg=f"step {step}")
        # the pallas path keeps a RING buffer; compare via the logical view,
        # over the valid region only (left pad is stale ring data vs zeros)
        from commu_tpu.models.transformer_xl import logical_memory_view
        valid = int(mem_x.count)
        lp_mem = np.asarray(logical_memory_view(mem_p))[:, :, M - valid:]
        lx_mem = np.asarray(mem_x.hidden)[:, :, M - valid:]
        np.testing.assert_allclose(lp_mem, lx_mem, rtol=2e-4, atol=2e-4)
        assert int(mem_p.count) == int(mem_x.count)


def test_gradient_parity():
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(1)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    # half-filled memory with nonzero contents
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)

    def loss(model):
        def f(p):
            logits, _ = model.apply({"params": p}, tokens, memory)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return f

    gx = jax.grad(loss(xla_model))(params)
    gp = jax.grad(loss(pal_model))(params)
    flat_x = jax.tree_util.tree_flatten_with_path(gx)[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(gp)[0])
    for path, vx in flat_x:
        vp = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("fwd_hp", ["2", "1"])
def test_proj_in_fwd_parity(monkeypatch, fwd_hp):
    """COMMU_PROJ_IN_FWD=1 (memory k/v projected inside the forward kernel)
    must match the separate-projection path bit-for-bit in value and grads —
    both with one head group (static head indexing) and with hp < heads
    (dynamic indexing through the freshly-written output block)."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(2)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.setenv("COMMU_FWD_HP", fwd_hp)
    monkeypatch.delenv("COMMU_PROJ_IN_FWD", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_PROJ_IN_FWD", "1")
    l1, g1 = run()
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        np.testing.assert_array_equal(
            np.asarray(flat1[path]), np.asarray(v0),
            err_msg=jax.tree_util.keystr(path))


def test_fwd_rp_parity(monkeypatch):
    """COMMU_FWD_RP>1 (multiple batch rows per forward program) must match
    the one-row-per-program default bit-for-bit in value and grads: each
    (row, head) unit's arithmetic is unchanged — only the grid shape and
    the software-pipeline interleave differ — and the per-row dropout
    seeds / reset rows are keyed by the GLOBAL row index."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(3)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)
    reset = jnp.asarray([False, True, False])

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory, reset)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_FWD_RP", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_FWD_RP", "3")  # batch is 3: one program/row-trio
    l1, g1 = run()
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        np.testing.assert_array_equal(
            np.asarray(flat1[path]), np.asarray(v0),
            err_msg=jax.tree_util.keystr(path))


def test_bwd_rp_parity(monkeypatch):
    """COMMU_BWD_RP>1 (multiple batch rows per memory-fused backward
    program) must match the default bit-for-bit in value and grads: each
    (row, head) unit's arithmetic is unchanged, and the dWk/dWv/dWr
    per-row partials fold into the grid-resident accumulators in global
    batch order, reproducing rp=1's f32 add sequence exactly."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(4)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)
    reset = jnp.asarray([False, True, False])

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory, reset)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_BWD_RP", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_BWD_RP", "3")  # batch is 3: one program/row-trio
    l1, g1 = run()
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        key = jax.tree_util.keystr(path)
        if "r_w_bias" in key or "r_r_bias" in key:
            # the [dh]-sized bias-gradient VPU reductions (sum over T) may
            # be re-vectorized by XLA in the differently-unrolled rp>1
            # program — a ~1-ulp association artifact of the compiler, not
            # of the kernel's accumulation order (which is batch-global for
            # dWk/dWv/dWr and exact, as the w_r / wk/wv rows verify)
            np.testing.assert_allclose(
                np.asarray(flat1[path]), np.asarray(v0),
                rtol=1e-5, atol=1e-12, err_msg=key)
        else:
            np.testing.assert_array_equal(
                np.asarray(flat1[path]), np.asarray(v0), err_msg=key)


def test_o_in_ffn_parity(monkeypatch):
    """COMMU_O_IN_FFN=1 (o projection fused into the FFN-block kernel) must
    match the separate o-einsum path in value and grads to fp tolerance (the
    matmul operand orders differ, so bit-equality is not expected)."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(3)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_O_IN_FFN", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_O_IN_FFN", "1")
    l1, g1 = run()
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-6)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(v0), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_clamp_softmax_parity_and_underflow_guard(monkeypatch):
    """COMMU_SOFTMAX=clamp must match the max-subtracting softmax for scores
    in the shift-equal range, and must stay FINITE (not 1/0 = NaN) when an
    entire row's scores sit below exp's f32 underflow (~-87) — the mode that
    NaN'd a real-data training run at step 95 before the denominator guard
    (reference softmax being replaced: /root/reference/commu/model/model.py:330)."""
    from commu_tpu.ops.fused_attention import _attn_softmax

    rng = np.random.RandomState(7)
    s_normal = jnp.asarray(rng.randn(8, 16) * 10.0, dtype=jnp.float32)
    s_under = s_normal - 500.0  # whole rows below exp underflow

    def run(s):
        operand, chk, col_scale = _attn_softmax(None, s, 0, 0, t=8, k_len=16,
                                                dropout_p=0.0, train=False)
        p = np.asarray(operand, dtype=np.float64)
        if col_scale is not None:  # deferred normalization (COMMU_DEFER_NORM)
            p = p * np.asarray(col_scale, dtype=np.float64)
        return p

    monkeypatch.setenv("COMMU_SOFTMAX", "max")
    p_max = run(s_normal)
    monkeypatch.setenv("COMMU_SOFTMAX", "clamp")
    p_clamp = run(s_normal)
    np.testing.assert_allclose(p_clamp, p_max, rtol=1e-6, atol=1e-7)

    p_under = run(s_under)
    assert np.isfinite(p_under).all()  # guard: degraded-to-zero, never NaN
    assert (p_under == 0.0).all()
    # the subtracting form is shift-invariant there (up to the f32 mantissa
    # bits the -500 shift itself costs the scores)
    monkeypatch.setenv("COMMU_SOFTMAX", "max")
    np.testing.assert_allclose(run(s_under), p_max, rtol=5e-3, atol=1e-6)


def test_bd_int8_parity(monkeypatch):
    """COMMU_BD_INT8 (opt-in): the int8-BD forward must track the default
    path within the quantization error budget — two int8 operand roundings
    on a rank-512 accumulation give ~1% RMS on the BD component, so logits
    agree to a few percent (vs 2e-4 on the bf16 path), and the model must
    still be exactly reproducible run-to-run."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(3)
    mem_p = init_memory(N_LAYER, 3, M, D_MODEL)
    mem_q = init_memory(N_LAYER, 3, M, D_MODEL)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    reset = jnp.asarray([False] * 3)

    lp, mem_p = pal_model.apply({"params": params}, tokens, mem_p, reset)
    monkeypatch.setenv("COMMU_BD_INT8", "1")
    lq, mem_q = pal_model.apply({"params": params}, tokens, mem_q, reset)
    lq2, _ = pal_model.apply({"params": params}, tokens,
                             init_memory(N_LAYER, 3, M, D_MODEL), reset)

    lp, lq = np.asarray(lp, np.float64), np.asarray(lq, np.float64)
    # deterministic: identical inputs -> identical int8 outputs
    np.testing.assert_array_equal(np.asarray(lq2), np.asarray(lq))
    # close to the exact path in absolute logit terms
    err = np.abs(lq - lp)
    scale = np.abs(lp).mean()
    assert err.max() < 0.35 * scale and err.mean() < 0.02 * scale, \
        (err.max(), err.mean(), scale)
    # and far more correlated than any wrong-math failure mode
    corr = np.corrcoef(lp.ravel(), lq.ravel())[0, 1]
    assert corr > 0.999, corr


def test_bd_int8_bwd_parity(monkeypatch):
    """COMMU_BD_INT8_BWD (opt-in): the int8 dphi backward must track the
    bf16 backward within the quantization error budget.  The FORWARD value
    is untouched (the flag only changes the backward's dphi matmul), dv and
    the content-path dk are bit-identical (ds itself is not quantized —
    only the copy entering the dphi contraction), and the position-path
    gradients (w_r, r_r_bias, and dq's position component) agree to a few
    percent."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(7)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)
    reset = jnp.asarray([False] * 3)

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory, reset)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_BD_INT8_BWD", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_BD_INT8_BWD", "1")
    l1, g1 = run()
    l2, g2 = run()

    # the forward is untouched; the int8 backward is deterministic
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        key = jax.tree_util.keystr(path)
        v0, v1 = np.asarray(v0, np.float64), np.asarray(flat1[path], np.float64)
        scale = max(np.abs(v0).max(), 1e-12)
        err = np.abs(v1 - v0).max() / scale
        # every gradient stays within a few percent of the exact path;
        # most (content path, dv, FFN, embeddings) are much closer
        assert err < 0.05, (key, err)
        corr = np.corrcoef(v0.ravel(), v1.ravel())[0, 1] if v0.size > 1 else 1.0
        assert corr > 0.995, (key, corr)


def test_int8_dq_dk_parity(monkeypatch):
    """COMMU_INT8_DQ / COMMU_INT8_DK (opt-in probe levers): the int8 query
    and key cotangent matmuls must track the bf16 backward within the
    quantization budget.  Both scale factorizations are exact along the
    output dims, so only the operand roundings approximate; the forward is
    untouched and dv is bit-identical (ds itself is never mutated)."""
    xla_model, pal_model, params = _setup()
    rng = np.random.RandomState(9)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)
    warm = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    _, memory = xla_model.apply({"params": params}, warm, memory)
    reset = jnp.asarray([False] * 3)

    def run():
        def f(p):
            logits, _ = pal_model.apply({"params": p}, tokens, memory, reset)
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_INT8_DQ", raising=False)
    monkeypatch.delenv("COMMU_INT8_DK", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_INT8_DQ", "1")
    monkeypatch.setenv("COMMU_INT8_DK", "1")
    l1, g1 = run()

    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        key = jax.tree_util.keystr(path)
        v0 = np.asarray(v0, np.float64)
        v1 = np.asarray(flat1[path], np.float64)
        scale = max(np.abs(v0).max(), 1e-12)
        assert np.abs(v1 - v0).max() / scale < 0.05, key
        if v0.size > 1:
            assert np.corrcoef(v0.ravel(), v1.ravel())[0, 1] > 0.99, key


@pytest.mark.parametrize("shape", [(128, 1152), (128, 1024), (6, 1152),
                                   (125, 128)])
def test_dropout_bits8_rate_and_replay(monkeypatch, shape):
    """COMMU_DROPOUT_BITS=8 (quarter-width draws): the realized Bernoulli
    rate must be exactly effective_dropout_p(p) = round(p*256)/256 on EVERY
    shape path (quarter/half/full fallbacks compare wider draws against
    width-scaled thresholds), replay must be deterministic per seed, and
    keep_scale_for must divide by the realized rate."""
    from commu_tpu.ops import fused_attention as fa

    p = 0.1
    monkeypatch.setenv("COMMU_DROPOUT_BITS", "8")
    p_eff = fa.effective_dropout_p(p)
    assert p_eff == 26 / 256
    assert np.isclose(fa.keep_scale_for(p, True), 1.0 / (1.0 - 26 / 256))
    assert fa.keep_scale_for(p, False) == 1.0

    def draw(seed):
        fa._prng_seed(seed)
        return np.asarray(fa.random_keep(shape, p))

    m1, m2, m3 = draw(7), draw(7), draw(8)
    assert (m1 == m2).all()           # replay: same seed, same mask
    assert (m1 != m3).any()           # seed-varying
    # the interp-PRNG is a hash, not the chip generator, but uniform enough
    # that the empirical rate lands near the quantized target
    rate = 1.0 - m1.mean()
    assert abs(rate - p_eff) < 0.01, (rate, p_eff)

    monkeypatch.setenv("COMMU_DROPOUT_BITS", "16")
    assert fa.effective_dropout_p(p) == round(p * 65536) / 65536
    # the 16-bit full-width fallback compares the MASKED high half (raw
    # 32-bit compares lower as signed on the chip — verify_tpu check 5b)
    fa._prng_seed(7)
    m16 = np.asarray(fa.random_keep((125, 128), p))
    assert abs((1.0 - m16.mean()) - fa.effective_dropout_p(p)) < 0.01


def test_scale_hoist_parity(monkeypatch):
    """COMMU_SCALE_HOIST=1 (dropout keep-scale folded into the [dh, T]
    output instead of the [T, K] probability plane) is mathematically
    identical — same masks (same seeds), same checkpoint bits, scale
    placement only — so loss and every gradient must agree to float
    rounding."""
    _, pal_model, params = _setup()
    drop_cfg = dataclasses.replace(PAL_CFG, dropout=0.1,
                                   attention_dropout=0.25)
    drop_model = TransformerXL(VOCAB, drop_cfg, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    tokens = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    targets = jnp.asarray(rng.randint(1, VOCAB, size=(3, T)))
    memory = init_memory(N_LAYER, 3, M, D_MODEL)

    def run():
        def f(p):
            logits, _ = drop_model.apply(
                {"params": p}, tokens, memory, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(9)})
            nll = token_nll(logits, targets)
            return (nll * (targets != PAD_ID)).mean()
        return jax.value_and_grad(f)(params)

    monkeypatch.delenv("COMMU_SCALE_HOIST", raising=False)
    l0, g0 = run()
    monkeypatch.setenv("COMMU_SCALE_HOIST", "1")
    l1, g1 = run()
    assert np.isfinite(float(l0))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(g1)[0])
    for path, v0 in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(v0), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
