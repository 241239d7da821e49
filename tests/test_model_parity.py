"""Numerical parity of the Flax Transformer-XL vs the reference torch model.

Loads the reference ``MemTransformerLM`` (torch, CPU) with a stub cfg, copies
its randomly-initialized weights into the Flax model through the converter,
and compares logits / NLL / memory contents across multi-step scenarios:
fresh memory, partially-filled memory, full (rolling) memory, same_length
eval masking, and per-row reset flags.
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commu_tpu.config import ModelConfig
from commu_tpu.models import (
    Memory,
    TransformerXL,
    flax_params_from_torch_state,
    init_memory,
    token_nll,
)
from commu_tpu.ops.rel_attention import rel_shift, relative_position_embedding

from conftest import add_reference_to_path, reference_available

# small-but-nontrivial dims: d_head=16, uneven T vs M
N_LAYER, N_HEAD, D_MODEL, D_INNER = 3, 4, 64, 128
TGT, MEM = 16, 40
VOCAB = 120

CFG = ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                  inner_size=D_INNER, dropout=0.0, attention_dropout=0.0)


def _torch_reference():
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    # single-threaded torch: multi-thread reduction order varies with system
    # load and was the source of parity flakes at the tight tolerance
    torch.set_num_threads(1)
    ref_model_mod = pytest.importorskip("commu.model.model")

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=False,
        ),
        TRAIN=types.SimpleNamespace(tgt_length=TGT, mem_length=MEM),
    )
    torch.manual_seed(0)
    model = ref_model_mod.MemTransformerLM(cfg, vocab=list(range(VOCAB)))
    model.eval()
    return torch, model


def _flax_from(model):
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = flax_params_from_torch_state(state, CFG)
    flax_model = TransformerXL(vocab_size=VOCAB, cfg=CFG)
    return flax_model, {"params": params}


def _ref_logits(torch, model, data_bt, mems):
    """data_bt: [B, T] numpy -> (logits [B, T, V] numpy, new mems)."""
    data = torch.from_numpy(np.ascontiguousarray(data_bt.T)).long()  # [T, B]
    with torch.no_grad():
        logits, new_mems = model.forward_generate(data, mems)
    return logits.numpy().transpose(1, 0, 2), new_mems


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_logits_parity_across_memory_states():
    torch, ref = _torch_reference()
    flax_model, variables = _flax_from(ref)

    rng = np.random.RandomState(0)
    batch = 3
    memory = init_memory(N_LAYER, batch, MEM, D_MODEL)
    mems = None

    for step in range(4):  # mem fill: 0 -> 16 -> 32 -> 40 (rolling)
        data = rng.randint(0, VOCAB, size=(batch, TGT))
        ref_logits, mems = _ref_logits(torch, ref, data, mems)
        ours_logits, memory = flax_model.apply(
            variables, jnp.asarray(data), memory, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(ours_logits), ref_logits, rtol=2e-4, atol=2e-4,
            err_msg=f"step {step}")

        # memory contents: reference [L+1, mlen, B, D] vs ours right-aligned
        ref_mem = mems.numpy()  # [L+1, mlen, B, D]
        mlen = ref_mem.shape[1]
        ours_mem = np.asarray(memory.hidden)[:, :, MEM - mlen:, :]  # [L+1,B,mlen,D]
        np.testing.assert_allclose(
            ours_mem, ref_mem.transpose(0, 2, 1, 3), rtol=2e-4, atol=2e-4)
        assert int(memory.count) == mlen


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_logits_parity_same_length():
    torch, ref = _torch_reference()
    ref.same_length = True
    flax_model, variables = _flax_from(ref)

    rng = np.random.RandomState(1)
    batch = 2
    memory = init_memory(N_LAYER, batch, MEM, D_MODEL)
    mems = None
    for step in range(4):
        data = rng.randint(0, VOCAB, size=(batch, TGT))
        ref_logits, mems = _ref_logits(torch, ref, data, mems)
        ours_logits, memory = flax_model.apply(
            variables, jnp.asarray(data), memory, same_length=True,
            deterministic=True)
        np.testing.assert_allclose(
            np.asarray(ours_logits), ref_logits, rtol=2e-4, atol=2e-4,
            err_msg=f"step {step}")


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_nll_parity_with_reset_flags():
    torch, ref = _torch_reference()
    flax_model, variables = _flax_from(ref)

    rng = np.random.RandomState(2)
    batch = 4
    memory = init_memory(N_LAYER, batch, MEM, D_MODEL)
    mems = ref.init_mems(N_LAYER)

    for step in range(3):
        data = rng.randint(0, VOCAB, size=(batch, TGT))
        target = rng.randint(0, VOCAB, size=(batch, TGT))
        reset = np.zeros(batch, dtype=bool)
        if step > 0:
            reset[step % batch] = True
            reset[0] = True

        data_t = torch.from_numpy(np.ascontiguousarray(data.T)).long()
        target_t = torch.from_numpy(np.ascontiguousarray(target.T)).long()
        reset_t = torch.from_numpy(reset)
        with torch.no_grad():
            loss, mems = ref(data_t, target_t, reset_t, mems)
        ref_nll = loss.numpy().reshape(TGT, batch).T  # [B, T]

        hidden, memory = flax_model.apply(
            variables, jnp.asarray(data), memory, jnp.asarray(reset),
            deterministic=True, method=TransformerXL.forward)
        logits = flax_model.apply(variables, hidden, method=TransformerXL.logits)
        ours_nll = token_nll(logits, jnp.asarray(target))
        np.testing.assert_allclose(np.asarray(ours_nll), ref_nll,
                                   rtol=2e-4, atol=2e-4, err_msg=f"step {step}")


def test_rel_shift_against_bruteforce():
    """rel_shift must map BD[i, d] (distance-indexed) onto key-indexed scores
    where key j of query i has distance (M + i) - j."""
    rng = np.random.RandomState(3)
    B, H, T, M = 2, 3, 5, 7
    K = M + T
    d_model = 8
    q = rng.randn(B, H, T, d_model)
    r = rng.randn(K, d_model)  # r[d] embeds distance K-1-d

    bd_raw = np.einsum("bhid,jd->bhij", q, r)
    shifted = np.asarray(rel_shift(jnp.asarray(bd_raw)))

    for i in range(T):
        for j in range(K):
            dist = (M + i) - j
            if 0 <= dist <= K - 1:
                expected = q[:, :, i] @ r[K - 1 - dist]
                np.testing.assert_allclose(shifted[:, :, i, j], expected,
                                           rtol=1e-5, atol=1e-6)  # f32 path


def test_relative_position_embedding_values():
    emb = np.asarray(relative_position_embedding(4, 8))
    # last row embeds distance 0: sin=0, cos=1
    np.testing.assert_allclose(emb[-1, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[-1, 4:], 1.0, atol=1e-7)
    assert emb.shape == (4, 8)
