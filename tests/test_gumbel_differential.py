"""Differential: forward_generate_gumbel vs the executed reference.

The reference's ``MemTransformerLM.forward_generate_gumbel``
(/root/reference/commu/model/model.py:630-676) is dead code in its own
pipelines but part of the public model surface; this closes the last
untested reference API.  Both sides run under a SHARED uniform draw: the
reference's ``sample_gumbel`` calls ``torch.rand(shape).cuda()``, so the
test injects the draw by patching ``torch.rand`` and neutralizing the
hard-coded ``.cuda()`` (no CUDA on this host) — harness shims only, the
reference module itself is untouched.
"""
import types

import numpy as np
import pytest

import jax.numpy as jnp

from commu_tpu.config import ModelConfig
from commu_tpu.models import TransformerXL, flax_params_from_torch_state, init_memory
from commu_tpu.models.transformer_xl import forward_generate_gumbel

from conftest import add_reference_to_path, reference_available

N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 64
TGT, MEM, VOCAB = 8, 24, 120
CFG = ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                  inner_size=D_INNER, dropout=0.0, attention_dropout=0.0)


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
@pytest.mark.parametrize("temperature", [1.0, 0.5])
def test_gumbel_matches_reference(monkeypatch, temperature):
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    torch.set_num_threads(1)
    from commu.model.model import MemTransformerLM

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=False,
        ),
        TRAIN=types.SimpleNamespace(tgt_length=TGT, mem_length=MEM),
    )
    torch.manual_seed(3)
    ref = MemTransformerLM(cfg, vocab=list(range(VOCAB)))
    ref.eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = flax_params_from_torch_state(state, CFG)
    model = TransformerXL(vocab_size=VOCAB, cfg=CFG)

    rng = np.random.RandomState(7)
    data_bt = rng.randint(0, VOCAB, size=(3, TGT))
    u_tbv = rng.uniform(size=(TGT, 3, VOCAB)).astype(np.float32)

    # shared-noise injection: the reference draws torch.rand(logits.size())
    # and immediately .cuda()s it (model.py:634-636)
    def _fixed_rand(*shape, **kw):
        flat = []
        for s in shape:
            flat.extend(s) if isinstance(s, (tuple, torch.Size)) else flat.append(s)
        assert tuple(flat) == u_tbv.shape, (flat, u_tbv.shape)
        return torch.from_numpy(u_tbv)

    monkeypatch.setattr(torch, "rand", _fixed_rand)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=True)

    data = torch.from_numpy(np.ascontiguousarray(data_bt.T)).long()
    with torch.no_grad():
        ref_y, ref_mems = ref.forward_generate_gumbel(data, temperature, None)
    ref_y = ref_y.numpy().transpose(1, 0, 2)  # [B, T, V]

    memory = init_memory(N_LAYER, 3, MEM, D_MODEL)
    ours_y, new_memory = forward_generate_gumbel(
        model, params, jnp.asarray(data_bt), memory, temperature,
        u_noise=jnp.asarray(u_tbv.transpose(1, 0, 2)))
    ours_y = np.asarray(ours_y)

    # forward value is the straight-through one-hot: argmax must agree
    # exactly, values near-exactly (fp cancellation in (hard - y) + y)
    assert (ref_y.argmax(-1) == ours_y.argmax(-1)).all()
    np.testing.assert_allclose(ours_y, ref_y, rtol=1e-4, atol=1e-5)

    # memory advanced identically on both sides
    # (reference [L+1, mlen, B, D] vs ours right-aligned [L+1, B, cap, D])
    ref_mem = ref_mems.numpy()
    mlen = ref_mem.shape[1]
    ours_mem = np.asarray(new_memory.hidden)[:, :, MEM - mlen:, :]
    np.testing.assert_allclose(ours_mem, ref_mem.transpose(0, 2, 1, 3),
                               rtol=2e-4, atol=2e-4)
