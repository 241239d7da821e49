"""NaN bisect: run real-data train steps until metrics go non-finite.

Usage: python scripts/nan_bisect.py TAG [N_STEPS] [CORPUS_DIR]
Env knobs (COMMU_SOFTMAX, COMMU_ATTN_IMPL, ...) select the variant.
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(tag, n_steps, corpus):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.data.dataset import ComMUDataset
    from commu_tpu.models.transformer_xl import (TransformerXL,
                                                 resolve_attn_impl)
    from commu_tpu.parallel import make_mesh, shard_train_step
    from commu_tpu.training.step import (create_train_state, init_train_memory,
                                         make_train_step,
                                         resolve_physical_chunks)
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    cfg = get_default_cfg_training()
    tcfg = cfg.train
    ds = ComMUDataset(corpus)
    it = ds.train_iterator(tcfg.batch_size, tcfg.tgt_length, shuffle=True,
                           seed=tcfg.seed)
    physical = resolve_physical_chunks(cfg)
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg)
    transposed = resolve_attn_impl(cfg.model) == "pallas"
    step = shard_train_step(
        make_train_step(model, cfg, physical_chunks=physical), make_mesh(1),
        transposed=transposed)
    memory = init_train_memory(
        cfg.model.num_layers, tcfg.batch_size, tcfg.mem_length,
        cfg.model.units, physical, dtype=jnp.bfloat16, transposed=transposed,
        block_len=tcfg.tgt_length)
    rng = jax.random.PRNGKey(tcfg.seed)
    _, key = jax.random.split(rng)  # trainer's run_rng
    for i in range(n_steps):
        b = next(it)
        state, memory, metrics = step(state, memory, np.asarray(b.inputs),
                                      np.asarray(b.targets),
                                      np.asarray(b.reset), key)
        nll_sum = float(metrics["nll_sum"])
        tok = float(metrics["token_count"])
        gnorm = float(metrics["grad_norm"])
        nll = nll_sum / max(tok, 1.0)
        if i % 10 == 0 or not (math.isfinite(nll) and math.isfinite(gnorm)):
            print(f"[{tag}] step {i}: nll={nll:.4f} gnorm={gnorm:.4f} "
                  f"tok={tok:.0f}", flush=True)
        if not (math.isfinite(nll) and math.isfinite(gnorm)):
            print(f"[{tag}] FIRST NON-FINITE at step {i}", flush=True)
            return i
    print(f"[{tag}] finite through {n_steps} steps", flush=True)
    return -1


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    corpus = sys.argv[3] if len(sys.argv) > 3 else "/tmp/corpus_npy"
    run(tag, n, corpus)
