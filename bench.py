"""Headline benchmark: training throughput (tokens/sec/chip).

Runs the full-size ComMU Transformer-XL (6 layers, 10 heads, d_model 500,
vocab 729 — reference: commu/model/config_helper.py:4-32) through the fused
jit train step at the reference's training shape (global batch 256, tgt 128,
mem 1024) on whatever accelerator JAX exposes, and prints ONE JSON line.

``vs_baseline`` compares against an ESTIMATED reference throughput of 70k
tokens/s on one A100 (13.9M params, fp32/TF32 torch, batch 64/GPU). The
reference publishes no numbers; the only *measured* reference anchor is this
host's CPU run — 163.4 tokens/s train, 44.9 ms/token generation
(scripts/bench_reference.py, BASELINE_ref_measured.json) — which cannot be
honestly scaled to an A100 without hardware assumptions, so the 70k estimate
is kept as the denominator and labeled as an estimate wherever the resulting
multiplier is quoted (see BASELINE.md "Measured reference anchors").
The north-star target is 3x the estimate, i.e. 210k tokens/s/chip.
"""
import json
import time

BASELINE_TOKENS_PER_SEC = 70_000.0  # estimated reference A100 (BASELINE.md)


def main():
    import os
    # the production-training fast mode (train.py defaults to it too):
    # forward BD + backward dphi matmuls on the MXU int8 path — convergence
    # evidence in CONVERGENCE_pallas.json / CONVERGENCE_bd_int8_bwd.json /
    # CONVERGENCE_bd_int8.json; COMMU_BD_INT8=0 COMMU_BD_INT8_BWD=0 benches
    # the parity-exact bf16 kernels instead
    os.environ.setdefault("COMMU_BD_INT8", "1")
    os.environ.setdefault("COMMU_BD_INT8_BWD", "1")
    os.environ.setdefault("COMMU_DROPOUT_BITS", "8")
    from commu_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.models.transformer_xl import TransformerXL
    from commu_tpu.parallel import make_mesh, shard_train_step
    from commu_tpu.training.step import (create_train_state, init_train_memory,
                                         make_train_step,
                                         resolve_physical_chunks)
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    cfg = get_default_cfg_training()
    tcfg = cfg.train
    batch, tgt = tcfg.batch_size, tcfg.tgt_length

    import os
    env_chunks = os.environ.get("COMMU_PHYSICAL_CHUNKS")
    physical = resolve_physical_chunks(
        cfg, int(env_chunks) if env_chunks else None)
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg)
    # the production jit path: 1-device mesh, donated ring buffer with the
    # row-major layout pinned at the jit boundary (commu_tpu.parallel.mesh)
    from commu_tpu.models.transformer_xl import resolve_attn_impl
    transposed = resolve_attn_impl(cfg.model) == "pallas"
    step = shard_train_step(
        make_train_step(model, cfg, physical_chunks=physical), make_mesh(1),
        transposed=transposed)
    memory = init_train_memory(
        cfg.model.num_layers, batch, tcfg.mem_length, cfg.model.units,
        physical, dtype=jnp.bfloat16, transposed=transposed,
        block_len=tgt)

    rng = np.random.RandomState(0)
    def make_batch():
        return (rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32),
                rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32),
                np.zeros(batch, dtype=bool))

    key = jax.random.PRNGKey(1)
    batches = [make_batch() for _ in range(4)]

    # warmup / compile (float() forces a real device->host readback — on the
    # tunneled runtime block_until_ready alone acks before execution finishes)
    for i in range(3):
        state, memory, metrics = step(state, memory, *batches[i % 4], key)
    float(metrics["nll_sum"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, memory, metrics = step(state, memory, *batches[i % 4], key)
    float(metrics["nll_sum"])
    dt = time.perf_counter() - t0

    tokens_per_sec = n_steps * batch * tgt / dt
    print(json.dumps({
        "metric": "train_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
    }), flush=True)

    # Generation latency suite (corpus-real episode lengths, batch 1/8/32):
    # emitted as a sibling JSON file so the driver's bench step records it
    # alongside the training metric (VERDICT r2 #6).  COMMU_BENCH_GEN=0
    # skips it; failures never disturb the training metric above.
    if os.environ.get("COMMU_BENCH_GEN", "1") != "0":
        import sys
        import traceback
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            from bench_generation import run_suite
            res = run_suite(batches=(1, 8, 32), rounds=5)
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_generation.json")
            with open(out, "w") as fh:
                json.dump(res, fh, indent=1)
                fh.write("\n")
            print(f"generation suite written to {out}", file=sys.stderr)
        except Exception:  # noqa: BLE001 - bench must not fail the metric
            traceback.print_exc()


if __name__ == "__main__":
    main()
