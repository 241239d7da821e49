"""Interleaved A/B probe harness for train-step variants.

Builds the full-size production train step once per named env-variant (the
kernel knobs are read at trace time, so setting os.environ between builds
gives each jit its own kernel configuration), then times the variants in
interleaved rounds to cancel chip run-to-run drift.

Usage:
    python scripts/probe_step.py A= B=COMMU_PROJ_RP:4 C=COMMU_PIPE_DEPTH:4
        [--steps 10] [--rounds 3]

Each variant is NAME=K:V,K:V,... (empty spec = current defaults).
Prints ms/step per variant per round plus the median.
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    from commu_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.models.transformer_xl import (TransformerXL,
                                                 resolve_attn_impl)
    from commu_tpu.parallel import make_mesh, shard_train_step
    from commu_tpu.training.step import (create_train_state, init_train_memory,
                                         make_train_step,
                                         resolve_physical_chunks)
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    cfg = get_default_cfg_training()
    # COMMU_PROBE_DROPOUT overrides both dropout rates (e.g. 0 isolates the
    # in-kernel PRNG/mask cost from the rest of the step)
    pd = os.environ.get("COMMU_PROBE_DROPOUT")
    if pd is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, dropout=float(pd), attention_dropout=float(pd)))
    tcfg = cfg.train
    batch, tgt = tcfg.batch_size, tcfg.tgt_length
    physical = resolve_physical_chunks(cfg)
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.bfloat16)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg)
    transposed = resolve_attn_impl(cfg.model) == "pallas"
    step = shard_train_step(
        make_train_step(model, cfg, physical_chunks=physical), make_mesh(1),
        transposed=transposed)
    memory = init_train_memory(
        cfg.model.num_layers, batch, tcfg.mem_length, cfg.model.units,
        physical, dtype=jnp.bfloat16, transposed=transposed, block_len=tgt)
    rng = np.random.RandomState(0)
    data = rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32)
    target = rng.randint(1, VOCAB_SIZE, size=(batch, tgt), dtype=np.int32)
    reset = np.zeros(batch, dtype=bool)
    key = jax.random.PRNGKey(1)
    return step, state, memory, (data, target, reset), key


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+", metavar="NAME=K:V,K:V")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    specs = []
    for v in args.variants:
        name, _, kvs = v.partition("=")
        env = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, val = kv.partition(":")
                env[k] = val
        specs.append((name, env))

    # knobs any variant touches; reset to ambient defaults between builds
    all_keys = sorted({k for _, env in specs for k in env})
    ambient = {k: os.environ.get(k) for k in all_keys}

    # Sequential build -> time -> free: the full-size state + blocked ring
    # buffer is ~2 GB of HBM per variant, so holding several variants for an
    # interleaved A/B exhausts the chip.  Rounds within a variant still
    # bracket chip drift; compare medians.
    results = {}
    shape = None
    for name, env in specs:
        for k in all_keys:
            if ambient[k] is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = ambient[k]
        os.environ.update(env)
        t0 = time.perf_counter()
        try:
            step, state, memory, batch, key = build_step()
            s, m = state, memory
            for _ in range(3):
                s, m, metrics = step(s, m, *batch, key)
            float(metrics["nll_sum"])
        except Exception as exc:  # noqa: BLE001 - probe harness, keep going
            print(f"[{name}] FAILED to build/compile: "
                  f"{type(exc).__name__}: {str(exc)[:300]}", flush=True)
            continue
        print(f"[{name}] built+compiled in {time.perf_counter()-t0:.0f}s "
              f"env={env}", flush=True)
        shape = batch[0].shape
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, m, metrics = step(s, m, *batch, key)
            float(metrics["nll_sum"])
            dt = (time.perf_counter() - t0) / args.steps * 1e3
            times.append(dt)
            print(f"round {r} [{name}] {dt:.2f} ms/step", flush=True)
        results[name] = times
        del step, state, memory, s, m, batch, metrics
        import gc
        gc.collect()
        import jax as _jax
        _jax.clear_caches()

    print("\n== medians ==")
    for name, times in results.items():
        med = statistics.median(times)
        b, t = shape
        print(f"[{name}] {med:.2f} ms/step  "
              f"({b * t / med * 1e3 / 1e3:.1f}k tokens/s)")


if __name__ == "__main__":
    main()
