"""On-device regression check for the persistent-compile-cache layout bug.

Through round 3 the persistent cache was unsafe: with a warm cache the
jitted ``init_train_memory`` zeros came back with a B<->D-swapped tiled
layout while the cold compile produced row-major, and the layout-pinned
train step then rejected its own ring buffer ("Layout passed to jit does
not match the layout on the respective arg").  The fix pins the init's
output layout (ops.layout.pinned_rowmajor_zeros).  This script proves the
fix on the real chip: it runs the production pallas train step in a COLD
subprocess (fresh cache dir), then again in a WARM subprocess against the
now-populated cache, and reports both results plus the warm process's
compile-time saving.

Run:  python scripts/verify_cache.py [--emit out.json]
Prints one JSON line; exits nonzero if either phase fails.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from commu_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.models.transformer_xl import TransformerXL, resolve_attn_impl
from commu_tpu.parallel import make_mesh, shard_train_step
from commu_tpu.training.step import (create_train_state, init_train_memory,
                                     make_train_step, resolve_physical_chunks)
from commu_tpu.vocab.event_tokens import VOCAB_SIZE

B, T, M = 16, 128, 1024
cfg = TrainingConfig(
    model=ModelConfig(attn_impl="pallas", dropout=0.0, attention_dropout=0.0),
    train=TrainConfig(batch_size=B, batch_chunk=1, tgt_length=T, mem_length=M),
    evaluate=EvaluateConfig(),
)
dt = jnp.bfloat16
model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=dt)
state = create_train_state(jax.random.PRNGKey(0), model, cfg)
physical = resolve_physical_chunks(cfg)
transposed = resolve_attn_impl(cfg.model) == "pallas"
step = shard_train_step(
    make_train_step(model, cfg, physical_chunks=physical),
    make_mesh(1), transposed=transposed)
memory = init_train_memory(cfg.model.num_layers, B, M, cfg.model.units,
                           physical, dtype=dt, transposed=transposed,
                           block_len=T)
rng = np.random.RandomState(0)
inp = jnp.asarray(rng.randint(1, VOCAB_SIZE, size=(B, T)), jnp.int32)
tgt = jnp.asarray(rng.randint(1, VOCAB_SIZE, size=(B, T)), jnp.int32)
reset = jnp.zeros((B,), bool)
t0 = time.perf_counter()
state, memory, metrics = step(state, memory, inp, tgt, reset,
                              jax.random.PRNGKey(1))
jax.block_until_ready(metrics["nll_sum"])
first_step_s = time.perf_counter() - t0
state, memory, metrics = step(state, memory, inp, tgt, reset,
                              jax.random.PRNGKey(2))
jax.block_until_ready(metrics["nll_sum"])
print("CHILD_OK first_step_s=%.1f nll=%.3f" % (
    first_step_s, float(metrics["nll_sum"])))
"""


def run_child(cache_dir: str):
    env = dict(os.environ)
    env["COMMU_COMPILE_CACHE"] = "1"
    env["COMMU_COMPILE_CACHE_DIR"] = cache_dir
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=_REPO)], env=env,
        cwd=tempfile.gettempdir(), capture_output=True, text=True,
        timeout=1200)
    ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
    first_step_s = None
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_OK"):
            first_step_s = float(line.split("first_step_s=")[1].split()[0])
    return ok, first_step_s, proc.stdout[-2000:] + proc.stderr[-4000:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", metavar="PATH")
    args = ap.parse_args()

    cache_dir = tempfile.mkdtemp(prefix="commu_cache_check_")
    t0 = time.time()
    cold_ok, cold_s, cold_log = run_child(cache_dir)
    warm_ok, warm_s, warm_log = run_child(cache_dir)
    result = {
        "check": "persistent_compile_cache",
        "ok": bool(cold_ok and warm_ok),
        "cold_first_step_s": cold_s,
        "warm_first_step_s": warm_s,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if args.emit:
        with open(args.emit, "w") as fh:
            fh.write(json.dumps(result) + "\n")
    if not result["ok"]:
        sys.stderr.write("--- cold ---\n" + cold_log +
                         "\n--- warm ---\n" + warm_log + "\n")
        sys.exit(1)


if __name__ == "__main__":
    main()
