"""On-device regression gate for the persistent-compile-cache policy.

Two phases, each a COLD subprocess (fresh cache dir) followed by a WARM
subprocess against the now-populated cache:

1. TRAIN (opt-in cache, COMMU_COMPILE_CACHE=1): the production pallas
   train step with its layout-pinned donated ring buffer.  The cache-key
   collision that swapped ``init_train_memory``'s layout is fixed by the
   salted pin (ops.layout.pinned_rowmajor_zeros); this phase gates that
   fix AND detects the remaining PJRT warm-load result-layout bug (see
   commu_tpu.utils.jax_cache) on runtimes where it is fixed — the day the
   warm child passes here, the train default can flip on.

2. GENERATION (cache ON BY DEFAULT — the pin-free path): a small jit
   episode cold vs warm; the warm child must reproduce the cold child's
   token sequence EXACTLY and skip the episode compile.  This is the gate
   behind serving-grade cold start (utils.jax_cache policy).

Run:  python scripts/verify_cache.py [--emit out.json]
Prints one JSON line; exits nonzero on failure.
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
    # this gate measures the XLA compile cache in isolation: the AOT
    # episode store (utils.aot_cache) must not serve the warm child
    env["COMMU_AOT_CACHE"] = "0"
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


_GEN_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
# deliberately NOT setting COMMU_COMPILE_CACHE: the generation stack is
# pin-free and must enable the cache BY DEFAULT (utils.jax_cache policy)
os.environ.pop("COMMU_COMPILE_CACHE", None)
from commu_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache(pinned_layouts=False)

import jax
import jax.numpy as jnp

from commu_tpu.config import InferenceConfig, ModelConfig
from commu_tpu.generation import jit_sampler
from commu_tpu.generation.container import GenerationInput
from commu_tpu.models.transformer_xl import TransformerXL, init_memory
from commu_tpu.vocab.event_tokens import VOCAB_SIZE
from commu_tpu.vocab.meta_codec import encode_meta

cfg = ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                  dropout=0.0, attention_dropout=0.0, same_length=True)
icfg = InferenceConfig(memory_length=256, generation_length=64)
model = TransformerXL(VOCAB_SIZE, cfg)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                    init_memory(2, 1, 4, 32))["params"]
inp = GenerationInput(
    bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
    num_measures=4.0, inst="acoustic_piano", genre="newage",
    min_velocity=60, max_velocity=80, track_role="main_melody",
    rhythm="standard", output_dir=".", num_generate=1, top_k=32,
    temperature=0.0, chord_progression=["Am"] * 32)
meta = list(encode_meta(inp.midi_meta()))

t0 = time.perf_counter()
episode, chord_cap = jit_sampler.build_episode(model, params, cfg, icfg,
                                               [inp] * 2)
outs, failed, rems = jit_sampler.run_episode(
    episode, chord_cap, [inp] * 2, [meta] * 2, jax.random.PRNGKey(0))
first_episode_s = time.perf_counter() - t0
print("GEN_OK first_episode_s=%.1f seq=%s" % (
    first_episode_s, ",".join(map(str, outs[0]))))
"""


def run_gen_child(cache_dir: str):
    env = dict(os.environ)
    env.pop("COMMU_COMPILE_CACHE", None)
    env["COMMU_COMPILE_CACHE_DIR"] = cache_dir
    # isolate the compile cache under test from the AOT episode store
    env["COMMU_AOT_CACHE"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c", _GEN_CHILD.format(repo=_REPO)], env=env,
        cwd=tempfile.gettempdir(), capture_output=True, text=True,
        timeout=1200)
    ok = proc.returncode == 0 and "GEN_OK" in proc.stdout
    first_s, seq = None, None
    for line in proc.stdout.splitlines():
        if line.startswith("GEN_OK"):
            first_s = float(line.split("first_episode_s=")[1].split()[0])
            seq = line.split("seq=")[1].strip()
    return ok, first_s, seq, proc.stdout[-2000:] + proc.stderr[-4000:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", metavar="PATH")
    args = ap.parse_args()

    cache_dir = tempfile.mkdtemp(prefix="commu_cache_check_")
    t0 = time.time()
    cold_ok, cold_s, cold_log = run_child(cache_dir)
    warm_ok, warm_s, warm_log = run_child(cache_dir)

    # generation phase: pin-free, so the cache is ON BY DEFAULT there —
    # the warm process must reproduce the cold process's tokens exactly
    # and skip the episode compile
    gen_dir = tempfile.mkdtemp(prefix="commu_cache_gen_")
    gcold_ok, gcold_s, gcold_seq, gcold_log = run_gen_child(gen_dir)
    gwarm_ok, gwarm_s, gwarm_seq, gwarm_log = run_gen_child(gen_dir)
    gen_match = bool(gcold_ok and gwarm_ok and gcold_seq == gwarm_seq)

    result = {
        "check": "persistent_compile_cache",
        # the TRAIN warm child is informational: it fails on runtimes with
        # the PJRT warm-load result-layout bug (the reason the train cache
        # stays opt-in) and its passing is the signal to flip that default
        "ok": bool(cold_ok and gen_match),
        "train_warm_ok": bool(warm_ok),
        "cold_first_step_s": cold_s,
        "warm_first_step_s": warm_s,
        "gen_cold_first_episode_s": gcold_s,
        "gen_warm_first_episode_s": gwarm_s,
        "gen_tokens_identical": gen_match,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    if args.emit:
        with open(args.emit, "w") as fh:
            fh.write(json.dumps(result) + "\n")
    if not result["ok"] or not warm_ok:
        sys.stderr.write("--- cold ---\n" + cold_log +
                         "\n--- warm ---\n" + warm_log +
                         "\n--- gen cold ---\n" + gcold_log +
                         "\n--- gen warm ---\n" + gwarm_log + "\n")
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
