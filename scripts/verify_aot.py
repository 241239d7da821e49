"""AOT cold-start experiment: serialized-executable load vs cold compile.

The open question from the compile-cache policy (commu_tpu/utils/jax_cache.py):
on the tunneled TPU runtime a persistent-cache WARM LOAD measured slower than
compiling (105.7 s vs 9.2 s, VERIFY_cache_r04.json).  Is that inherent to the
tunnel (executable deserialize/upload rides the relay) or specific to the
compile-cache deserialize path?  This script answers it with the only other
AOT vehicle JAX offers — ``jax.experimental.serialize_executable`` — which
serializes the *loaded PJRT executable* directly:

  phase EXPORT (subprocess): build the generation episode, lower+compile
    (timed: the cold-compile anchor), run it (token digest), serialize the
    executable to disk.
  phase LOAD (fresh subprocess): deserialize_and_load the payload (timed),
    run it, compare the token digest.

If the AOT load loses to the cold compile too, the bottleneck is the
tunnel's executable upload itself and the cache-off-on-tunnel policy is
closed for good (the serving answer there remains process reuse).
Reference being chased: torch.load-and-go,
/root/reference/commu/midi_generator/model_initializer.py:43-51.

Run:  python scripts/verify_aot.py [--emit VERIFY_aot_r05.json]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = r"""
import os, sys, time, pickle
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
import numpy as np

from commu_tpu.config import InferenceConfig, ModelConfig
from commu_tpu.generation import jit_sampler
from commu_tpu.generation.container import GenerationInput
from commu_tpu.models.transformer_xl import TransformerXL, init_memory
from commu_tpu.vocab.event_tokens import VOCAB_SIZE
from commu_tpu.vocab.meta_codec import encode_meta

G = 2
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
inputs = [inp] * G
metas = [meta] * G

# the exact argument tuple run_episode passes to the jit episode
tok, pos, inter, count, fit, measures, incomplete = (
    jit_sampler._schedule_arrays(inputs, 8))
primer = np.array([[0] + list(m[:-1]) for m in metas], dtype=np.int32)
meta_last = np.array([m[-1] for m in metas], dtype=np.int32)
row_cap = np.full((G,), 2 ** 30, dtype=np.int32)
key = jax.random.PRNGKey(0)
args = (primer, meta_last, tok, pos, inter, count, fit, incomplete, key,
        row_cap)
"""

_EXPORT = _COMMON + r"""
episode, chord_cap = jit_sampler.build_episode(model, params, cfg, icfg,
                                               inputs)
t0 = time.perf_counter()
lowered = episode.lower(*args)
compiled = lowered.compile()
compile_s = time.perf_counter() - t0

t0 = time.perf_counter()
state = compiled(*args)
jax.block_until_ready(state.seq)
first_call_s = time.perf_counter() - t0
digest = int(np.asarray(state.seq).sum()) + int(np.asarray(state.seq_len).sum())

from jax.experimental.serialize_executable import serialize
t0 = time.perf_counter()
payload, in_tree, out_tree = serialize(compiled)
serialize_s = time.perf_counter() - t0
with open({payload_path!r}, "wb") as fh:
    pickle.dump((payload, in_tree, out_tree), fh)
print("EXPORT_OK compile_s=%.1f first_call_s=%.2f serialize_s=%.1f "
      "bytes=%d digest=%d" % (compile_s, first_call_s, serialize_s,
                              len(payload), digest))
"""

_LOAD = _COMMON + r"""
from jax.experimental.serialize_executable import deserialize_and_load
with open({payload_path!r}, "rb") as fh:
    payload, in_tree, out_tree = pickle.load(fh)
t0 = time.perf_counter()
compiled = deserialize_and_load(payload, in_tree, out_tree)
load_s = time.perf_counter() - t0
t0 = time.perf_counter()
state = compiled(*args)
jax.block_until_ready(state.seq)
first_call_s = time.perf_counter() - t0
digest = int(np.asarray(state.seq).sum()) + int(np.asarray(state.seq_len).sum())
print("LOAD_OK load_s=%.1f first_call_s=%.2f digest=%d" % (
    load_s, first_call_s, digest))
"""


_INTEGRATED = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["COMMU_AOT_CACHE_DIR"] = {aot_dir!r}
import jax
import jax.numpy as jnp
import numpy as np

from commu_tpu.config import InferenceConfig, ModelConfig, get_default_cfg_training
from commu_tpu.generation import jit_sampler
from commu_tpu.generation.container import GenerationInput
from commu_tpu.models.transformer_xl import TransformerXL
from commu_tpu.training.step import create_train_state
from commu_tpu.vocab.event_tokens import VOCAB_SIZE
from commu_tpu.vocab.meta_codec import encode_meta

mcfg = ModelConfig(same_length=True)
icfg = InferenceConfig(generation_length=1024)
model = TransformerXL(VOCAB_SIZE, mcfg, dtype=jnp.bfloat16)
state = create_train_state(jax.random.PRNGKey(0), model,
                           get_default_cfg_training())
params = jax.tree_util.tree_map(
    lambda a: np.asarray(a).astype(jnp.bfloat16), state.params)
inp = GenerationInput(
    bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
    num_measures=8.0, inst="acoustic_piano", genre="newage",
    min_velocity=60, max_velocity=80, track_role="main_melody",
    rhythm="standard", output_dir=".", num_generate=1, top_k=32,
    temperature=0.95,
    chord_progression=(["Am"] * 16 + ["F"] * 16 + ["C"] * 16 + ["G"] * 16))
meta = list(encode_meta(inp.midi_meta()))

t0 = time.perf_counter()
episode, chord_cap = jit_sampler.build_episode(model, params, mcfg, icfg,
                                               [inp])
outs, failed, rems = jit_sampler.run_episode(
    episode, chord_cap, [inp], [meta], jax.random.PRNGKey(5),
    row_cap=np.array([700], dtype=np.int32))
first_s = time.perf_counter() - t0
t0 = time.perf_counter()
outs2, _, _ = jit_sampler.run_episode(
    episode, chord_cap, [inp], [meta], jax.random.PRNGKey(5),
    row_cap=np.array([700], dtype=np.int32))
steady_s = time.perf_counter() - t0
assert outs2 == outs  # same key -> deterministic episode
digest = sum(sum(s) for s in outs) + sum(len(s) for s in outs)
print("INTEGRATED_OK first_episode_s=%.1f steady_s=%.2f digest=%d" % (
    first_s, steady_s, digest))
"""


def _run(code: str, timeout: int = 1800):
    proc = subprocess.run([sys.executable, "-c", code],
                          cwd=tempfile.gettempdir(), capture_output=True,
                          text=True, timeout=timeout, env=dict(os.environ))
    return proc


def _parse(line_tag: str, stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith(line_tag):
            return {kv.split("=")[0]: float(kv.split("=")[1])
                    for kv in line.split()[1:]}
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", default="VERIFY_aot_r05.json")
    ap.add_argument("--integrated", action="store_true",
                    help="gate the PRODUCTION path instead of the raw API "
                         "experiment: a cold subprocess builds + runs a "
                         "full-size episode through build_episode (AOT "
                         "store populated), a warm subprocess repeats — "
                         "tokens must match and the warm first-episode "
                         "wall must beat the cold compile")
    args = ap.parse_args()

    if args.integrated:
        aot_dir = tempfile.mkdtemp(prefix="commu_aotdir_")
        t0 = time.time()
        cold = _run(_INTEGRATED.format(repo=_REPO, aot_dir=aot_dir))
        cold_ok = cold.returncode == 0 and "INTEGRATED_OK" in cold.stdout
        cold_m = _parse("INTEGRATED_OK", cold.stdout)
        result = {"check": "aot_integrated_cold_warm", "cold": cold_m,
                  "cold_ok": cold_ok}
        if not cold_ok:
            result["cold_err"] = cold.stdout[-1500:] + cold.stderr[-3000:]
        else:
            warm = _run(_INTEGRATED.format(repo=_REPO, aot_dir=aot_dir))
            warm_ok = warm.returncode == 0 and "INTEGRATED_OK" in warm.stdout
            warm_m = _parse("INTEGRATED_OK", warm.stdout)
            result["warm"] = warm_m
            result["warm_ok"] = warm_ok
            if not warm_ok:
                result["warm_err"] = warm.stdout[-1500:] + warm.stderr[-3000:]
            else:
                result["tokens_identical"] = (
                    cold_m.get("digest") == warm_m.get("digest"))
                result["aot_wins"] = bool(
                    warm_m["first_episode_s"] < 0.5 * cold_m["first_episode_s"])
                result["ok"] = bool(result["tokens_identical"]
                                    and result["aot_wins"])
        result["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(result))
        with open(args.emit, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
        if not result.get("ok"):
            sys.exit(1)
        return

    payload_path = os.path.join(tempfile.mkdtemp(prefix="commu_aot_"),
                                "episode.pjrt")
    t0 = time.time()
    exp = _run(_EXPORT.format(repo=_REPO, payload_path=payload_path))
    exp_ok = exp.returncode == 0 and "EXPORT_OK" in exp.stdout
    exp_m = _parse("EXPORT_OK", exp.stdout)
    result = {"check": "aot_serialized_executable",
              "platform": "see platform field below",
              "export": exp_m, "export_ok": exp_ok}
    if not exp_ok:
        result["export_err"] = (exp.stdout[-1500:] + exp.stderr[-3000:])
    load_ok, load_m = False, {}
    if exp_ok:
        load = _run(_LOAD.format(repo=_REPO, payload_path=payload_path))
        load_ok = load.returncode == 0 and "LOAD_OK" in load.stdout
        load_m = _parse("LOAD_OK", load.stdout)
        result["load"] = load_m
        result["load_ok"] = load_ok
        if not load_ok:
            result["load_err"] = (load.stdout[-1500:] + load.stderr[-3000:])
    import jax
    result["platform"] = jax.devices()[0].platform_version \
        if hasattr(jax.devices()[0], "platform_version") else "unknown"
    if exp_ok and load_ok:
        result["digest_match"] = exp_m.get("digest") == load_m.get("digest")
        cold = exp_m["compile_s"]
        aot = load_m["load_s"] + load_m["first_call_s"]
        result["cold_compile_s"] = cold
        result["aot_total_s"] = round(aot, 1)
        result["aot_wins"] = bool(aot < cold)
    result["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))
    with open(args.emit, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
