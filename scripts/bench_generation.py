"""Generation latency benchmark: corpus-real 8-bar episodes on one chip.

North-star target (BASELINE.md): < 1s p50 per 8-bar generation request.

Episode lengths are drawn from ``scripts/episode_lengths.json`` — 8-bar
token lengths produced by the REAL event encoder over a synthetic corpus
whose note-density mixture is calibrated to the corpus's ~700-token median
(see scripts/derive_episode_lengths.py) — and enforced through the
sampler's per-row ``row_cap`` hook, so an episode costs what a real
~480-970-token sample costs, not a full 4096-token worst case.  Weights are
random (untrained weights rarely satisfy the musical validators; the device
loop runs the same number of steps either way), so validation is skipped.

Latency semantics: at batch G all G requests finish together, so the
per-REQUEST p50 latency at that batch is the episode wall time; per-sample
cost (episode / G) and decode tokens/s are reported as throughput numbers.

Run standalone:  python scripts/bench_generation.py [--emit out.json]
Or via bench.py, which writes BENCH_generation.json next to the training
metric each round.  Reference loop being beaten:
/root/reference/commu/midi_generator/midi_inferrer.py:239-320 (one Python/
torch round trip per token; measured 44.9 ms/token on this host's CPU —
BASELINE_ref_measured.json).
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LENGTHS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "episode_lengths.json")


def episode_lengths():
    with open(_LENGTHS_PATH) as fh:
        return json.load(fh)["lengths"]


def run_suite(batches=(1, 8, 32), rounds=5, gen_length=1024,
              dtype_name="bfloat16", seed=0):
    """Returns a JSON-able dict of per-batch latency/throughput stats."""
    from commu_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache(pinned_layouts=False)  # generation is pin-free
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.config import (InferenceConfig, ModelConfig,
                                  get_default_cfg_training)
    from commu_tpu.generation import jit_sampler
    from commu_tpu.generation.container import GenerationInput
    from commu_tpu.models.transformer_xl import TransformerXL
    from commu_tpu.training.step import create_train_state
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE
    from commu_tpu.vocab.meta_codec import encode_meta

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    mcfg = ModelConfig(same_length=True)
    icfg = InferenceConfig(generation_length=gen_length)
    model = TransformerXL(VOCAB_SIZE, mcfg, dtype=dtype)
    state = create_train_state(jax.random.PRNGKey(0), model,
                               get_default_cfg_training())
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), state.params)

    input_data = GenerationInput(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=8.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", output_dir="/tmp", num_generate=1,
        top_k=32, temperature=0.95,
        chord_progression=(["Am"] * 8 + ["F"] * 8 + ["C"] * 8 + ["G"] * 8) * 2)
    encoded_meta = encode_meta(input_data.midi_meta())

    lens = episode_lengths()
    rng = np.random.RandomState(seed)
    results = {"episode_length_source": os.path.basename(_LENGTHS_PATH),
               "episode_length_median": int(np.median(lens)),
               "dtype": dtype_name, "batches": {}}
    key = jax.random.PRNGKey(seed)
    for g in batches:
        batch = [input_data] * g
        episode, chord_cap = jit_sampler.build_episode(
            model, params, mcfg, icfg, batch)
        metas = [encoded_meta] * g
        key, sub = jax.random.split(key)
        caps = rng.choice(lens, size=g).astype(np.int32)
        t0 = time.perf_counter()
        jit_sampler.run_episode(episode, chord_cap, batch, metas, sub,
                                row_cap=np.minimum(caps, gen_length - 8))
        compile_s = time.perf_counter() - t0

        times, tok_counts = [], []
        for _ in range(rounds):
            key, sub = jax.random.split(key)
            caps = rng.choice(lens, size=g).astype(np.int32)
            caps = np.minimum(caps, gen_length - 8)
            t0 = time.perf_counter()
            outs, failed, _ = jit_sampler.run_episode(
                episode, chord_cap, batch, metas, sub, row_cap=caps)
            times.append(time.perf_counter() - t0)
            tok_counts.append(sum(len(s) for s in outs))
        times_ms = sorted(t * 1e3 for t in times)
        p50 = statistics.median(times_ms)
        p95 = times_ms[min(len(times_ms) - 1, int(0.95 * len(times_ms)))]
        toks = statistics.median(tok_counts)
        results["batches"][str(g)] = {
            "episode_ms_p50": round(p50, 1),
            "episode_ms_p95": round(p95, 1),
            "per_request_latency_ms_p50": round(p50, 1),
            "per_sample_ms_p50": round(p50 / g, 1),
            "decode_tokens_per_sec": round(toks / (p50 / 1e3), 1),
            "median_tokens_per_episode": int(toks),
            "compile_s": round(compile_s, 1),
        }
        print(f"[gen bench] batch {g}: p50 {p50:.0f} ms/episode "
              f"({p50 / g:.0f} ms/sample, {toks / (p50 / 1e3):.0f} tok/s)",
              file=sys.stderr, flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--gen_length", type=int, default=1024)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--emit", metavar="PATH",
                    help="write the results JSON here")
    args = ap.parse_args()
    batches = tuple(int(b) for b in args.batches.split(","))
    res = run_suite(batches=batches, rounds=args.rounds,
                    gen_length=args.gen_length, dtype_name=args.dtype)
    text = json.dumps(res, indent=1)
    print(text)
    if args.emit:
        with open(args.emit, "w") as fh:
            fh.write(text + "\n")


if __name__ == "__main__":
    main()
