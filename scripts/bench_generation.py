"""Generation latency probe: p50 8-bar conditional generation on one chip.

North-star target (BASELINE.md): < 1s p50 per 8-bar sample.  Uses the
full-size model with random weights and lenient validation (untrained weights
rarely satisfy the musical validators; latency is what is measured — the
token loop runs the same number of device steps either way).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_generate", type=int, default=4)
    ap.add_argument("--gen_length", type=int, default=1024,
                    help="max episode length (8-bar samples average ~700 "
                         "tokens in the ComMU corpus)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    args = ap.parse_args()

    import dataclasses
    from commu_tpu.config import InferenceConfig, ModelConfig
    from commu_tpu.generation import jit_sampler
    from commu_tpu.generation.container import GenerationInput
    from commu_tpu.models.transformer_xl import TransformerXL, init_memory
    from commu_tpu.training.step import create_train_state
    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE
    from commu_tpu.vocab.meta_codec import encode_meta

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mcfg = ModelConfig(same_length=True)
    icfg = InferenceConfig(generation_length=args.gen_length)
    model = TransformerXL(VOCAB_SIZE, mcfg, dtype=dtype)
    state = create_train_state(jax.random.PRNGKey(0), model,
                               get_default_cfg_training())
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), state.params)

    input_data = GenerationInput(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=8.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", output_dir="/tmp", num_generate=args.num_generate,
        top_k=32, temperature=0.95,
        chord_progression=(["Am"] * 8 + ["F"] * 8 + ["C"] * 8 + ["G"] * 8) * 2)
    encoded_meta = encode_meta(input_data.midi_meta())

    batch = [input_data] * args.num_generate
    episode, chord_cap = jit_sampler.build_episode(
        model, params, mcfg, icfg, batch)

    key = jax.random.PRNGKey(0)
    # compile
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    outs, failed, rems = jit_sampler.run_episode(
        episode, chord_cap, batch, [encoded_meta] * args.num_generate, sub)
    print(f"compile+first episode: {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(args.rounds):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        outs, failed, rems = jit_sampler.run_episode(
            episode, chord_cap, batch, [encoded_meta] * args.num_generate, sub)
        dt = time.perf_counter() - t0
        times.append(dt)
        lens = [len(s) for s in outs]
        print(f"episode: {dt*1000:.0f} ms for {args.num_generate} samples "
              f"({dt/args.num_generate*1000:.0f} ms/sample), lens={lens}, "
              f"failed={failed.tolist()}")
    per_sample = np.median(times) / args.num_generate
    print(f"p50 per-sample latency: {per_sample*1000:.0f} ms "
          f"(target < 1000 ms)")


if __name__ == "__main__":
    main()
