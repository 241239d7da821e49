"""Metadata-conditioned MIDI generation on TPU.

CLI mirror of the reference's ``generate.py`` (reference: generate.py:8-50) —
same flags, same choice lists — driving the jit KV-cache sampler by default
(``--sampler host`` selects the reference-structured parity loop).

    python generate.py --checkpoint_dir ./work/checkpoint_best \\
        --output_dir ./out --bpm 70 --audio_key aminor --time_signature 4/4 \\
        --pitch_range mid --num_measures 8 --inst acoustic_piano \\
        --genre newage --min_velocity 60 --max_velocity 80 \\
        --track_role main_melody --rhythm standard --num_generate 3 \\
        --chord_progression "Am-Am-Am-Am-Am-Am-Am-Am-..."
"""
import argparse


def parse_args():
    p = argparse.ArgumentParser(description="ComMU-TPU generation")
    from commu_tpu.utils import constants

    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="Orbax checkpoint dir or reference .pt file")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--bpm", type=int)
    p.add_argument("--audio_key", type=str, choices=list(constants.KEY_MAP.keys()))
    p.add_argument("--time_signature", type=str,
                   choices=list(constants.TIME_SIG_MAP.keys()))
    p.add_argument("--pitch_range", type=str,
                   choices=list(constants.PITCH_RANGE_MAP.keys()))
    p.add_argument("--num_measures", type=float)
    p.add_argument("--inst", type=str, choices=list(constants.INST_MAP.keys()))
    p.add_argument("--genre", type=str, default="cinematic",
                   choices=list(constants.GENRE_MAP.keys()))
    p.add_argument("--track_role", type=str,
                   choices=list(constants.TRACK_ROLE_MAP.keys()))
    p.add_argument("--rhythm", type=str, default="standard",
                   choices=list(constants.RHYTHM_MAP.keys()))
    p.add_argument("--min_velocity", type=int, choices=range(1, 128))
    p.add_argument("--max_velocity", type=int, choices=range(1, 128))
    p.add_argument("--chord_progression", type=str, default=None,
                   help="Chord progression ex) C-C-E-E-G-G ... "
                        "(required unless --batch_json)")
    p.add_argument("--num_generate", type=int, default=1)
    p.add_argument("--top_k", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.95)
    p.add_argument("--sampler", choices=["jit", "host"], default="jit",
                   help="jit: on-device batched loop; host: parity loop")
    p.add_argument("--decode_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 halves KV-cache bandwidth on TPU "
                        "(slightly different logits; float32 is bit-parity)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gen_length", type=int, default=None,
                   help="override max generation length (smoke runs)")
    p.add_argument("--lenient", action="store_true",
                   help="keep sequences even if they fail musical validation "
                        "(extension; useful with untrained checkpoints)")
    p.add_argument("--batch_json", type=str, default=None,
                   help="extension: JSON file with a LIST of request objects "
                        "(same keys as the CLI flags); all prompts are "
                        "generated in ONE batched device episode")
    p.add_argument("--warm", action="store_true",
                   help="with --serve: run one throwaway episode at the "
                        "default request shape before printing the ready "
                        "line, so the first real request pays no compile "
                        "(the episode lands in the in-process cache and "
                        "the on-disk AOT store; needs --chord_progression "
                        "and the meta flags as defaults)")
    p.add_argument("--serve", action="store_true",
                   help="extension: serving loop — read one JSON request "
                        "object per stdin line (same keys as the CLI flags, "
                        "plus optional request_id/seed), write one JSON "
                        "response line per request to stdout. The model, "
                        "params and compiled episodes stay resident, so "
                        "after the first request per batch shape each "
                        "request costs only device time (the process-reuse "
                        "serving mode documented in commu_tpu/utils/"
                        "jax_cache.py). CLI meta flags act as defaults for "
                        "fields a request omits.")
    return p.parse_args()


META_KEYS = ("bpm", "audio_key", "time_signature", "pitch_range",
             "num_measures", "inst", "genre", "min_velocity", "max_velocity",
             "track_role", "rhythm")


def main():
    args = parse_args()

    import os
    from commu_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache(pinned_layouts=False)  # generation is pin-free
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import sys
    from commu_tpu.utils.logging import configure_logging
    # --serve speaks line-JSON on stdout; logs must ride stderr there
    configure_logging(None, stream=sys.stderr if args.serve else None)

    from commu_tpu.config import get_default_cfg_inference
    from commu_tpu.generation import GenerationInput, MidiGenerationPipeline

    icfg = get_default_cfg_inference()
    if args.gen_length is not None:
        import dataclasses
        icfg = dataclasses.replace(icfg, generation_length=args.gen_length)

    import jax.numpy as jnp
    pipeline = MidiGenerationPipeline(
        args.checkpoint_dir, inference_cfg=icfg, sampler=args.sampler,
        decode_dtype=jnp.bfloat16 if args.decode_dtype == "bfloat16"
        else jnp.float32)

    if args.serve:
        import json
        import sys
        import time
        from commu_tpu.generation import postprocess

        defaults = {k: getattr(args, k) for k in META_KEYS
                    if getattr(args, k) is not None}
        if args.chord_progression:
            defaults["chord_progression"] = args.chord_progression
        counters: dict = {}  # per-output-stem file numbering (no overwrites)
        if args.warm:
            # pre-compile the default request shape so "ready" means ready
            # (episodes cache per (width, temperature, top_k, chord-cap
            # bucket) — requests at other shapes still compile on first use)
            import logging
            log = logging.getLogger("ComMU")
            try:
                warm_rec = {
                    "output_dir": args.output_dir,
                    "num_generate": args.num_generate,
                    "top_k": args.top_k, "temperature": args.temperature,
                    **defaults,
                }
                t0 = time.perf_counter()
                pipeline.generate_sequences(
                    GenerationInput.from_dict(warm_rec), seed=0,
                    validate=False)  # throwaway tokens; nothing written
                log.info("serve warmup done in %.1fs (width %d)",
                         time.perf_counter() - t0, args.num_generate)
            except Exception as exc:  # noqa: BLE001 - warmth is optional
                log.warning("serve warmup skipped (%s: %s)",
                            type(exc).__name__, exc)
        print(json.dumps({"status": "ready",
                          "checkpoint": args.checkpoint_dir}), flush=True)
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            req_id = None
            try:
                req = json.loads(line)
                req_id = req.pop("request_id", None)
                seed = int(req.pop("seed", args.seed))
                record = {
                    "output_dir": args.output_dir,
                    "num_generate": args.num_generate,
                    "top_k": args.top_k, "temperature": args.temperature,
                    **defaults, **req,
                }
                input_data = GenerationInput.from_dict(record)
                t0 = time.perf_counter()
                sequences = pipeline.generate_sequences(
                    input_data, seed=seed, validate=not args.lenient)
                files = []
                stem = (input_data.output_dir, input_data.track_role,
                        input_data.inst, input_data.pitch_range)
                base = counters.get(stem, 0)
                for idx, seq in enumerate(sequences):
                    midi = postprocess.decode_event_sequence(seq)
                    path = postprocess.output_file_path(input_data, base + idx)
                    midi.dump(str(path))
                    files.append(str(path))
                counters[stem] = base + len(sequences)
                print(json.dumps({
                    "request_id": req_id, "ok": True, "files": files,
                    "wall_ms": round((time.perf_counter() - t0) * 1e3, 1),
                }), flush=True)
            except Exception as exc:  # noqa: BLE001 - keep serving
                print(json.dumps({"request_id": req_id, "ok": False,
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      flush=True)
        return

    if args.batch_json:
        import json
        from commu_tpu.generation import jit_sampler, postprocess
        from commu_tpu.vocab.meta_codec import encode_meta

        records = json.loads(open(args.batch_json).read())
        inputs = [GenerationInput.from_dict({
            "output_dir": args.output_dir, "num_generate": 1,
            "top_k": args.top_k, "temperature": args.temperature, **rec,
        }) for rec in records]
        metas = [pipeline.encode_input_meta(i) for i in inputs]
        results = jit_sampler.execute_batch(
            pipeline.model, pipeline.params, pipeline.model_cfg,
            pipeline.inference_cfg, inputs, metas, seed=args.seed,
            validate=not args.lenient)
        for idx, (inp, seq) in enumerate(zip(inputs, results)):
            midi = postprocess.decode_event_sequence(seq)
            path = postprocess.output_file_path(inp, idx)
            midi.dump(str(path))
        print(f"Generated {len(results)} files under: {args.output_dir}")
        return

    if not args.chord_progression:
        raise SystemExit("--chord_progression is required without --batch_json")

    input_data = GenerationInput.from_dict({
        **{k: getattr(args, k) for k in META_KEYS},
        "output_dir": args.output_dir,
        "num_generate": args.num_generate,
        "top_k": args.top_k,
        "temperature": args.temperature,
        "chord_progression": args.chord_progression,
    })
    out = pipeline.run(input_data, seed=args.seed, validate=not args.lenient)
    print(f"Generated files under: {out}")


if __name__ == "__main__":
    main()
