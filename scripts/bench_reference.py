"""Measure the REFERENCE implementation's performance anchors on this host's CPU.

The reference (POZAlabs/ComMU-code) publishes no numbers, and no GPU torch is
available here, so the only *measurable* reference anchors are CPU ones:

1. ``train_tokens_per_sec`` — the reference training hot loop
   (/root/reference/train.py:123-165 semantics: global batch 256 chunked x4,
   tgt 128, mem 1024, fwd+bwd per chunk, grad clip, Adam step) on the real
   ``MemTransformerLM`` (/root/reference/commu/model/model.py:423-693),
   torch CPU, default thread pool.

2. ``gen_ms_per_token`` — the reference generation hot loop
   (/root/reference/commu/midi_generator/midi_inferrer.py:239-320): the real
   ``InferenceTask`` per-token body (calc_logits_and_mems -> calc_probs ->
   apply_sampling -> infer_token) at tgt_len=1 against a mem_len=4146 memory,
   timed over 700 tokens (the corpus-median episode length).  This EXCLUDES
   the TeacherForceTask python state machine and validation retries, i.e. it
   is a lower bound favourable to the reference.

3. ``gen_full_pipeline`` — one full real ``generate_sequence`` call including
   the TeacherForceTask state machine, reported as wall seconds + tokens
   actually emitted (episode length depends on the random weights, so this is
   a sanity cross-check of (2), not a controlled measurement).

Results are printed as JSON and written to ``BASELINE_ref_measured.json`` at
the repo root.  Weights are randomly initialised — throughput/latency of the
reference stack does not depend on weight values.
"""
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)


def _install_shims():
    """Reference deps not installed here: yacs (namespace shim), miditoolkit/
    pretty_midi (working adapters backed by commu_tpu.midi.smf), parmap."""
    if "yacs" not in sys.modules:
        yacs_mod = types.ModuleType("yacs")
        yacs_config_mod = types.ModuleType("yacs.config")

        class _CfgNode(dict):
            pass

        yacs_config_mod.CfgNode = _CfgNode
        yacs_mod.config = yacs_config_mod
        sys.modules["yacs"] = yacs_mod
        sys.modules["yacs.config"] = yacs_config_mod
    if "miditoolkit" not in sys.modules:
        from ref_midi_adapter import install_midi_adapter

        install_midi_adapter()
    if "parmap" not in sys.modules:
        stub = types.ModuleType("parmap")
        stub.__stub__ = True
        sys.modules["parmap"] = stub
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _full_cfg(tgt_len, mem_len):
    return types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=6, num_heads=10, units=500, inner_size=1000,
            dropout=0.1, attention_dropout=0.1, clamp_len=-1,
            same_length=False,
        ),
        TRAIN=types.SimpleNamespace(tgt_length=tgt_len, mem_length=mem_len),
    )


def _build_model(torch, cfg):
    from commu.model.model import MemTransformerLM

    torch.manual_seed(1111)
    model = MemTransformerLM(cfg, vocab=list(range(729)))
    # nn.Parameter(torch.Tensor(...)) params (r_w_bias/r_r_bias) are
    # uninitialised memory; the reference initialises everything in
    # train.py:291-342.  Values don't affect timing — init to N(0, 0.02).
    for p in model.parameters():
        p.data.normal_(0.0, 0.02)
    return model


def bench_train(torch, max_seconds=600.0, min_steps=2, max_steps=10):
    """Reference train step (train.py:123-165): batch 256 chunked x4."""
    batch, tgt, mem, n_chunk = 256, 128, 1024, 4
    cfg = _full_cfg(tgt, mem)
    model = _build_model(torch, cfg)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=4e-3 / 1)

    g = torch.Generator().manual_seed(0)
    data = torch.randint(1, 729, (tgt, batch), generator=g)
    target = torch.randint(1, 729, (tgt, batch), generator=g)
    reset_mems = torch.zeros(batch, dtype=torch.bool)

    mems = [None] * n_chunk

    def one_step():
        nonlocal mems
        model.zero_grad()
        data_chunks = torch.chunk(data, n_chunk, 1)
        target_chunks = torch.chunk(target, n_chunk, 1)
        reset_chunks = torch.chunk(reset_mems, n_chunk, 0)
        for i in range(n_chunk):
            loss, mems[i] = model(
                data_chunks[i].contiguous(), target_chunks[i].contiguous(),
                reset_chunks[i].contiguous(), mems[i])
            loss = loss.float().mean() / n_chunk
            loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        optimizer.zero_grad()

    one_step()  # warmup (allocator, thread pool)
    t0 = time.perf_counter()
    steps = 0
    while steps < max_steps:
        one_step()
        steps += 1
        if steps >= min_steps and time.perf_counter() - t0 > max_seconds:
            break
    dt = time.perf_counter() - t0
    toks = steps * batch * tgt
    return {
        "steps": steps,
        "sec_per_step": round(dt / steps, 3),
        "tokens_per_sec": round(toks / dt, 1),
    }


def bench_generation_loop(torch, n_tokens=700):
    """The real InferenceTask per-token body at mem_len=4146, tgt_len=1."""
    from commu.midi_generator.midi_inferrer import InferenceTask

    cfg = _full_cfg(1, 4146)
    cfg.MODEL.same_length = True
    model = _build_model(torch, cfg)
    model.eval()
    model.reset_length(1, 4146)

    task = InferenceTask(torch.device("cpu"))
    task.model = model
    task.input_data = types.SimpleNamespace(temperature=0.95, top_k=32)
    task.inference_cfg = types.SimpleNamespace(
        GENERATION=types.SimpleNamespace(generation_length=n_tokens))

    meta = [604, 601, 626, 632, 640, 643, 650, 683, 696, 720, 726]
    with torch.no_grad():
        seq, mems = task.init_seq_and_mems(meta, len(meta))
        # warmup a few iterations
        for _ in range(5):
            logits, mems_w = task.calc_logits_and_mems(seq, mems)
            probs = task.calc_probs(logits)
            probs = task.apply_sampling(probs, [])
            task.infer_token(probs)
        t0 = time.perf_counter()
        for _ in range(n_tokens):
            logits, mems = task.calc_logits_and_mems(seq, mems)
            probs = task.calc_probs(logits)
            probs = task.apply_sampling(probs, [])
            token = task.infer_token(probs)
            seq.append(token if token != 1 else 2)  # never stop early
        dt = time.perf_counter() - t0
    return {
        "n_tokens": n_tokens,
        "ms_per_token": round(1000.0 * dt / n_tokens, 3),
        "episode_700tok_sec": round(dt, 3),
    }


def bench_generation_full(torch, gen_len=700):
    """One full real generate_sequence incl. TeacherForceTask."""
    from commu.midi_generator.midi_inferrer import InferenceTask
    from commu.midi_generator.container import TransXlInputData

    cfg = _full_cfg(1, 4146)
    cfg.MODEL.same_length = True
    model = _build_model(torch, cfg)
    model.eval()
    model.reset_length(1, 4146)

    tx = TransXlInputData(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=8.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", output_dir="/tmp", num_generate=1, top_k=32,
        temperature=0.95, chord_progression=["c"] * 64)

    from commu_tpu.vocab.meta_codec import encode_meta
    from commu_tpu.generation.container import GenerationInput

    gi = GenerationInput(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=8.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", output_dir="/tmp", num_generate=1, top_k=32,
        temperature=0.95, chord_progression=["c"] * 64)
    meta = list(encode_meta(gi.midi_meta()))

    task = InferenceTask(torch.device("cpu"))
    icfg = types.SimpleNamespace(
        GENERATION=types.SimpleNamespace(generation_length=gen_len))
    task(model=model, input_data=tx, inference_cfg=icfg)
    with torch.no_grad():
        t0 = time.perf_counter()
        seq, mems = task.init_seq_and_mems(meta, len(meta))
        out = task.generate_sequence(seq, mems)
        dt = time.perf_counter() - t0
    n = len(out) if out is not None else gen_len
    return {
        "wall_sec": round(dt, 3),
        "tokens_emitted": n,
        "valid": out is not None,
        "ms_per_token": round(1000.0 * dt / max(n, 1), 3),
    }


def main():
    _install_shims()
    import torch

    results = {
        "host": "CPU, torch %s, %d threads"
                % (torch.__version__, torch.get_num_threads()),
    }
    results["generation_loop"] = bench_generation_loop(torch)
    print(json.dumps({"generation_loop": results["generation_loop"]}),
          flush=True)
    results["generation_full_pipeline"] = bench_generation_full(torch)
    print(json.dumps(
        {"generation_full_pipeline": results["generation_full_pipeline"]}),
        flush=True)
    results["train"] = bench_train(torch)
    print(json.dumps({"train": results["train"]}), flush=True)

    out_path = os.path.join(REPO, "BASELINE_ref_measured.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
