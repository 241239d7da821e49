"""Serving-mode protocol test: drives ``generate.py --serve`` as a real
subprocess over stdin/stdout JSON lines.

Covers the protocol surface the episode-cache tests don't: the ready line,
per-request responses, defaults merging for partial requests, per-stem file
counters across repeat requests (no overwrites), and survival after malformed
and invalid requests.  Extension over the reference's one-shot CLI
(reference: generate.py:53-74).
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.models.transformer_xl import TransformerXL
from commu_tpu.training.checkpoint import CheckpointManager
from commu_tpu.training.step import create_train_state
from commu_tpu.vocab.event_tokens import VOCAB_SIZE

from conftest import REPO_ROOT

MCFG = ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                   same_length=True)
TINY = TrainingConfig(model=MCFG,
                      train=TrainConfig(batch_size=4, batch_chunk=2,
                                        tgt_length=8, mem_length=16),
                      evaluate=EvaluateConfig(batch_size=2, tgt_length=8,
                                              mem_length=16))

REQUEST = {
    "bpm": 70, "audio_key": "aminor", "time_signature": "4/4",
    "pitch_range": "mid", "num_measures": 4.0, "inst": "acoustic_piano",
    "genre": "newage", "min_velocity": 60, "max_velocity": 80,
    "track_role": "main_melody", "rhythm": "standard",
    "chord_progression": "-".join(["c"] * 32),
}


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One resident server process shared by the module's assertions (the
    whole point of --serve is process reuse)."""
    tmp_path = tmp_path_factory.mktemp("serve")
    work = tmp_path / "work"
    model = TransformerXL(VOCAB_SIZE, MCFG, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, TINY)
    CheckpointManager(work).save_best(state, 1.0)
    (work / "config.yml").write_text(TINY.to_yaml())

    out_dir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu", COMMU_COMPILE_CACHE="0")
    # meta flags + chord progression as CLI defaults: --warm needs a full
    # default request shape to pre-compile before the ready line
    meta_flags = []
    for k, v in REQUEST.items():
        meta_flags += [f"--{k}", str(v)]
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO_ROOT, "generate.py"),
         "--checkpoint_dir", str(work / "checkpoint_best"),
         "--output_dir", str(out_dir), *meta_flags,
         "--gen_length", "32", "--lenient", "--warm", "--serve"],
        cwd=REPO_ROOT, env=env, text=True, stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    requests = [
        json.dumps({"request_id": "r1", **REQUEST}),
        # repeat stem: the file counter must advance, not overwrite
        json.dumps({"request_id": "r2", **REQUEST}),
        # malformed line: server answers ok=false and keeps serving
        "this is not json {",
        # invalid field value: encode fails server-side, server survives
        json.dumps({"request_id": "r4", **REQUEST, "audio_key": "zzz"}),
        # partial request: every omitted field comes from the merge chain
        json.dumps({"request_id": "r5", **REQUEST, "seed": 7}),
    ]
    try:
        out, err = proc.communicate("\n".join(requests) + "\n", timeout=900)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    assert proc.returncode == 0, f"server died: {err[-2000:]}"
    lines = [json.loads(ln) for ln in out.splitlines() if ln.strip()]
    return lines, out_dir, err


def test_ready_line(served):
    lines, _, err = served
    # --warm pre-compiled the default shape BEFORE the ready line
    assert "serve warmup done" in err
    assert lines[0]["status"] == "ready"
    assert "checkpoint_best" in lines[0]["checkpoint"]


def test_responses_in_order_with_ids(served):
    lines, _, _ = served
    responses = lines[1:]
    assert len(responses) == 5
    assert [r.get("request_id") for r in responses] == [
        "r1", "r2", None, "r4", "r5"]


def test_valid_requests_produce_files(served):
    lines, out_dir, _ = served
    by_id = {r.get("request_id"): r for r in lines[1:]}
    for rid in ("r1", "r2", "r5"):
        r = by_id[rid]
        assert r["ok"], r
        assert len(r["files"]) == 1
        assert os.path.isfile(r["files"][0])
        assert r["wall_ms"] > 0


def test_repeat_stem_counter_does_not_overwrite(served):
    lines, _, _ = served
    by_id = {r.get("request_id"): r for r in lines[1:]}
    names = [os.path.basename(by_id[r]["files"][0]) for r in ("r1", "r2", "r5")]
    assert names == ["main_melody_acoustic_piano_mid_000.mid",
                     "main_melody_acoustic_piano_mid_001.mid",
                     "main_melody_acoustic_piano_mid_002.mid"]


def test_errors_are_reported_and_survived(served):
    lines, _, _ = served
    responses = lines[1:]
    malformed = responses[2]
    assert malformed["ok"] is False
    assert "JSONDecodeError" in malformed["error"]
    bad_field = responses[3]
    assert bad_field["ok"] is False and bad_field["request_id"] == "r4"
    # the request AFTER both failures succeeded (tested above): the loop
    # survives errors rather than tearing down the resident process
