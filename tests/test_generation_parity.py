"""Generation parity tests.

Gold differential: the host-parity sampler must produce the exact token
sequence the reference's torch ``InferenceTask`` produces under identical
weights at temperature=0 (fully deterministic); the jit on-device sampler
must match the host sampler token-for-token.
"""
import dataclasses
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commu_tpu.config import InferenceConfig, ModelConfig
from commu_tpu.generation.container import GenerationInput
from commu_tpu.generation.host_sampler import InferenceEngine, generate_sequence
from commu_tpu.models import TransformerXL, flax_params_from_torch_state
from commu_tpu.vocab.event_tokens import VOCAB_SIZE
from commu_tpu.vocab.meta_codec import encode_meta

from conftest import add_reference_to_path, reference_available

N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 64
GEN_LEN = 100
CFG = ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                  inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
                  same_length=True)
ICFG = InferenceConfig(memory_length=512, generation_length=GEN_LEN)


def _input_data(tmp_path, chords, num_measures=4, **kw):
    return GenerationInput(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=float(num_measures), inst="acoustic_piano",
        genre="newage", min_velocity=60, max_velocity=80,
        track_role="main_melody", rhythm="standard",
        output_dir=str(tmp_path), num_generate=1, top_k=32, temperature=0.0,
        chord_progression=chords, **kw)


def _models(seed=0):
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    from commu.model.model import MemTransformerLM

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=True,
        ),
        TRAIN=types.SimpleNamespace(tgt_length=1, mem_length=ICFG.memory_length),
    )
    torch.manual_seed(seed)
    ref = MemTransformerLM(cfg, vocab=list(range(VOCAB_SIZE)))
    ref.eval()
    ref.reset_length(1, ICFG.memory_length)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = flax_params_from_torch_state(state, CFG)
    model = TransformerXL(vocab_size=VOCAB_SIZE, cfg=CFG)
    return torch, ref, model, params


def _reference_generate(torch, ref, input_data, encoded_meta):
    """Drive the reference InferenceTask.generate_sequence at temp=0."""
    from commu.midi_generator.midi_inferrer import InferenceTask
    from commu.midi_generator.container import TransXlInputData

    tx = TransXlInputData(
        bpm=input_data.bpm, audio_key=input_data.audio_key,
        time_signature=input_data.time_signature,
        pitch_range=input_data.pitch_range,
        num_measures=input_data.num_measures, inst=input_data.inst,
        genre=input_data.genre, min_velocity=input_data.min_velocity,
        max_velocity=input_data.max_velocity,
        track_role=input_data.track_role, rhythm=input_data.rhythm,
        output_dir=input_data.output_dir,
        num_generate=input_data.num_generate, top_k=input_data.top_k,
        temperature=input_data.temperature,
        chord_progression=input_data.chord_progression)

    task = InferenceTask(torch.device("cpu"))
    icfg = types.SimpleNamespace(
        GENERATION=types.SimpleNamespace(generation_length=GEN_LEN))
    task(model=ref, input_data=tx, inference_cfg=icfg)
    with torch.no_grad():
        seq, mems = task.init_seq_and_mems(list(encoded_meta), len(encoded_meta))
        return task.generate_sequence(seq, mems)


def _host_generate(model, params, input_data, encoded_meta):
    engine = InferenceEngine(model, params, CFG, ICFG,
                             capacity=GEN_LEN + 16)
    seq, cache = engine.prime(list(encoded_meta))
    rng = np.random.default_rng(0)
    return generate_sequence(engine, input_data, seq, cache, rng)


CHORDS_ONE_PER_BAR = ["c"] * 32
CHORDS_MULTI = (["c"] * 4 + ["g"] * 4) * 4


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
@pytest.mark.parametrize("chords,seed", [
    (CHORDS_ONE_PER_BAR, 0),
    (CHORDS_MULTI, 1),
    (CHORDS_ONE_PER_BAR, 2),
])
def test_host_sampler_matches_reference(tmp_path, chords, seed):
    torch, ref, model, params = _models(seed)
    input_data = _input_data(tmp_path, chords)
    encoded_meta = encode_meta(input_data.midi_meta())

    ref_seq = _reference_generate(torch, ref, input_data, encoded_meta)
    our_seq = _host_generate(model, params, input_data, encoded_meta)
    if ref_seq is None:
        assert our_seq is None
    else:
        assert our_seq == [int(t) for t in ref_seq]


@pytest.mark.parametrize("chords,seed", [
    (CHORDS_ONE_PER_BAR, 0),
    (CHORDS_MULTI, 1),
])
def test_jit_sampler_matches_host(tmp_path, chords, seed):
    if reference_available():
        _, _, model, params = _models(seed)
    else:
        model = TransformerXL(vocab_size=VOCAB_SIZE, cfg=CFG)
        dummy_mem = jnp.zeros((N_LAYER + 1, 1, 4, D_MODEL))
        from commu_tpu.models.transformer_xl import init_memory
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 4), dtype=jnp.int32),
                            init_memory(N_LAYER, 1, 4, D_MODEL))["params"]
    input_data = _input_data(tmp_path, chords)
    encoded_meta = encode_meta(input_data.midi_meta())

    host_seq = _host_generate(model, params, input_data, encoded_meta)

    from commu_tpu.generation import jit_sampler
    batch = [input_data] * 2  # two identical rows must agree at temp=0
    episode, chord_cap = jit_sampler.build_episode(
        model, params, CFG, ICFG, batch, capacity=GEN_LEN + 16)
    outs, failed, rems = jit_sampler.run_episode(
        episode, chord_cap, batch, [list(encoded_meta)] * 2,
        jax.random.PRNGKey(0))

    for g in range(2):
        if host_seq is None:
            # host failed => row must fail sampling or validation too
            ok = (not failed[g]) and jit_sampler._validate(
                input_data, outs[g], int(rems[g]))
            assert not ok
        else:
            assert not failed[g]
            assert outs[g] == host_seq, f"row {g}"


def _chi2_ok(counts: np.ndarray, expected: np.ndarray) -> float:
    """Pearson chi-square statistic over the support, asserted against a
    normal-approximation bound at ~8 sigma (dof +- 8*sqrt(2*dof)): loose
    enough to never flake on a seeded draw, tight enough that a wrong
    renormalization (e.g. top-k after the ban instead of before) fails by
    orders of magnitude."""
    support = expected > 0
    assert counts[~support].sum() == 0, "draw outside the candidate set"
    chi2 = float(((counts[support] - expected[support]) ** 2
                  / expected[support]).sum())
    dof = int(support.sum()) - 1
    assert chi2 < dof + 8.0 * np.sqrt(2.0 * dof), (chi2, dof)
    return chi2


@pytest.mark.parametrize("banned_ids,top_k", [
    ([], 32),                      # plain temperature/top-k
    ([0], 32),                     # the always-banned pad row (quirk-free)
    (None, 32),                    # bans INSIDE the top-k: renorm over fewer
    (None, 3),                     # tiny candidate set, near-boundary ties
])
def test_sampler_distribution_parity(banned_ids, top_k):
    """VERDICT r3 #8: temp=0 parity is token-exact; this certifies the
    STATISTICAL branch at the reference temperature 0.95 — the jit sampler's
    ``categorical`` over unnormalized masked-prob logs must draw from the
    same distribution as the host oracle's renormalized ``rng.choice``
    (reference math: midi_inferrer.py:209-237).  Both empirical
    distributions are chi-square-tested against the shared analytic
    distribution on identical logits, including ban/top-k renormalization
    edge cases."""
    from commu_tpu.generation.host_sampler import sample_from_logits
    from commu_tpu.generation.jit_sampler import masked_probs

    temperature, n_draws = 0.95, 100_000
    rng = np.random.default_rng(11)
    logits = rng.normal(size=VOCAB_SIZE - 1).astype(np.float32) * 3.0

    # analytic reference distribution (f64): softmax(l/T) -> pad -> top-k
    # (stable argsort) -> ban -> renorm
    probs = np.exp((logits / temperature).astype(np.float64)
                   - (logits / temperature).max())
    probs = np.concatenate([[0.0], probs / probs.sum()])
    top_idx = np.argsort(-probs, kind="stable")[:top_k]
    if banned_ids is None:  # ban the 2nd (and 5th) most likely: inside top-k
        banned_ids = [int(top_idx[i]) for i in (1, 4) if i < top_k]
    mask = np.zeros_like(probs)
    mask[top_idx] = 1.0
    mask[banned_ids] = 0.0
    analytic = probs * mask
    analytic /= analytic.sum()

    # host oracle draws (vectorized equivalent of its rng.choice loop; the
    # probability vector itself comes from the real sample_from_logits)
    _, host_probs = sample_from_logits(
        logits.copy(), temperature, top_k, banned_ids,
        np.random.default_rng(0), return_probs=True)
    np.testing.assert_allclose(host_probs, analytic, rtol=1e-12, atol=1e-15)
    host_draws = np.random.default_rng(1).choice(
        len(host_probs), size=n_draws, p=host_probs)
    host_counts = np.bincount(host_draws, minlength=VOCAB_SIZE)
    chi_host = _chi2_ok(host_counts, analytic * n_draws)

    # jit sampler draws: the REAL masked_probs + the body's categorical form
    banned_vec = np.zeros((1, VOCAB_SIZE), dtype=bool)
    banned_vec[0, banned_ids] = True
    jit_probs = jnp.pad(jax.nn.softmax(jnp.asarray(logits) / temperature),
                        (1, 0))[None, :]
    masked = masked_probs(jit_probs, jnp.asarray(banned_vec), top_k)
    # candidate sets must agree exactly (top-k tie-breaking included)
    np.testing.assert_array_equal(np.asarray(masked[0]) > 0, analytic > 0)
    draws = jax.random.categorical(
        jax.random.PRNGKey(2),
        jnp.log(jnp.maximum(masked[0], 1e-38)), shape=(n_draws,))
    jit_counts = np.bincount(np.asarray(draws), minlength=VOCAB_SIZE)
    chi_jit = _chi2_ok(jit_counts, analytic * n_draws)

    # and the two empirical distributions agree with each other (2-sample
    # chi-square on the pooled support)
    support = analytic > 0
    pooled = (host_counts + jit_counts)[support].astype(np.float64)
    pooled /= pooled.sum()
    stat = 0.0
    for counts in (host_counts, jit_counts):
        stat += (((counts[support] - n_draws * pooled) ** 2)
                 / np.maximum(n_draws * pooled, 1e-12)).sum()
    dof = int(support.sum()) - 1
    assert stat < dof + 8.0 * np.sqrt(2.0 * dof), (stat, dof, chi_host, chi_jit)


def test_episode_cache_reuse(tmp_path):
    """Serving path: repeated execute() calls through one episode_cache must
    compile once per (width, temp, top_k, chord-cap bucket) — and prompts
    whose chord counts land in the same bucket share the executable."""
    model = TransformerXL(vocab_size=VOCAB_SIZE, cfg=CFG)
    from commu_tpu.models.transformer_xl import init_memory
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), dtype=jnp.int32),
                        init_memory(N_LAYER, 1, 4, D_MODEL))["params"]
    from commu_tpu.generation import jit_sampler

    cache = {}
    inp4 = _input_data(tmp_path, CHORDS_ONE_PER_BAR)          # 4 chords
    meta = encode_meta(inp4.midi_meta())
    jit_sampler.execute(model, params, CFG, ICFG, inp4, list(meta),
                        seed=0, validate=False, episode_cache=cache)
    assert len(cache) == 1
    ep_first = cache[next(iter(cache))]

    # same prompt again: no new entry, identical compiled episode object
    jit_sampler.execute(model, params, CFG, ICFG, inp4, list(meta),
                        seed=1, validate=False, episode_cache=cache)
    assert len(cache) == 1
    assert cache[next(iter(cache))] is ep_first

    # different chord count in the same bucket of 8: still shared
    inp7 = _input_data(tmp_path, CHORDS_MULTI)
    n7 = len(inp7.chord_token_components["chord_token"])
    assert n7 != 4 and -(-n7 // 8) * 8 == 8  # same bucket as 4
    meta7 = encode_meta(inp7.midi_meta())
    jit_sampler.execute(model, params, CFG, ICFG, inp7, list(meta7),
                        seed=0, validate=False, episode_cache=cache)
    assert len(cache) == 1

    # different sampling params: a new entry
    inp_t = dataclasses.replace(inp4, temperature=0.95)
    jit_sampler.execute(model, params, CFG, ICFG, inp_t, list(meta),
                        seed=0, validate=False, episode_cache=cache)
    assert len(cache) == 2


def _tiny_model(seed=0):
    model = TransformerXL(vocab_size=VOCAB_SIZE, cfg=CFG)
    from commu_tpu.models.transformer_xl import init_memory
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), dtype=jnp.int32),
                        init_memory(N_LAYER, 1, 4, D_MODEL))["params"]
    return model, params


def test_segmented_decode_matches_single_segment(tmp_path, monkeypatch):
    """The bucketed-capacity decode loop (jit_sampler._segment_caps) must be
    BIT-IDENTICAL to the single-segment loop: same tokens, lengths, flags —
    the segments only change which static cache view each token reads, never
    the loop state or the PRNG stream.  capacity=512 -> views [256, 512];
    row_caps 280-420 force both rows across the 256 boundary."""
    from commu_tpu.generation import jit_sampler

    model, params = _tiny_model()
    icfg_long = dataclasses.replace(ICFG, generation_length=448)
    inp = dataclasses.replace(  # temp 0.95: stress the PRNG stream identity
        _input_data(tmp_path, CHORDS_ONE_PER_BAR), temperature=0.95)
    meta = encode_meta(inp.midi_meta())
    batch = [inp] * 2
    row_cap = np.array([420, 280], dtype=np.int32)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("COMMU_SEG_DECODE", flag)
        episode, chord_cap = jit_sampler.build_episode(
            model, params, CFG, icfg_long, batch, capacity=512)
        outs[flag] = jit_sampler.run_episode(
            episode, chord_cap, batch, [list(meta)] * 2,
            jax.random.PRNGKey(3), row_cap=row_cap)

    seg_seqs, seg_failed, seg_rems = outs["1"]
    one_seqs, one_failed, one_rems = outs["0"]
    assert max(len(s) for s in seg_seqs) > 256  # the boundary was crossed
    assert seg_seqs == one_seqs
    assert (seg_failed == one_failed).all()
    assert (seg_rems == one_rems).all()


def test_cache_overflow_marks_row_failed(tmp_path):
    """A row whose commits exhaust the KV-cache capacity must surface as
    failed=True (ADVICE r4: commit() silently drops the newest K/V while
    length keeps counting — the truncated context must not pass as valid).
    capacity=128 with a 200-token budget guarantees overflow."""
    from commu_tpu.generation import jit_sampler

    model, params = _tiny_model()
    icfg_long = dataclasses.replace(ICFG, generation_length=256)
    inp = dataclasses.replace(_input_data(tmp_path, CHORDS_ONE_PER_BAR),
                              temperature=0.95)
    meta = encode_meta(inp.midi_meta())
    batch = [inp] * 2
    episode, chord_cap = jit_sampler.build_episode(
        model, params, CFG, icfg_long, batch, capacity=128)
    outs, failed, rems = jit_sampler.run_episode(
        episode, chord_cap, batch, [list(meta)] * 2, jax.random.PRNGKey(0),
        row_cap=np.array([240, 240], dtype=np.int32))
    assert failed.all()
