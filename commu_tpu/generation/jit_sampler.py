"""On-device batched sampling loop (the TPU production path).

The reference generates ONE sequence at a time with a Python loop that pays a
host->device round trip per token (reference: midi_inferrer.py:239-320).
Here the whole episode — KV-cache decode, temperature/top-k sampling, and the
chord teacher-forcing state machine — runs as a single ``lax.while_loop``
under jit, batched over G parallel attempts (optionally with *different*
metadata/chord prompts per row).

The state machine is the TeacherForcer translated to vector state:

    forced[g]       pending forced token (-1 none; queue depth is provably <=1)
    banned[g, V]    tokens banned for sampling (wrong chord tokens)
    no_seq[g]       reuse stale logits without a forward (banned-token path)
    first_loop[g]   first sampling forward does not commit to memory
    chord_head[g]   cursor into the padded per-row chord schedule
    bar_count[g]    Bar tokens emitted so far
    incomplete[g]   whether the pickup-measure flag has been satisfied

Branch semantics (including the reference's quirks: forced tokens committed
twice to memory, in-place temperature re-division of reused logits, stale
logits after bans) follow the host sampler, which is differentially tested
against this loop.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import InferenceConfig, ModelConfig
from ..models.decode import KVCache, commit, decode_step, init_cache, precompute_rel, prefill
from ..utils.constants import DEFAULT_POSITION_RESOLUTION
from ..vocab.event_tokens import (BAR_ID, EOS_ID, TokenOffset, VOCAB_SIZE)
from .teacher import validate_generated_sequence, TeacherForcer

logger = logging.getLogger("ComMU")

_POSITION = int(TokenOffset.POSITION)
_CHORD_START = int(TokenOffset.CHORD_START)
_CHORD_END = int(TokenOffset.CHORD_END)


@struct.dataclass
class SamplerState:
    seq: jnp.ndarray           # [G, S] int32
    seq_len: jnp.ndarray       # [G] int32
    cache: KVCache
    logits: jnp.ndarray        # [G, V-1] f32 (token 0 stripped, reference layout)
    forced: jnp.ndarray        # [G] int32, -1 = none
    banned: jnp.ndarray        # [G, V] bool
    no_seq: jnp.ndarray        # [G] bool
    first_loop: jnp.ndarray    # [G] bool
    chord_head: jnp.ndarray    # [G] int32
    chord_rem: jnp.ndarray     # [G] int32
    bar_count: jnp.ndarray     # [G] int32
    incomplete_filled: jnp.ndarray  # [G] bool
    done: jnp.ndarray          # [G] bool
    failed: jnp.ndarray        # [G] bool
    it: jnp.ndarray            # scalar int32
    key: jax.Array


def _gather_row(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr[g, idx[g]] with clipping."""
    idx = jnp.clip(idx, 0, arr.shape[1] - 1)
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def masked_probs(probs: jnp.ndarray, banned: jnp.ndarray,
                 top_k: int) -> jnp.ndarray:
    """Top-k-then-ban candidate weights, order-faithful to the reference
    (midi_inferrer.py:224-233: top-k is taken BEFORE the ban, so a banned
    in-top-k token shrinks the candidate set rather than admitting the
    (k+1)-th).  ``jax.lax.top_k`` and the host oracle's stable argsort both
    break probability ties toward the lower token id.  Returns UNNORMALIZED
    weights; the categorical draw over their logs is distribution-identical
    to the host's renormalized ``rng.choice`` (certified statistically by
    tests/test_generation_parity.py::test_sampler_distribution_parity)."""
    g = probs.shape[0]
    _, topi = jax.lax.top_k(probs, top_k)
    topk_mask = jnp.zeros_like(probs).at[
        jnp.arange(g)[:, None], topi].set(1.0)
    return probs * topk_mask * (~banned)


def make_episode_fn(model, params, cfg: ModelConfig, icfg: InferenceConfig,
                    *, capacity: int, seq_buf: int, chord_cap: int,
                    temperature: float, top_k: int):
    """Build the jit'd episode: (primer, chord schedule, lengths, key) -> final
    state.  All shapes static; per-row metadata arrays allow heterogeneous
    prompts in one batch."""

    params = jax.tree_util.tree_map(jnp.asarray, params)  # device-resident
    rel = precompute_rel(params, cfg, capacity)
    gen_len = icfg.generation_length

    def body(args, seg_capacity=capacity):
        state, chord_tok, chord_pos, inter_flag, length_fit, row_cap = args
        G = state.seq.shape[0]
        active = ~(state.done | state.failed)

        # ---- phase A: append pending forced token --------------------
        has_forced = active & (state.forced >= 0)
        tok_f = jnp.where(has_forced, state.forced, 0)
        write_pos = jnp.clip(state.seq_len, 0, seq_buf - 1)
        seq = jnp.where(
            (jnp.arange(seq_buf)[None, :] == write_pos[:, None]) & has_forced[:, None],
            tok_f[:, None], state.seq)
        seq_len = state.seq_len + has_forced.astype(jnp.int32)
        bar_count = state.bar_count + (has_forced & (tok_f == BAR_ID)).astype(jnp.int32)
        forced = jnp.where(has_forced, -1, state.forced)

        # ---- forward over each row's last token -----------------------
        last = _gather_row(seq, seq_len - 1)
        new_logits_full, k_self, v_self = decode_step(params, cfg, rel, last,
                                                      state.cache)
        commit_mask = active & (has_forced | (~state.no_seq & ~state.first_loop))
        # a commit against a full cache silently drops the newest K/V while
        # length keeps counting — mark the row failed instead (validation
        # then rejects it; the reference's sliding window never truncates
        # the NEWEST context, so a truncated row must not pass as valid)
        overflow = commit_mask & (state.cache.length >= seg_capacity)
        cache = commit(state.cache, k_self, v_self, commit_mask)
        new_logits = new_logits_full[:, 1:]
        logits = jnp.where((active & ~state.no_seq)[:, None], new_logits,
                           state.logits)

        phase_b = active & ~has_forced
        no_seq = state.no_seq & ~phase_b
        first_loop = state.first_loop & ~(phase_b & ~state.no_seq)

        # ---- calc_probs (with the in-place temperature quirk) ----------
        if temperature != 0:
            logits = jnp.where(phase_b[:, None], logits / temperature, logits)
            probs_tail = jax.nn.softmax(logits, axis=-1)
        else:
            probs_tail = jax.nn.one_hot(jnp.argmax(logits, axis=-1),
                                        logits.shape[1], dtype=logits.dtype)
        probs = jnp.pad(probs_tail, ((0, 0), (1, 0)))  # token id == index

        incomplete_filled = state.incomplete_filled | (phase_b & (bar_count > 1))

        # ---- sequence-based teaches ------------------------------------
        last2 = _gather_row(seq, seq_len - 2)
        remnant = state.chord_rem > 0
        pos_fit = (last2 == BAR_ID) & (last == _POSITION)
        cur_pos = _gather_row(chord_pos, state.chord_head)
        cur_tok = _gather_row(chord_tok, state.chord_head)
        cur_inter = _gather_row(inter_flag, state.chord_head)

        c1 = phase_b & incomplete_filled & (last == BAR_ID)
        base = phase_b & ~c1 & remnant & incomplete_filled
        c2 = base & length_fit & pos_fit
        c3 = base & ~length_fit & (pos_fit | (~pos_fit & (last == cur_pos) & cur_inter))
        teach_chord = c2 | c3

        # ---- sampling ----------------------------------------------------
        samp = phase_b & ~c1 & ~teach_chord
        masked = masked_probs(probs, state.banned, top_k)
        total = masked.sum(axis=-1)
        fail_now = samp & ((total <= 0) | ~jnp.isfinite(total))
        key, sub = jax.random.split(state.key)
        draw = jax.random.categorical(
            sub, jnp.log(jnp.maximum(masked, 1e-38)), axis=-1)
        token = jnp.where(fail_now, 0, draw).astype(jnp.int32)
        samp_ok = samp & ~fail_now

        # ---- token-based teaches -----------------------------------------
        d1 = samp_ok & remnant & cur_inter & (
            ((cur_pos < token) & (token < _POSITION + DEFAULT_POSITION_RESOLUTION))
            | (token == BAR_ID))
        d2 = samp_ok & ~d1 & (token >= _CHORD_START) & (token <= _CHORD_END)
        d3 = samp_ok & ~d1 & ~d2 & remnant & (token == EOS_ID)
        d4 = samp_ok & ~d1 & ~d2 & ~d3 & ~remnant & (token == BAR_ID)
        do_append = samp_ok & ~d1 & ~d2 & ~d3 & ~d4

        # ---- state updates -------------------------------------------------
        remnant_tok = jnp.where(cur_inter, cur_pos, BAR_ID)
        forced = jnp.where(c1, _POSITION, forced)
        forced = jnp.where(teach_chord, cur_tok, forced)
        forced = jnp.where(d1, cur_pos, forced)
        forced = jnp.where(d3, remnant_tok, forced)
        forced = jnp.where(d4, EOS_ID, forced)

        clear_ban = teach_chord | d1
        banned = jnp.where(clear_ban[:, None],
                           jnp.zeros_like(state.banned), state.banned)
        banned = banned.at[jnp.arange(G), token].set(
            banned[jnp.arange(G), token] | d2)
        no_seq = no_seq | d2

        chord_head = state.chord_head + teach_chord.astype(jnp.int32)
        chord_rem = state.chord_rem - teach_chord.astype(jnp.int32)

        write_pos = jnp.clip(seq_len, 0, seq_buf - 1)
        seq = jnp.where(
            (jnp.arange(seq_buf)[None, :] == write_pos[:, None]) & do_append[:, None],
            token[:, None], seq)
        seq_len = seq_len + do_append.astype(jnp.int32)
        bar_count = bar_count + (do_append & (token == BAR_ID)).astype(jnp.int32)

        new_last = _gather_row(seq, seq_len - 1)
        done = state.done | (active & (new_last == EOS_ID))
        # benchmarking hook: rows terminate once they reach their cap
        # (row_cap == seq_buf in production, so this never fires there)
        done = done | (seq_len >= row_cap)
        failed = state.failed | fail_now | overflow

        new_state = SamplerState(
            seq=seq, seq_len=seq_len, cache=cache, logits=logits,
            forced=forced, banned=banned, no_seq=no_seq, first_loop=first_loop,
            chord_head=chord_head, chord_rem=chord_rem, bar_count=bar_count,
            incomplete_filled=incomplete_filled, done=done, failed=failed,
            it=state.it + 1, key=key)
        return (new_state, chord_tok, chord_pos, inter_flag, length_fit,
                row_cap)

    def cond(args):
        state = args[0]
        return (state.it < gen_len) & ~jnp.all(state.done | state.failed)

    def _segment_caps() -> List[int]:
        """Growing static cache-view capacities for the decode loop.

        Every decode step reads the FULL static cache (the masked score/
        gather matmuls are dense), so at production capacity (4096 slots)
        a ~700-token episode pays ~6x the K/V bandwidth its live context
        needs — the dominant cost of wide-batch episodes (BASELINE.md
        wide-batch analysis).  Running the loop over doubling block-aligned
        views (256, 512, ... capacity) makes each token's cache traffic
        proportional to its live context; the loop state (incl. the PRNG
        stream) is untouched, so tokens are bit-identical to the
        single-segment loop, and the view slice-in/out copies cost ~1 ms
        per boundary.  COMMU_SEG_DECODE=0 restores the single segment."""
        import os
        if os.environ.get("COMMU_SEG_DECODE", "1") == "0" or capacity % 128:
            return [capacity]
        caps, c = [], 256
        while c < capacity:
            caps.append(c)
            c *= 2
        caps.append(capacity)
        return caps

    @jax.jit
    def episode(primer, encoded_meta_last, chord_tok, chord_pos, inter_flag,
                chord_count, length_fit, incomplete, key, row_cap):
        """primer: [G, 11] ([pad]+meta[:10]); encoded_meta_last: [G] the 11th
        meta token; chord_*: [G, C] padded schedules; chord_count: [G];
        incomplete: [G] bool (num_measures % 4 != 0); row_cap: [G] int32
        per-row sequence-length terminator (== seq_buf in production — a
        benchmarking hook for corpus-real episode lengths)."""
        G = primer.shape[0]
        cache = init_cache(cfg, G, capacity,
                           dtype=params["embedding"].dtype)
        cache = prefill(model, params, cfg, primer, cache)

        seq = jnp.zeros((G, seq_buf), dtype=jnp.int32)
        seq = seq.at[:, :primer.shape[1]].set(primer)
        seq = seq.at[:, primer.shape[1]].set(encoded_meta_last)
        seq_len = jnp.full((G,), primer.shape[1] + 1, dtype=jnp.int32)

        state = SamplerState(
            seq=seq, seq_len=seq_len, cache=cache,
            logits=jnp.zeros((G, VOCAB_SIZE - 1), dtype=jnp.float32),
            forced=jnp.full((G,), -1, dtype=jnp.int32),
            banned=jnp.zeros((G, VOCAB_SIZE), dtype=bool),
            no_seq=jnp.zeros((G,), dtype=bool),
            first_loop=jnp.ones((G,), dtype=bool),
            chord_head=jnp.zeros((G,), dtype=jnp.int32),
            chord_rem=chord_count.astype(jnp.int32),
            bar_count=jnp.zeros((G,), dtype=jnp.int32),
            incomplete_filled=~incomplete,
            done=jnp.zeros((G,), dtype=bool),
            failed=jnp.zeros((G,), dtype=bool),
            it=jnp.zeros((), dtype=jnp.int32),
            key=key)
        import dataclasses as _dc
        import functools as _ft

        extras = (chord_tok, chord_pos, inter_flag, length_fit,
                  row_cap.astype(jnp.int32))
        seg_caps = _segment_caps()
        for c in seg_caps:
            full = state.cache
            sub = state if c == capacity else _dc.replace(
                state, cache=KVCache(k=full.k[..., :c], v=full.v[..., :c],
                                     length=full.length))
            if c == capacity:
                # last segment: no room guard — a row at capacity trips the
                # in-body overflow->failed flag instead of looping forever
                seg_cond = cond
            else:
                def seg_cond(args, _c=c):
                    return cond(args) & (jnp.max(args[0].cache.length) < _c)
            out = jax.lax.while_loop(
                seg_cond, _ft.partial(body, seg_capacity=c), (sub,) + extras)
            state = out[0]
            if c != capacity:
                sub_cache = state.cache
                state = _dc.replace(
                    state, cache=KVCache(
                        k=full.k.at[..., :c].set(sub_cache.k),
                        v=full.v.at[..., :c].set(sub_cache.v),
                        length=sub_cache.length))
        return state

    return episode


def _schedule_arrays(inputs: List, chord_cap: int):
    """Pack each input's chord schedule into padded arrays."""
    G = len(inputs)
    tok = np.zeros((G, chord_cap), dtype=np.int32)
    pos = np.zeros((G, chord_cap), dtype=np.int32)
    inter = np.zeros((G, chord_cap), dtype=bool)
    count = np.zeros((G,), dtype=np.int32)
    fit = np.zeros((G,), dtype=bool)
    measures = np.zeros((G,), dtype=np.float32)
    incomplete = np.zeros((G,), dtype=bool)
    for g, inp in enumerate(inputs):
        comps = inp.chord_token_components
        ct, cp = comps["chord_token"], comps["chord_position"]
        n = len(ct)
        tok[g, :n] = ct
        pos[g, :n] = cp
        inter[g, :n] = [p != _POSITION for p in cp]
        count[g] = n
        fit[g] = n == int(inp.num_measures // 4 * 4)
        measures[g] = inp.num_measures
        incomplete[g] = inp.num_measures % 4 != 0
    return tok, pos, inter, count, fit, measures, incomplete


def build_episode(model, params, cfg: ModelConfig, icfg: InferenceConfig,
                  inputs: List, capacity: Optional[int] = None,
                  chord_cap: Optional[int] = None):
    """Construct the jit episode for a batch shape; reuse it across retry
    rounds so the loop compiles exactly once."""
    assert len({(i.temperature, i.top_k) for i in inputs}) == 1, \
        "all rows of a batch must share temperature/top_k"
    if capacity is None:
        capacity = min(icfg.memory_length, icfg.generation_length + 16)
        # block-align so commit() hits the single-block cache_append kernel
        # instead of the full-buffer select (the extra masked slots only pad
        # the [G, H, M] score arrays).  Round UP — but never past
        # memory_length: the reference attends to at most memory_length
        # context tokens (model.py:549-560), so when memory_length is the
        # binding term align DOWN instead (attending wider than the
        # reference in the overflow regime would be a silent semantic
        # deviation).  Overflow against the clamped capacity is surfaced
        # as a failed-row flag in the episode body, not silently dropped.
        up = -(-capacity // 128) * 128
        if up > icfg.memory_length and icfg.memory_length >= 128:
            capacity = (icfg.memory_length // 128) * 128
        else:
            capacity = up
    seq_buf = icfg.generation_length + 16
    chord_cap = chord_cap or max(
        8, max(len(i.chord_token_components["chord_token"]) for i in inputs))
    episode = make_episode_fn(
        model, params, cfg, icfg, capacity=capacity, seq_buf=seq_buf,
        chord_cap=chord_cap, temperature=inputs[0].temperature,
        top_k=inputs[0].top_k)
    episode = _aot_episode(
        episode, model, params, cfg,
        (icfg.generation_length, icfg.memory_length, capacity, seq_buf,
         chord_cap, inputs[0].temperature, inputs[0].top_k, len(inputs)))
    return episode, chord_cap


def _aot_episode(episode, model, params, cfg: ModelConfig, statics):
    """Route the episode's one-time compile through the on-disk AOT
    executable store (utils.aot_cache): a warm process start deserializes
    the compiled episode in seconds instead of paying the 20-50 s per-shape
    compile — the serving cold-start answer on runtimes where the XLA
    compile cache loses (see the aot_cache module docstring).  No-op on CPU
    or under COMMU_AOT_CACHE=0; params are digested into the key (they are
    captured constants of the executable), so a new checkpoint is a miss."""
    from ..utils import aot_cache
    if not aot_cache.enabled():
        return episode
    import dataclasses
    import os

    key_parts = ("episode-v1", tuple(sorted(
        (k, str(v)) for k, v in dataclasses.asdict(cfg).items())),
        statics, str(getattr(model, "dtype", None)),
        os.environ.get("COMMU_SEG_DECODE", "1"),
        aot_cache.params_digest(params))
    cell = {}

    def call(*args):
        if "exe" not in cell:
            avals = tuple((np.shape(a), str(np.asarray(a).dtype))
                          for a in args)
            cell["key"] = key_parts + (avals,)
            cell["exe"], cell["loaded"] = aot_cache.load_or_compile(
                cell["key"], episode, args)
        try:
            return cell["exe"](*args)
        except Exception:
            if not cell.pop("loaded", False):
                raise
            # a deserialized executable that loads but cannot EXECUTE on
            # this runtime: recompile fresh (replacing the bad store entry)
            # and retry once — behavior identical minus the wait
            logger.warning("AOT-loaded episode failed at execution — "
                           "recompiling")
            cell["exe"] = aot_cache.compile_fresh(cell["key"], episode, args)
            return cell["exe"](*args)

    return call


def run_episode(episode, chord_cap: int, inputs: List,
                encoded_metas: List[List[int]], key: jax.Array,
                row_cap: Optional[np.ndarray] = None):
    """One batched episode over heterogeneous prompts; returns
    (sequences as python lists, failed flags, chord_rem).  ``row_cap``:
    optional [G] per-row sequence-length terminator (benchmarking)."""
    G = len(inputs)
    tok, pos, inter, count, fit, measures, incomplete = _schedule_arrays(
        inputs, chord_cap)
    primer = np.array([[0] + list(m[:-1]) for m in encoded_metas], dtype=np.int32)
    meta_last = np.array([m[-1] for m in encoded_metas], dtype=np.int32)

    if row_cap is None:
        # seq_buf is not visible here; INT32_MAX-ish cap never fires
        row_cap = np.full((G,), 2 ** 30, dtype=np.int32)
    state = episode(primer, meta_last, tok, pos, inter, count, fit,
                    incomplete, key, np.asarray(row_cap, dtype=np.int32))
    seqs = np.asarray(state.seq)
    lens = np.asarray(state.seq_len)
    failed = np.asarray(state.failed)
    rem = np.asarray(state.chord_rem)
    out = [list(map(int, seqs[g, :lens[g]])) for g in range(G)]
    return out, failed, rem


def _validate(inp, seq: List[int], rem: int) -> bool:
    """Host-side sequence validation (midi_inferrer.py:146-168,322-336)."""
    import math
    chord_length = len(inp.chord_token_components["chord_token"])
    num_bars = seq.count(BAR_ID)
    num_chord = sum(1 for t in seq if _CHORD_START <= t <= _CHORD_END)
    if rem != 0:
        return False
    if num_bars != int(math.ceil(inp.num_measures)):
        return False
    if num_chord != chord_length:
        return False
    return validate_generated_sequence(seq)


def cached_episode(model, params, cfg: ModelConfig, icfg: InferenceConfig,
                   inputs: List, cache: Optional[dict] = None):
    """``build_episode`` with an optional cross-request cache (serving).

    The jit trace cache is per-closure, so a fresh ``build_episode`` per
    request recompiles the whole episode; a long-lived process (the
    ``MidiGenerationPipeline`` or ``generate.py --serve``) passes a dict
    here and pays the compile once per (batch width, temperature, top_k,
    chord-capacity bucket).  The chord capacity is bucketed up to a
    multiple of 8 so prompts with slightly different chord counts share an
    executable (padding rows beyond the real schedule is free — the
    schedule cursor never reaches them)."""
    # the cache key carries row 0's sampling params, so heterogeneity must
    # fail BEFORE the lookup — inside build_episode it would only fire on a
    # cache miss, and a warm hit would silently sample every row with row
    # 0's temperature/top_k
    assert len({(i.temperature, i.top_k) for i in inputs}) == 1, \
        "all rows of a batch must share temperature/top_k"
    n = max(len(i.chord_token_components["chord_token"]) for i in inputs)
    chord_cap = max(8, -(-n // 8) * 8)
    if cache is None:
        return build_episode(model, params, cfg, icfg, inputs,
                             chord_cap=chord_cap)
    key = (len(inputs), inputs[0].temperature, inputs[0].top_k, chord_cap)
    if key not in cache:
        cache[key] = build_episode(model, params, cfg, icfg, inputs,
                                   chord_cap=chord_cap)
    return cache[key]


def execute(model, params, cfg: ModelConfig, icfg: InferenceConfig,
            input_data, encoded_meta: List[int], seed: int = 0,
            validate: bool = True,
            max_rounds: Optional[int] = 20,
            episode_cache: Optional[dict] = None) -> List[List[int]]:
    """Generate ``num_generate`` valid sequences for one prompt, batching all
    attempts per round (replaces the reference's one-at-a-time retry loop,
    midi_inferrer.py:338-354).

    Deliberate deviation: the reference retries forever on repeated
    validation failure (midi_inferrer.py:342-353); by default this gives up
    after ``max_rounds`` rounds with a clear error.  Pass ``max_rounds=None``
    for the reference's unbounded behavior."""
    key = jax.random.PRNGKey(seed)
    want = input_data.num_generate
    batch = [input_data] * want  # fixed width: every round reuses one compile
    episode, chord_cap = cached_episode(model, params, cfg, icfg, batch,
                                        episode_cache)
    sequences: List[List[int]] = []
    rounds = 0
    while len(sequences) < want:
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError("generation repeatedly failed validation")
        key, sub = jax.random.split(key)
        outs, failed, rems = run_episode(
            episode, chord_cap, batch, [encoded_meta] * want, sub)
        for g, seq in enumerate(outs):
            if failed[g]:
                logger.error("Sampling error in row %d", g)
                continue
            if validate and not _validate(input_data, seq, int(rems[g])):
                logger.error("Invalid sequence in row %d", g)
                continue
            sequences.append(seq)
            if len(sequences) == want:
                break
    return sequences


def execute_batch(model, params, cfg: ModelConfig, icfg: InferenceConfig,
                  inputs: List, encoded_metas: List[List[int]],
                  seed: int = 0, max_rounds: Optional[int] = 20,
                  validate: bool = True,
                  episode_cache: Optional[dict] = None):
    """Multi-prompt batched generation: one sequence per input row, retrying
    only the rows that failed validation.  ``max_rounds=None`` retries
    forever (reference behavior, midi_inferrer.py:342-353)."""
    key = jax.random.PRNGKey(seed)
    G = len(inputs)
    episode, chord_cap = cached_episode(model, params, cfg, icfg, inputs,
                                        episode_cache)
    results: List[Optional[List[int]]] = [None] * G
    pending = list(range(G))
    rounds = 0
    while pending and (max_rounds is None or rounds < max_rounds):
        rounds += 1
        key, sub = jax.random.split(key)
        # keep the batch width constant (pad with retried rows) — one compile
        slots = (pending * ((G + len(pending) - 1) // len(pending)))[:G]
        outs, failed, rems = run_episode(
            episode, chord_cap,
            [inputs[i] for i in slots],
            [encoded_metas[i] for i in slots], sub)
        for slot, i in enumerate(slots):
            if results[i] is not None:
                continue
            seq = outs[slot]
            ok = not failed[slot] and (
                not validate or _validate(inputs[i], seq, int(rems[slot])))
            if ok:
                results[i] = seq
        pending = [i for i in pending if results[i] is None]
    if pending:
        raise RuntimeError(f"rows {pending} failed after {max_rounds} rounds")
    return results
