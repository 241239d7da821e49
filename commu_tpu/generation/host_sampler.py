"""Host-parity sampling engine.

Structural replica of the reference's ``InferenceTask``
(reference: commu/midi_generator/midi_inferrer.py:172-354): a Python loop
drives one token per step, with the TeacherForcer deciding forced tokens,
bans and early-exit — but each forward is the jit KV-cache ``decode_step``
instead of a full-window re-encode.  Memory-commit rules match the reference
exactly, including its quirks:

- the first sampling forward does NOT commit (midi_inferrer.py:256-258), so
  the last meta token never enters the memory;
- a forced token's forward commits, and the next iteration's forward commits
  the SAME token again (the reference's forced-branch forward is followed by
  an ordinary forward over an unchanged last token — both append to mems);
- after a banned chord token, the stale logits are reused without any
  forward (``no_sequence_appended``, midi_inferrer.py:253-255).

This engine is the behavioral oracle; the production path is
``jit_sampler``'s fully on-device loop.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InferenceConfig, ModelConfig
from ..models.decode import commit, decode_step, init_cache, precompute_rel, prefill
from ..vocab.event_tokens import EOS_ID, VOCAB_SIZE
from .teacher import TeacherForcer, validate_generated_sequence

logger = logging.getLogger("ComMU")


class SamplingError(RuntimeError):
    pass


def sample_from_logits(logits: np.ndarray, temperature: float, top_k: int,
                       wrong_tokens: List[int], rng: np.random.Generator,
                       return_probs: bool = False):
    """Temperature -> softmax -> left-pad -> top-k -> ban -> renorm -> draw
    (reference: midi_inferrer.py:209-237).  ``logits`` excludes token 0.

    QUIRK: the reference's ``calc_probs`` divides the logits tensor by the
    temperature IN PLACE (midi_inferrer.py:216), so when stale logits are
    reused after a banned chord token they are tempered again.  ``logits``
    is mutated here to reproduce that.
    """
    if temperature == 0:
        probs = np.zeros_like(logits, dtype=np.float64)
        probs[int(np.argmax(logits))] = 1.0
    else:
        logits /= temperature  # in-place on purpose (see docstring)
        shifted = logits.astype(np.float64) - logits.max()
        e = np.exp(shifted)
        probs = e / e.sum()
    probs = np.concatenate([[0.0], probs])  # token id == index

    top_idx = np.argsort(-probs, kind="stable")[:top_k]
    mask = np.zeros_like(probs)
    mask[top_idx] = 1.0
    for w in wrong_tokens:
        mask[w] = 0.0
    probs = probs * mask
    total = probs.sum()
    if total <= 0 or not np.isfinite(total):
        raise SamplingError("all candidate tokens masked")
    probs = probs / total
    token = int(rng.choice(len(probs), p=probs))
    return (token, probs) if return_probs else token


class InferenceEngine:
    """jit prefill/step wrapper around the decode path, batch size 1."""

    def __init__(self, model, params, model_cfg: ModelConfig,
                 inference_cfg: Optional[InferenceConfig] = None,
                 capacity: Optional[int] = None):
        self.model = model
        self.params = params
        self.cfg = model_cfg
        self.inference_cfg = inference_cfg or InferenceConfig()
        gen_len = self.inference_cfg.generation_length
        self.capacity = capacity or min(self.inference_cfg.memory_length,
                                        gen_len + 16)
        self.rel = precompute_rel(params, model_cfg, self.capacity)

        @jax.jit
        def _step(params, rel, tok, cache, advance):
            logits, k_self, v_self = decode_step(params, model_cfg, rel, tok, cache)
            return logits, commit(cache, k_self, v_self, advance)

        self._step = _step

    def prime(self, encoded_meta: List[int]):
        """[pad] + meta[:10] one-shot prefill (midi_inferrer.py:186-197)."""
        primer = jnp.asarray([[0] + list(encoded_meta[:-1])], dtype=jnp.int32)
        cache = init_cache(self.cfg, 1, self.capacity)
        cache = prefill(self.model, self.params, self.cfg, primer, cache)
        seq = [0] + [int(t) for t in encoded_meta]
        return seq, cache

    def forward_last(self, seq: List[int], cache, *, advance: bool):
        adv = jnp.asarray([advance])
        tok = jnp.asarray([seq[-1]], dtype=jnp.int32)
        logits, cache = self._step(self.params, self.rel, tok, cache, adv)
        # strip token 0 like the reference (midi_inferrer.py:206); np.array
        # (not asarray) — device arrays view read-only and the sampler's
        # in-place temperature divide needs a writable buffer
        return np.array(logits[0], dtype=np.float32)[1:], cache


def generate_sequence(engine: InferenceEngine, input_data, seq: List[int],
                      cache, rng: np.random.Generator) -> Optional[List[int]]:
    """One sampling episode (reference: midi_inferrer.py:239-320)."""
    from ..vocab.event_tokens import BAR_ID

    teacher = TeacherForcer(input_data)
    logits = None
    first_loop = True
    for _ in range(engine.inference_cfg.generation_length):
        if seq[-1] == EOS_ID:
            break

        if teacher.next_tokens_forced:
            seq.append(teacher.next_tokens_forced.pop(0))
            logits, cache = engine.forward_last(seq, cache, advance=True)
            continue

        if teacher.no_sequence_appended:
            assert logits is not None
            teacher.no_sequence_appended = False
        elif first_loop:
            logits, _ = engine.forward_last(seq, cache, advance=False)
            first_loop = False
        else:
            logits, cache = engine.forward_last(seq, cache, advance=True)

        if not teacher.incomplete_filled:
            teacher.incomplete_filled = seq.count(BAR_ID) > 1

        if teacher.check_first_position(seq):
            teacher.teach_first_position()
            continue
        if teacher.check_one_chord_per_bar_case(seq):
            teacher.teach_chord_token()
            continue
        if teacher.check_mul_chord_per_bar_case(seq):
            teacher.teach_chord_token()
            continue

        try:
            token = sample_from_logits(
                logits, input_data.temperature, input_data.top_k,
                teacher.wrong_tokens, rng)
        except SamplingError as e:
            logger.error("Sampling Error: %s", e)
            return None

        if teacher.check_chord_position_passed(token):
            teacher.teach_chord_position()
            continue
        if teacher.check_wrong_chord_token_generated(token):
            teacher.teach_wrong_chord_token(token)
            continue
        if teacher.check_wrong_eos_generated(token):
            teacher.teach_remnant_chord()
            continue
        if teacher.check_wrong_bar_token_generated(token):
            teacher.teach_eos()
            continue

        seq.append(token)

    try:
        teacher.validate_teacher_forced_sequence(seq)
    except ValueError as error:
        logger.error("%s", error)
        return None
    return seq


def execute(engine: InferenceEngine, input_data, encoded_meta: List[int],
            seed: int = 0, validate: bool = True,
            max_attempts_per_sequence: Optional[int] = 20) -> List[List[int]]:
    """Generate until ``num_generate`` valid sequences
    (reference: midi_inferrer.py:338-354).

    Deliberate deviation: the reference retries forever; by default this
    raises after ``max_attempts_per_sequence * num_generate`` attempts.
    Pass ``max_attempts_per_sequence=None`` for unbounded retries."""
    rng = np.random.default_rng(seed)
    sequences: List[List[int]] = []
    attempts = 0
    while len(sequences) != input_data.num_generate:
        attempts += 1
        if (max_attempts_per_sequence is not None and
                attempts > max_attempts_per_sequence * input_data.num_generate):
            raise RuntimeError("generation repeatedly failed validation")
        logger.info("Generating the idx: %d", len(sequences) + 1)
        seq, cache = engine.prime(encoded_meta)
        full = generate_sequence(engine, input_data, seq, cache, rng)
        if validate:
            if full is None:
                continue
            if not validate_generated_sequence(full):
                logger.error("Empty sequence generated")
                continue
        elif full is None:
            full = seq  # lenient mode: keep whatever was produced
        sequences.append(full)
    return sequences
