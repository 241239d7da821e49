"""Generation pipeline facade (reference: generate_pipeline.py:10-35,
model_initializer.py:13-57, info_preprocessor.py:20-45).

Wires the four stages: model init (checkpoint load), input preprocessing
(meta encoding), inference (host-parity or jit batched sampler), and MIDI
postprocessing.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp

from ..config import InferenceConfig, ModelConfig, get_default_cfg_inference
from ..models.transformer_xl import TransformerXL
from ..vocab.event_tokens import VOCAB_SIZE
from ..vocab.meta_codec import encode_meta
from . import host_sampler, postprocess
from .container import GenerationInput

logger = logging.getLogger("ComMU")


def load_params(checkpoint_dir: str, model_cfg: ModelConfig):
    """Load flax params from an Orbax dir ('checkpoint_best'/'checkpoint_last'
    produced by our Trainer) or a reference-format .pt file."""
    path = Path(checkpoint_dir)
    if path.suffix == ".pt":
        from ..training.checkpoint import import_torch
        return import_torch(path, model_cfg)
    import numpy as np
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path.resolve())
    params = payload["params"] if "params" in payload else payload
    import jax
    return jax.tree_util.tree_map(np.asarray, params)


def _model_cfg_for_checkpoint(checkpoint_dir: str) -> ModelConfig:
    """Model shape for a checkpoint: the sibling work-dir ``config.yml`` if
    one exists (written by our Trainer), else the reference defaults.

    The reference computes this path but never parses it
    (model_initializer.py:25-34), so generating from a non-default model
    crashes there; here the snapshot travels with the checkpoint."""
    import dataclasses

    from ..config import load_config_snapshot
    path = Path(checkpoint_dir)
    base = path.parent if path.suffix == ".pt" or path.is_dir() else path
    snapshot = base / "config.yml"
    if snapshot.is_file():
        model_cfg = load_config_snapshot(snapshot).model
        logger.info("model config from %s", snapshot)
        return dataclasses.replace(model_cfg, same_length=True)
    return ModelConfig(same_length=True)


class MidiGenerationPipeline:
    def __init__(self, checkpoint_dir: str,
                 model_cfg: Optional[ModelConfig] = None,
                 inference_cfg: Optional[InferenceConfig] = None,
                 sampler: str = "jit", decode_dtype=jnp.float32,
                 enable_compile_cache: bool = False):
        # The persistent compile cache is process-GLOBAL, and warm-loading
        # layout-PINNED entries (train/eval compiles) can misbehave (see
        # utils.jax_cache).  A library constructor must not flip process
        # state that other compiles in the same process never opted into —
        # generation ENTRY POINTS (generate.py, scripts/bench_generation.py)
        # enable it themselves; embedders that own the whole process can
        # pass enable_compile_cache=True.
        if enable_compile_cache:
            from ..utils.jax_cache import enable_persistent_cache
            enable_persistent_cache(pinned_layouts=False)
        self.model_cfg = model_cfg or _model_cfg_for_checkpoint(checkpoint_dir)
        self.inference_cfg = inference_cfg or get_default_cfg_inference()
        self.params = load_params(checkpoint_dir, self.model_cfg)
        if decode_dtype != jnp.float32:
            import jax
            self.params = jax.tree_util.tree_map(
                lambda a: a.astype(decode_dtype)
                if hasattr(a, "astype") else a, self.params)
        self.model = TransformerXL(VOCAB_SIZE, self.model_cfg,
                                   dtype=decode_dtype)
        self.sampler = sampler
        # compiled-episode reuse across run() calls (the serving path):
        # keyed by (batch width, temperature, top_k, chord-cap bucket) —
        # see jit_sampler.cached_episode
        self.episode_cache: dict = {}

    def encode_input_meta(self, input_data: GenerationInput) -> List[int]:
        return encode_meta(input_data.midi_meta())

    def generate_sequences(self, input_data: GenerationInput, seed: int = 0,
                           validate: bool = True) -> List[List[int]]:
        encoded_meta = self.encode_input_meta(input_data)
        capacity = min(self.inference_cfg.memory_length,
                       self.inference_cfg.generation_length + 16)
        if self.sampler == "host":
            engine = host_sampler.InferenceEngine(
                self.model, self.params, self.model_cfg, self.inference_cfg,
                capacity=capacity)
            return host_sampler.execute(engine, input_data, encoded_meta, seed,
                                        validate=validate)
        from . import jit_sampler
        return jit_sampler.execute(
            self.model, self.params, self.model_cfg, self.inference_cfg,
            input_data, encoded_meta, seed, validate=validate,
            episode_cache=self.episode_cache)

    def run(self, input_data: GenerationInput, seed: int = 0,
            validate: bool = True) -> Path:
        sequences = self.generate_sequences(input_data, seed, validate=validate)
        out = postprocess.write_sequences(input_data, sequences)
        logger.info("generated %d sequences -> %s", len(sequences), out)
        return out
