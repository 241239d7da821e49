"""Checkpoint interop: reference torch ``MemTransformerLM`` <-> Flax params.

Used (a) to load the reference's released checkpoint for NLL-parity
validation, and (b) by differential tests that compare logits between the two
stacks under identical weights.  Works on plain numpy arrays so torch is only
needed by the caller that produced the state dict.

Reference layout (commu/model/model.py):
    word_emb.emb_layers.0.weight  [V, D]   (tied with crit.out_layers.0.weight)
    crit.out_layers.0.bias        [V]
    r_w_bias / r_r_bias           [H, Dh]
    layers.{i}.dec_attn.qkv_net.weight  [3*H*Dh, D]  (rows: q | k | v)
    layers.{i}.dec_attn.r_net.weight    [H*Dh, D]
    layers.{i}.dec_attn.o_net.weight    [D, H*Dh]
    layers.{i}.dec_attn.layer_norm.{weight,bias}
    layers.{i}.pos_ff.CoreNet.{0,3}.{weight,bias}
    layers.{i}.pos_ff.layer_norm.{weight,bias}
(torch Linear stores [out, in]; flax Dense kernels are [in, out].)
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import ModelConfig


def flax_params_from_torch_state(state: Dict[str, np.ndarray],
                                 cfg: ModelConfig = ModelConfig()) -> dict:
    """Torch state-dict (numpy values) -> flax ``params`` tree."""
    d_model = cfg.units
    n_head = cfg.num_heads
    d_head = d_model // n_head
    hd = n_head * d_head

    def arr(key):
        # always COPY: torch's .detach().numpy() aliases the live parameter
        # storage, and in-place optimizer updates would silently mutate the
        # converted tree
        return np.array(state[key], dtype=np.float32, copy=True)

    params = {
        "embedding": arr("word_emb.emb_layers.0.weight"),
        "out_bias": arr("crit.out_layers.0.bias"),
        "r_w_bias": arr("r_w_bias"),
        "r_r_bias": arr("r_r_bias"),
    }
    for i in range(cfg.num_layers):
        prefix = f"layers.{i}"
        qkv = arr(f"{prefix}.dec_attn.qkv_net.weight")  # [3*hd, D]
        params[f"layer_{i}"] = {
            "attn": {
                "q_net": {"kernel": qkv[:hd].T},
                "kv_net": {"kernel": qkv[hd:].T},
                "r_net": {"kernel": arr(f"{prefix}.dec_attn.r_net.weight").T},
                "o_net": {"kernel": arr(f"{prefix}.dec_attn.o_net.weight").T},
                "layer_norm": {
                    "scale": arr(f"{prefix}.dec_attn.layer_norm.weight"),
                    "bias": arr(f"{prefix}.dec_attn.layer_norm.bias"),
                },
            },
            "ff": {
                "ff1": {"kernel": arr(f"{prefix}.pos_ff.CoreNet.0.weight").T,
                        "bias": arr(f"{prefix}.pos_ff.CoreNet.0.bias")},
                "ff2": {"kernel": arr(f"{prefix}.pos_ff.CoreNet.3.weight").T,
                        "bias": arr(f"{prefix}.pos_ff.CoreNet.3.bias")},
                "layer_norm": {
                    "scale": arr(f"{prefix}.pos_ff.layer_norm.weight"),
                    "bias": arr(f"{prefix}.pos_ff.layer_norm.bias"),
                },
            },
        }
    return params


def torch_state_from_flax_params(params: dict,
                                 cfg: ModelConfig = ModelConfig()) -> Dict[str, np.ndarray]:
    """Flax ``params`` tree -> torch-layout state dict (numpy values)."""

    def arr(x):
        return np.asarray(x, dtype=np.float32)

    state: Dict[str, np.ndarray] = {
        "word_emb.emb_layers.0.weight": arr(params["embedding"]),
        "crit.out_layers.0.weight": arr(params["embedding"]),  # tied
        "crit.out_layers.0.bias": arr(params["out_bias"]),
        "r_w_bias": arr(params["r_w_bias"]),
        "r_r_bias": arr(params["r_r_bias"]),
    }
    for i in range(cfg.num_layers):
        layer = params[f"layer_{i}"]
        prefix = f"layers.{i}"
        q = arr(layer["attn"]["q_net"]["kernel"]).T
        kv = arr(layer["attn"]["kv_net"]["kernel"]).T
        state[f"{prefix}.dec_attn.qkv_net.weight"] = np.concatenate([q, kv], axis=0)
        state[f"{prefix}.dec_attn.r_net.weight"] = arr(layer["attn"]["r_net"]["kernel"]).T
        state[f"{prefix}.dec_attn.o_net.weight"] = arr(layer["attn"]["o_net"]["kernel"]).T
        state[f"{prefix}.dec_attn.layer_norm.weight"] = arr(layer["attn"]["layer_norm"]["scale"])
        state[f"{prefix}.dec_attn.layer_norm.bias"] = arr(layer["attn"]["layer_norm"]["bias"])
        state[f"{prefix}.pos_ff.CoreNet.0.weight"] = arr(layer["ff"]["ff1"]["kernel"]).T
        state[f"{prefix}.pos_ff.CoreNet.0.bias"] = arr(layer["ff"]["ff1"]["bias"])
        state[f"{prefix}.pos_ff.CoreNet.3.weight"] = arr(layer["ff"]["ff2"]["kernel"]).T
        state[f"{prefix}.pos_ff.CoreNet.3.bias"] = arr(layer["ff"]["ff2"]["bias"])
        state[f"{prefix}.pos_ff.layer_norm.weight"] = arr(layer["ff"]["layer_norm"]["scale"])
        state[f"{prefix}.pos_ff.layer_norm.bias"] = arr(layer["ff"]["layer_norm"]["bias"])
    return state
