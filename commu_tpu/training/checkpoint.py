"""Checkpointing: best/last policy + real resume + torch interop.

The reference saves ``checkpoint_last.pt`` every eval interval and
``checkpoint_best.pt`` on val improvement, with {model, optimizer, scheduler,
step, best_val_nll} (reference: train.py:29-54,228-253) — and has NO resume
path.  Here:

- native checkpoints are Orbax directories (``checkpoint_last/`` /
  ``checkpoint_best/``) holding {params, opt_state, step, best_val_nll};
- ``restore`` gives real resume (step + optimizer moments + schedule position
  round-trip exactly: the schedule is a pure function of the step count);
- ``export_torch`` / ``import_torch`` bridge to the reference's ``.pt``
  format via commu_tpu.models.convert, so the released reference checkpoint
  can be evaluated here and our trained weights can be served by the
  reference stack.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from ..config import ModelConfig
from ..models import convert


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """best/last checkpoints under ``work_dir`` (reference: train.py:29-54)."""

    def __init__(self, work_dir: str | Path):
        self.work_dir = Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)

    def _path(self, name: str) -> Path:
        return self.work_dir / name

    def save(self, name: str, state, best_val_nll: float) -> None:
        import orbax.checkpoint as ocp

        payload = {
            "params": _to_host(state.params),
            "opt_state": _to_host(state.opt_state),
            "step": int(state.step),
            "best_val_nll": float(best_val_nll),
        }
        path = self._path(name)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path.resolve(), payload, force=True)

    def save_last(self, state, best_val_nll: float) -> None:
        self.save("checkpoint_last", state, best_val_nll)

    def save_best(self, state, best_val_nll: float) -> None:
        self.save("checkpoint_best", state, best_val_nll)

    def restore(self, name: str, template_state) -> tuple[Any, float]:
        """Restore (TrainState, best_val_nll); ``template_state`` supplies the
        tree structure/shapes/dtypes.

        The target is ABSTRACT (ShapeDtypeStructs): Orbax only needs the tree
        shape/dtype skeleton, and materializing the template's device arrays
        on host here would read the entire state back through the runtime
        leaf-by-leaf (hundreds of MB) for nothing."""
        import orbax.checkpoint as ocp

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                           jax.numpy.result_type(x)),
            (template_state.params, template_state.opt_state))
        target = {
            "params": abstract[0],
            "opt_state": abstract[1],
            "step": 0,
            "best_val_nll": 0.0,
        }
        with ocp.StandardCheckpointer() as ckptr:
            payload = ckptr.restore(self._path(name).resolve(), target=target)
        state = dataclasses.replace(
            template_state,
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=jax.numpy.asarray(payload["step"], dtype=jax.numpy.int32),
        )
        return state, float(payload["best_val_nll"])

    def has(self, name: str) -> bool:
        return self._path(name).exists()


def export_torch(params, path: str | Path, *, step: int = 0,
                 best_val_nll: float = float("inf"),
                 cfg: ModelConfig = ModelConfig()) -> None:
    """Write a reference-format ``.pt`` checkpoint (train.py:39-48 layout)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in convert.torch_state_from_flax_params(
                 _to_host(params), cfg).items()}
    torch.save({
        "model": state,
        "optimizer": None,
        "scheduler": None,
        "train_step": step,
        "best_val_nll": best_val_nll,
        "vocab": None,
        "amp": None,
    }, str(path))


def import_torch(path: str | Path, cfg: ModelConfig = ModelConfig()) -> dict:
    """Load a reference ``.pt`` checkpoint into a flax params tree.

    Mirrors the reference's inference-side load (model_initializer.py:43-51):
    reads the ``model`` entry, tolerating extra keys (strict=False analog —
    unknown keys are simply ignored by the converter).
    """
    import torch

    blob = torch.load(str(path), map_location="cpu", weights_only=False)
    state = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    state_np = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return convert.flax_params_from_torch_state(state_np, cfg)


def write_config_snapshot(work_dir: str | Path, cfg) -> None:
    """Reference writes str(cfg) to work_dir/config.yml (train.py:373-375)."""
    path = Path(work_dir)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.yml").write_text(cfg.to_yaml())


def write_run_metadata(work_dir: str | Path, **kwargs) -> None:
    (Path(work_dir) / "run.json").write_text(json.dumps(kwargs, indent=2))
