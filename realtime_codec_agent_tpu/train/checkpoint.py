"""Orbax checkpointing with auto-resume.

Replaces the reference's HF Trainer checkpoint plumbing
(train_vanilla_latest.py:357-370, 694-715): save {params, opt_state, step},
detect + restore the latest checkpoint, and load bare params for inference —
the trainer and the serving engine share the same array format, so there is no
GGUF-style conversion step (reference prep_test_model.sh becomes a no-op).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np

CKPT_PREFIX = "checkpoint-"


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"{CKPT_PREFIX}{step}")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(output_dir, name)
    return best


def save(output_dir: str, trainer) -> str:
    import orbax.checkpoint as ocp

    path = _ckpt_dir(output_dir, trainer.step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, "state"),
            {
                "params": trainer.params,
                "opt_state": trainer.opt_state,
                "step": np.asarray(trainer.step),
            },
            force=True,
        )
    return path


def restore_latest(output_dir: str, trainer) -> bool:
    import orbax.checkpoint as ocp

    path = latest_checkpoint(output_dir)
    if path is None:
        return False
    target = {
        "params": trainer.params,
        "opt_state": trainer.opt_state,
        "step": np.asarray(trainer.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"), target)
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.step = int(restored["step"])
    return True


def save_params(path: str, params) -> str:
    """Save bare params (deployment artifact — e.g. after persist_codec_embeddings)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    return path


def load_params(path: str, lm_config=None, target=None):
    """Load bare params saved by save_params (or a checkpoint dir's params)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    params_path = os.path.join(path, "params")
    if not os.path.isdir(params_path):
        state_path = os.path.join(path, "state")
        if os.path.isdir(state_path):
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(state_path)
            params = restored["params"]
            if isinstance(params.get("layers"), dict):
                from ..models.llama import unstack_layer_params

                params = unstack_layer_params(params)
            return params
        raise FileNotFoundError(f"No params/ or state/ checkpoint under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(params_path, target)
        else:
            restored = ckptr.restore(params_path)
    if isinstance(restored.get("layers"), dict):
        # trainer checkpoints use the stacked scan-over-layers layout;
        # inference wants the unrolled per-layer list
        from ..models.llama import unstack_layer_params

        restored = unstack_layer_params(restored)
    return restored
