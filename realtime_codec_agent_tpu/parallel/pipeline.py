"""GPipe-style pipeline parallelism over the ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.3: tensor/pipeline/
expert parallelism absent — a 1B model fits one device), so this is scale-out
machinery, built the TPU way rather than ported: the stacked
scan-over-layers parameter layout (models/llama.stack_layer_params) is
sharded over ``pp`` along the layer axis, and a ``jax.shard_map`` that is
MANUAL over ``pp`` only (dp/fsdp/tp stay on GSPMD auto) rotates microbatch
activations stage-to-stage with ``lax.ppermute`` — the scaling-book
pipelining recipe. Stage s therefore holds layers [s*L/pp, (s+1)*L/pp) and
the per-tick activation handoff is one nearest-neighbor ICI hop (the ``pp``
axis is innermost in make_mesh).

The schedule is plain GPipe: M microbatches flow through pp stages in
M + pp - 1 ticks; backward is whatever AD produces by transposing the
forward (ppermute transposes to the reverse rotation), so there is no 1F1B
interleaving — bubble fraction (pp-1)/(M+pp-1), shrink it by raising
``microbatches``. Embedding, final norm, and the CE loss run OUTSIDE the
pipeline under normal GSPMD sharding; only the layer stack is staged.

Token math is identical to the unpipelined ``forward`` (same layer body —
models/llama.transformer_layer); tests/test_pipeline_parallel.py pins loss
and gradients against the pp=1 scan at f32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.llama import DuplexLMConfig, embed_ids, transformer_layer
from ..ops import nn
from jax.sharding import PartitionSpec as P


def _pipeline_hidden(layers, x, cos, sin, attn_valid, cfg: DuplexLMConfig, microbatches: int):
    """shard_map body (manual over ``pp``): run the local layer slice over
    rotating microbatches. ``layers`` leaves are the stage-local (L/pp, ...)
    slices; everything else arrives replicated over pp."""
    pp = jax.lax.axis_size("pp")
    stage = jax.lax.axis_index("pp")
    b = x.shape[0]
    mb = b // microbatches
    xm = x.reshape(microbatches, mb, *x.shape[1:])
    vm = attn_valid.reshape(microbatches, mb, attn_valid.shape[1])
    t = x.shape[1]
    base_mask = nn.causal_mask(t, t, 0) if t <= 512 else None

    def stage_fn(h, valid):
        mask = base_mask
        if mask is not None:
            mask = mask & valid[:, None, None, :]
        body = lambda c, blk: (
            transformer_layer(c, blk, cfg, cos, sin, mask=mask, attn_valid=valid),
            None,
        )
        if cfg.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if cfg.remat_policy == "dots"
                else None
            )
            body = jax.checkpoint(body, policy=policy)
        out, _ = jax.lax.scan(body, h, layers)
        return out

    perm = [(i, (i + 1) % pp) for i in range(pp)]
    state = jnp.zeros_like(xm[0])
    outputs = jnp.zeros_like(xm)
    # static GPipe schedule: tick runs microbatch (tick - s) on stage s
    for tick in range(microbatches + pp - 1):
        inp = jnp.where(stage == 0, xm[tick % microbatches], state)
        # each stage's in-flight microbatch needs ITS validity rows (they only
        # gate attention keys, so the bubble ticks' garbage rows are harmless)
        valid = vm[jnp.clip(tick - stage, 0, microbatches - 1)]
        out = stage_fn(inp, valid)
        if pp - 1 <= tick < microbatches + pp - 1:
            oi = tick - (pp - 1)
            outputs = outputs.at[oi].set(
                jnp.where(stage == pp - 1, out, outputs[oi])
            )
        state = jax.lax.ppermute(out, "pp", perm)
    # only the last stage holds real outputs; replicate over pp so the loss
    # (outside the shard_map) sees the full tensor on every stage
    outputs = jax.lax.psum(
        jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)), "pp"
    )
    return outputs.reshape(x.shape)


def make_pipeline_forward(mesh, microbatches: int):
    """A drop-in replacement for models/llama.forward (training mode only)
    that stages the layer stack over the mesh's ``pp`` axis. Params must be
    in the stacked layout with the layer axis sharded over pp
    (mesh.lm_param_specs(pp=True)); batch size must divide ``microbatches``.

    Returns ``fwd(params, ids, cfg, attn_mask=None) -> (hidden, None)`` with
    hidden already final-normed, exactly like ``forward``'s training mode.
    """
    if mesh.shape.get("pp", 1) < 2:
        raise ValueError("make_pipeline_forward needs a mesh with a pp axis >= 2")

    def fwd(params, ids, cfg: DuplexLMConfig, attn_mask=None, positions=None):
        if not isinstance(params["layers"], dict):
            raise ValueError(
                "pipeline forward requires the stacked scan-over-layers layout"
            )
        b, t = ids.shape
        if b % microbatches:
            raise ValueError(f"batch {b} must divide microbatches={microbatches}")
        x = embed_ids(params, ids, cfg)
        # training positions are row-independent: one (1, T, Dh) table shared
        # by every microbatch
        pos = jnp.arange(t)[None, :]
        cos, sin = nn.rope_cos_sin(
            pos, cfg.head_dim, cfg.rope_theta, rope_scaling=cfg.rope_scaling
        )
        pipe = jax.shard_map(
            functools.partial(_pipeline_hidden, cfg=cfg, microbatches=microbatches),
            mesh=mesh,
            in_specs=(P("pp"), P(), P(), P(), P()),
            out_specs=P(),
            axis_names={"pp"},
        )
        attn_valid = (
            attn_mask.astype(bool)
            if attn_mask is not None
            else jnp.ones((b, t), dtype=bool)
        )
        x = pipe(params["layers"], x, cos, sin, attn_valid)
        x = nn.rms_norm(x, params["final_norm"], cfg.rms_eps)
        return x, None

    return fwd
