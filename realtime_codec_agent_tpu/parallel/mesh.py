"""Device mesh + sharding rules for the duplex LM.

The reference's only distribution is HF Trainer data-parallelism
(train_vanilla_latest.py:351-354, 753-755, via torch.distributed/XLA). Here
parallelism is first-class: a ``(dp, fsdp, tp)`` mesh over ICI with
NamedSharding rules per parameter tensor. A 1B LM on one v5e chip needs none
of it — the same code runs with a 1-device mesh — but scaling TP/FSDP out is
a mesh-shape change, not a code change.

Sharding layout (scaling-book style):
- batch is sharded over (dp, fsdp);
- parameters are sharded over fsdp on one axis (ZeRO-3-style gather by XLA)
  and over tp on the matmul-parallel axis (Megatron-style column/row split:
  wq/wk/wv/w_gate/w_up column-parallel, wo/w_down row-parallel, vocab
  dimensions of embed/lm_head tp-sharded).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp", "pp")


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(dp, fsdp, tp, pp) mesh. ``pp`` is the pipeline-stage axis (GPipe
    microbatch rotation, parallel/pipeline.py); it sits innermost so adjacent
    stages are ICI neighbors and the per-tick ppermute is a nearest-neighbor
    hop. Specs that don't mention an axis are replicated over it, so a size-1
    axis is free — existing (dp, fsdp, tp) call sites are unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * tp * pp
    if n > len(devices):
        raise ValueError(
            f"mesh {dp}x{fsdp}x{tp}x{pp} needs {n} devices, have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(dp, fsdp, tp, pp)
    return Mesh(arr, AXES)


def default_mesh_shape(n_devices: int) -> Dict[str, int]:
    """Reasonable default factorization: prefer fsdp x tp for a single replica
    group, adding dp only beyond 8 devices."""
    if n_devices == 1:
        return dict(dp=1, fsdp=1, tp=1)
    if n_devices == 2:
        return dict(dp=1, fsdp=2, tp=1)
    if n_devices == 4:
        return dict(dp=1, fsdp=2, tp=2)
    if n_devices == 8:
        return dict(dp=2, fsdp=2, tp=2)
    # general: pick the largest tp in {4,2,1} dividing n, then the largest
    # fsdp in {4,2,1} dividing the remainder, and grow dp with what's left —
    # every factor divides evenly so dp >= 1 for any device count (incl.
    # non-powers-of-two like 6 or 12)
    tp = next(t for t in (4, 2, 1) if n_devices % t == 0)
    rem = n_devices // tp
    fsdp = next(f for f in (4, 2, 1) if rem % f == 0)
    dp = rem // fsdp
    return dict(dp=dp, fsdp=fsdp, tp=tp)


def _layer_specs(keys=None) -> Dict[str, P]:
    specs = {
        "attn_norm": P(),
        "wq": P("fsdp", "tp"),
        "wk": P("fsdp", "tp"),
        "wv": P("fsdp", "tp"),
        "wo": P("tp", "fsdp"),
        "mlp_norm": P(),
        "w_gate": P("fsdp", "tp"),
        "w_up": P("fsdp", "tp"),
        "w_down": P("tp", "fsdp"),
        # Qwen2-family q/k/v biases: tiny vectors, replicated
        "bq": P(None),
        "bk": P(None),
        "bv": P(None),
    }
    if keys is None:
        return specs
    return {k: specs[k] for k in keys}


def lm_param_specs(params, pp: bool = False) -> Dict:
    """PartitionSpec pytree matching models/llama.py's param layout (both the
    unrolled list-of-dicts and the stacked scan-over-layers layouts: stacked
    tensors carry a leading replicated layer axis). With ``pp=True`` the
    stacked layer axis is sharded over the pipeline-stage mesh axis instead —
    each stage holds its L/pp contiguous layers (parallel/pipeline.py)."""
    if isinstance(params["layers"], dict):
        layer_specs = {
            k: P("pp" if pp else None, *spec)
            for k, spec in _layer_specs(params["layers"].keys()).items()
        }
    else:
        layer_specs = [_layer_specs(blk.keys()) for blk in params["layers"]]
    specs = {
        # vocab over (tp, fsdp), hidden replicated: same bytes/device as a
        # 2-D (tp, fsdp) tiling, but the embedding-backward scatter's update
        # grad keeps the batch layout — sharding hidden by fsdp made GSPMD
        # emit an "[SPMD] Involuntary full rematerialization" (replicate +
        # repartition of the d_embed tensor) every step
        "embed_tokens": P(("tp", "fsdp"), None),
        "layers": layer_specs,
        "final_norm": P(),
    }
    if "lm_head" in params:
        specs["lm_head"] = P("fsdp", "tp")
    if "codec_embed" in params:
        specs["codec_embed"] = {
            "table": P("fsdp", None),
            "projectors": [
                {"w1": P(None, "tp"), "b1": P("tp"), "w2": P("fsdp", "tp"), "b2": P("tp")}
                for _ in params["codec_embed"]["projectors"]
            ],
        }
    return specs


def batch_spec() -> P:
    return P(("dp", "fsdp"), None)


def shard_lm_for_inference(params, k_cache, v_cache, mesh: Mesh, rows_axis=None):
    """Megatron-style tensor-parallel INFERENCE sharding: attention/MLP
    column- and row-parallel over ``tp``, KV cache sharded over kv-heads,
    embeddings + lm_head replicated/column-split. The decode programs
    (models/llama.forward_decode & friends) need no changes — XLA infers the
    all-reduces from the shardings (compute-follows-data). A 1B LM fits one
    chip; this is the config-change path to serving bigger models
    (SURVEY §2.3: TP over ICI as a mesh-shape change).

    ``rows_axis`` additionally shards the cache's batch/row dimension (the
    batched serving engine's concurrent streams) over that mesh axis —
    data-parallel serving rows on top of tensor-parallel weights."""
    def matmul_spec(w, spec: P):
        """int8-quantized leaves are {'q': (in,out) int8, 's': (out,) f32}
        dicts (ops/nn.qdot): shard q like the raw weight and s along the
        output axis."""
        if isinstance(w, dict) and "q" in w:
            return {"q": spec, "s": P(spec[1])}
        if isinstance(w, dict) and "q4" in w:
            # int4 leaves: q4 (K/2, N) and d/m (K/G, N) share the raw
            # weight's (K, N) axis semantics; group-contiguous nibble
            # packing keeps K-axis (row-parallel) shard boundaries on
            # whole groups (ops/int4_matmul.py layout note).
            return {"q4": spec, "d": spec, "m": spec}
        return spec

    def layer_spec(blk):
        col, row = P(None, "tp"), P("tp", None)
        specs = {
            "attn_norm": P(),
            "wq": matmul_spec(blk["wq"], col),
            "wk": matmul_spec(blk["wk"], col),
            "wv": matmul_spec(blk["wv"], col),
            "wo": matmul_spec(blk["wo"], row),
            "mlp_norm": P(),
            "w_gate": matmul_spec(blk["w_gate"], col),
            "w_up": matmul_spec(blk["w_up"], col),
            "w_down": matmul_spec(blk["w_down"], row),
        }
        for b in ("bq", "bk", "bv"):
            if b in blk:
                specs[b] = P()
        return specs

    specs = {
        "embed_tokens": P(),
        "layers": [layer_spec(blk) for blk in params["layers"]],
        "final_norm": P(),
    }
    if "lm_head" in params:
        specs["lm_head"] = matmul_spec(params["lm_head"], P(None, "tp"))
    if "codec_embed" in params:
        specs["codec_embed"] = jax.tree.map(
            lambda _: P(), params["codec_embed"],
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )
    sharded_params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
    kv_spec = NamedSharding(mesh, P(None, rows_axis, None, "tp", None))
    return sharded_params, jax.device_put(k_cache, kv_spec), jax.device_put(v_cache, kv_spec)


def shard_batched_engine_for_serving(engine, mesh: Mesh, rows_axis="dp"):
    """Shard a ``BatchedDecodeEngine`` in place for multi-chip serving:
    weights Megatron-style over ``tp``, the KV cache's stream rows over
    ``rows_axis`` (data-parallel streams) with kv-heads over ``tp``, and the
    per-row device-carried decode state over ``rows_axis``. The step/commit
    programs need no changes — XLA infers the collectives — and token
    streams are identical to the unsharded engine (pinned by
    tests/test_batched_serving.py)."""
    if engine.batch % mesh.shape[rows_axis] != 0:
        raise ValueError(
            f"batch {engine.batch} must divide over {rows_axis}={mesh.shape[rows_axis]}"
        )
    engine.params, engine._k, engine._v = shard_lm_for_inference(
        engine.params, engine._k, engine._v, mesh, rows_axis=rows_axis
    )
    row = NamedSharding(mesh, P(rows_axis))
    row2 = NamedSharding(mesh, P(rows_axis, None))
    engine.dstate = {
        k: jax.device_put(v, row2 if v.ndim == 2 else row)
        for k, v in engine.dstate.items()
    }
    return engine


def shard_params(params, mesh: Mesh, pp: bool = False):
    specs = lm_param_specs(params, pp=pp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def named_shardings(mesh: Mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
