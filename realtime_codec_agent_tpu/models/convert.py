"""Real-weight interop: HF Llama / MagiCodec torch checkpoints -> param pytrees.

The reference deploys two trained checkpoints this framework must be able to
ingest:

- the duplex LM, an HF Llama-3.2-1B derivative with codec embeddings baked in
  (reference prep_test_model.sh:19-34 converts it to GGUF for llama.cpp; here
  the HF safetensors checkpoint converts to the models/llama.py pytree and
  runs as-is on TPU, no quantize/format step);
- MagiCodec-50Hz-Base, a torch module exposing encoder / quantizer.codebook /
  quantizer.codebook_proj / decoder (reference audio_tokenizer.py:189-201).

Conversions are pure tensor-layout maps (transpose torch's (out,in) Linear
weights into (in,out) for right-multiplication). Numeric parity of the Llama
map is asserted against transformers' own LlamaForCausalLM in
tests/test_convert.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np

from .llama import DuplexLMConfig


def _np(t) -> np.ndarray:
    """torch tensor / np array -> float32 numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (incl. bfloat16, which numpy can't represent directly)
    return t.detach().to("cpu").float().numpy()


def _np_native(t) -> np.ndarray:
    """Like _np but KEEPS the checkpoint dtype when numpy can express it
    (f16/f32 stay as-is — upload bytes matter at full scale); torch bf16
    still upcasts to f32 (numpy has no native bf16). Dict leaves
    (pre-quantized native GGUF imports) pass through."""
    if isinstance(t, (np.ndarray, dict)):
        return t
    if hasattr(t, "dtype") and "bfloat16" in str(t.dtype):
        return t.detach().to("cpu").float().numpy()
    return t.detach().to("cpu").numpy()


# ---------------------------------------------------------------------------
# HF Llama -> models/llama.py pytree
# ---------------------------------------------------------------------------

def hf_config_to_lm_config(hf_cfg: Dict, **overrides) -> DuplexLMConfig:
    """HF LlamaConfig/Qwen2Config dict (config.json) -> DuplexLMConfig.

    Qwen2-family checkpoints (model_type "qwen2" / Qwen2ForCausalLM) differ
    from Llama only by q/k/v projection biases — detected here so
    load_hf_llama serves both families from one numeric path."""
    rope_scaling = hf_cfg.get("rope_scaling") or {}
    rope_type = rope_scaling.get("rope_type", rope_scaling.get("type"))
    archs = " ".join(hf_cfg.get("architectures") or [])
    is_qwen2 = hf_cfg.get("model_type") == "qwen2" or "Qwen2" in archs
    fields = dict(
        attn_bias=bool(hf_cfg.get("attention_bias", is_qwen2)),
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        num_kv_heads=hf_cfg.get("num_key_value_heads", hf_cfg["num_attention_heads"]),
        head_dim=hf_cfg.get(
            "head_dim", hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"]
        ),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rms_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        tie_embeddings=hf_cfg.get("tie_word_embeddings", False),
    )
    if rope_type == "llama3":
        fields.update(
            rope_scaling_factor=rope_scaling.get("factor", 32.0),
            rope_scaling_low_freq=rope_scaling.get("low_freq_factor", 1.0),
            rope_scaling_high_freq=rope_scaling.get("high_freq_factor", 4.0),
            rope_scaling_original_max_position=rope_scaling.get(
                "original_max_position_embeddings", 8192
            ),
        )
    fields.update(overrides)
    return DuplexLMConfig(**fields)


def lm_params_from_hf(state_dict: Dict, cfg: DuplexLMConfig, dtype=None) -> Dict:
    """HF LlamaForCausalLM / Qwen2ForCausalLM state_dict -> param pytree.

    Accepts torch tensors or numpy arrays. Linear weights are stored (out,in)
    by torch and transposed to (in,out). Keys may carry the ``model.``
    prefix (LlamaForCausalLM) or not (LlamaModel).

    Arrays upload to the device in their checkpoint dtype and transpose/cast
    THERE: a 1B F16 artifact then moves ~2 GB over the host link instead of
    ~8 GB of f32 host copies (measured ~2x faster full-scale load over the
    device tunnel).
    """
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or cfg.compute_dtype)
    cast = jax.jit(lambda x: x.astype(dtype))            # caches per shape/dtype
    cast_t = jax.jit(lambda x: x.T.astype(dtype))

    def get(key: str) -> np.ndarray:
        for k in (key, f"model.{key}"):
            if k in state_dict:
                return _np_native(state_dict[k])
        raise KeyError(f"missing checkpoint tensor: {key}")

    def dev(key: str) -> "jnp.ndarray":
        return cast(jnp.asarray(get(key)))

    def lin(key: str) -> "jnp.ndarray":
        w = get(key)
        if isinstance(w, dict):
            # pre-quantized leaf (native GGUF Q4_K int4 import) — already in
            # (in, out) orientation, uploads verbatim (ops/nn.qdot consumes it)
            return {k: jnp.asarray(v) for k, v in w.items()}
        return cast_t(jnp.asarray(w))

    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layers.append(
            {
                "attn_norm": dev(p + "input_layernorm.weight"),
                "wq": lin(p + "self_attn.q_proj.weight"),
                "wk": lin(p + "self_attn.k_proj.weight"),
                "wv": lin(p + "self_attn.v_proj.weight"),
                "wo": lin(p + "self_attn.o_proj.weight"),
                "mlp_norm": dev(p + "post_attention_layernorm.weight"),
                "w_gate": lin(p + "mlp.gate_proj.weight"),
                "w_up": lin(p + "mlp.up_proj.weight"),
                "w_down": lin(p + "mlp.down_proj.weight"),
            }
        )
        if cfg.attn_bias:
            layers[-1]["bq"] = dev(p + "self_attn.q_proj.bias")
            layers[-1]["bk"] = dev(p + "self_attn.k_proj.bias")
            layers[-1]["bv"] = dev(p + "self_attn.v_proj.bias")
    params = {
        "embed_tokens": dev("embed_tokens.weight"),
        "layers": layers,
        "final_norm": dev("norm.weight"),
    }
    has_head = "lm_head.weight" in state_dict
    if has_head and not cfg.tie_embeddings:
        params["lm_head"] = cast_t(jnp.asarray(_np_native(state_dict["lm_head.weight"])))
    elif not cfg.tie_embeddings:
        # tied checkpoint loaded into an untied config: materialize the head
        params["lm_head"] = jnp.asarray(params["embed_tokens"].T)
    return params


def load_hf_llama(
    model_dir: str,
    dtype=None,
    max_context: int = 16384,
    **config_overrides,
):
    """Load an HF Llama checkpoint directory (config.json + *.safetensors or
    pytorch_model.bin) into (params, DuplexLMConfig).

    This is the TPU-side replacement for the reference's GGUF deployment chain
    (prep_test_model.sh:27-34): the trained HF checkpoint loads directly.
    """
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = hf_config_to_lm_config(hf_cfg, max_context=max_context, **config_overrides)

    state_dict: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(model_dir, fname), framework="np") as f:
                for key in f.keys():
                    state_dict[key] = f.get_tensor(key)
    else:
        import torch

        bin_path = os.path.join(model_dir, "pytorch_model.bin")
        state_dict = torch.load(bin_path, map_location="cpu", weights_only=True)
    return lm_params_from_hf(state_dict, cfg, dtype=dtype), cfg


def resize_embeddings(params: Dict, cfg: DuplexLMConfig, new_vocab: int, seed: int = 0):
    """Grow embed_tokens/lm_head to new_vocab rows (mean-init like HF
    resize_token_embeddings; reference train_vanilla_latest.py:585-589).
    Returns (params, cfg) with vocab_size updated."""
    import jax
    import jax.numpy as jnp

    old = params["embed_tokens"]
    if new_vocab < old.shape[0]:
        raise ValueError(f"cannot shrink vocab {old.shape[0]} -> {new_vocab}")
    out = dict(params)
    if new_vocab > old.shape[0]:
        extra = new_vocab - old.shape[0]
        key = jax.random.PRNGKey(seed)
        mean = old.astype(jnp.float32).mean(axis=0)
        noise = jax.random.normal(key, (extra, old.shape[1])) * 0.02
        out["embed_tokens"] = jnp.concatenate(
            [old, (mean + noise).astype(old.dtype)], axis=0
        )
        if "lm_head" in params:
            head = params["lm_head"]
            hmean = head.astype(jnp.float32).mean(axis=1, keepdims=True)
            hnoise = jax.random.normal(jax.random.fold_in(key, 1), (head.shape[0], extra)) * 0.02
            out["lm_head"] = jnp.concatenate(
                [head, (hmean + hnoise).astype(head.dtype)], axis=1
            )
    return out, dataclasses.replace(cfg, vocab_size=new_vocab)


# ---------------------------------------------------------------------------
# MagiCodec torch checkpoint -> models/codec.py pytree
# ---------------------------------------------------------------------------

# Torch module-path prefixes the converter understands, in the layout the
# reference drives (audio_tokenizer.py:189-201): encoder / quantizer / decoder
# with transformer bodies built from flash-attn style blocks (rotary +
# norm + fused dense, magicodec_build.sh:4-16).
_CODEC_KEY_ALIASES = {
    # canonical -> accepted torch names (first match wins)
    "encoder.patch_embed": ("encoder.patch_embed.weight", "encoder.in_proj.weight"),
    "encoder.patch_bias": ("encoder.patch_embed.bias", "encoder.in_proj.bias"),
    "quantizer.codebook": ("quantizer.codebook.weight",),
    "quantizer.proj_w": ("quantizer.codebook_proj.weight",),
    "quantizer.proj_b": ("quantizer.codebook_proj.bias",),
    "decoder.in_proj": ("decoder.in_proj.weight", "decoder.patch_embed.weight"),
    "decoder.in_bias": ("decoder.in_proj.bias", "decoder.patch_embed.bias"),
    "encoder.out_proj": ("encoder.out_proj.weight",),
    "encoder.out_proj_b": ("encoder.out_proj.bias",),
    "decoder.patch_unembed": ("decoder.out_proj.weight", "decoder.patch_unembed.weight"),
    "decoder.patch_unembed_b": ("decoder.out_proj.bias", "decoder.patch_unembed.bias"),
}


def codec_params_from_torch(state_dict: Dict, cfg, return_unused: bool = False):
    """MagiCodec-layout torch state_dict -> models/codec.py param pytree.

    The mapping covers the module surface the reference exercises
    (encoder / quantizer.codebook / quantizer.codebook_proj / decoder,
    reference audio_tokenizer.py:189-201). Transformer bodies are read in
    the flash-attn block convention MagiCodec builds on
    (magicodec_build.sh:13-16): ``blocks.{i}.norm1/norm2`` (LayerNorm,
    biases picked up when present), ``mixer.Wqkv``/``mixer.out_proj``
    (fused QKV split three ways, biases included) and ``mlp.fc1/fc2`` —
    plus unfused ``wq/wk/wv/wo`` and ``attn.{q,k,v,o}_proj`` aliases.
    Torch Linear (out,in) weights transpose to (in,out).

    Raises KeyError naming the first missing tensor so a mismatched
    checkpoint fails loudly instead of silently random-initializing. With
    ``return_unused=True`` also returns the checkpoint keys the map did NOT
    consume — verify_codec_parity.py fails when any parameter tensor is
    left over (a leftover means the key map missed part of the model).
    """
    import jax.numpy as jnp

    dtype = jnp.dtype(cfg.compute_dtype)
    sd = {k: v for k, v in state_dict.items()}
    consumed = set()

    def pick(*names, required=True):
        for n in names:
            if n in sd:
                consumed.add(n)
                return _np(sd[n])
        if required:
            raise KeyError(f"missing codec checkpoint tensor: one of {names}")
        return None

    def alias(canon, required=True):
        return pick(*_CODEC_KEY_ALIASES[canon], required=required)

    def maybe(arr, dt):
        return None if arr is None else jnp.asarray(arr, dt)

    def blocks(prefix: str):
        out = []
        i = 0
        while f"{prefix}.blocks.{i}.attn_norm.weight" in sd or f"{prefix}.blocks.{i}.norm1.weight" in sd:
            b = f"{prefix}.blocks.{i}"
            qkv = pick(f"{b}.mixer.Wqkv.weight", required=False)
            qkv_b = pick(f"{b}.mixer.Wqkv.bias", required=False)
            if qkv is not None:
                h = qkv.shape[1]
                wq, wk, wv = qkv[:h], qkv[h : 2 * h], qkv[2 * h :]
                bq, bk, bv = (
                    (qkv_b[:h], qkv_b[h : 2 * h], qkv_b[2 * h :])
                    if qkv_b is not None
                    else (None, None, None)
                )
            else:
                wq = pick(f"{b}.wq.weight", f"{b}.attn.q_proj.weight")
                wk = pick(f"{b}.wk.weight", f"{b}.attn.k_proj.weight")
                wv = pick(f"{b}.wv.weight", f"{b}.attn.v_proj.weight")
                bq = pick(f"{b}.wq.bias", f"{b}.attn.q_proj.bias", required=False)
                bk = pick(f"{b}.wk.bias", f"{b}.attn.k_proj.bias", required=False)
                bv = pick(f"{b}.wv.bias", f"{b}.attn.v_proj.bias", required=False)
            blk = {
                "attn_norm": jnp.asarray(
                    pick(f"{b}.attn_norm.weight", f"{b}.norm1.weight"), dtype
                ),
                "attn_norm_b": maybe(
                    pick(f"{b}.attn_norm.bias", f"{b}.norm1.bias", required=False), dtype
                ),
                "wq": jnp.asarray(wq.T, dtype),
                "wk": jnp.asarray(wk.T, dtype),
                "wv": jnp.asarray(wv.T, dtype),
                "bq": maybe(bq, dtype),
                "bk": maybe(bk, dtype),
                "bv": maybe(bv, dtype),
                "wo": jnp.asarray(
                    pick(f"{b}.wo.weight", f"{b}.attn.o_proj.weight", f"{b}.mixer.out_proj.weight").T,
                    dtype,
                ),
                "bo": maybe(
                    pick(
                        f"{b}.wo.bias", f"{b}.attn.o_proj.bias",
                        f"{b}.mixer.out_proj.bias", required=False,
                    ),
                    dtype,
                ),
                "mlp_norm": jnp.asarray(
                    pick(f"{b}.mlp_norm.weight", f"{b}.norm2.weight"), dtype
                ),
                "mlp_norm_b": maybe(
                    pick(f"{b}.mlp_norm.bias", f"{b}.norm2.bias", required=False), dtype
                ),
                "w1": jnp.asarray(pick(f"{b}.w1.weight", f"{b}.mlp.fc1.weight").T, dtype),
                "b1": jnp.asarray(pick(f"{b}.b1", f"{b}.mlp.fc1.bias"), dtype),
                "w2": jnp.asarray(pick(f"{b}.w2.weight", f"{b}.mlp.fc2.weight").T, dtype),
                "b2": jnp.asarray(pick(f"{b}.b2", f"{b}.mlp.fc2.bias"), dtype),
            }
            out.append({k: v for k, v in blk.items() if v is not None})
            i += 1
        if not out:
            raise KeyError(f"no transformer blocks found under {prefix}.blocks")
        return out

    def conv_stages(prefix: str, transpose_conv: bool):
        """Conv1d stacks: torch Conv1d weight (out,in,k) -> (k,in,out).
        ConvTranspose1d weight (in,out,k) -> (k,in,out) with the spatial axis
        REVERSED: torch's ConvTranspose is the gradient-derived transpose,
        while lax.conv_transpose(transpose_kernel=False) is a plain
        fractionally-strided correlation — the two agree only with the kernel
        spatially flipped (asserted against torch in tests/test_codec.py).
        Parity is exact for even stride ratios; odd ratios can differ at
        chunk boundaries by the padding convention."""
        out = []
        i = 0
        while f"{prefix}.conv.stages.{i}.weight" in sd or f"{prefix}.down.{i}.weight" in sd or f"{prefix}.up.{i}.weight" in sd:
            w = pick(
                f"{prefix}.conv.stages.{i}.weight",
                f"{prefix}.down.{i}.weight",
                f"{prefix}.up.{i}.weight",
            )
            b = pick(
                f"{prefix}.conv.stages.{i}.bias",
                f"{prefix}.down.{i}.bias",
                f"{prefix}.up.{i}.bias",
            )
            if transpose_conv:
                w = np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])
            else:
                w = w.transpose(2, 1, 0)
            out.append({"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)})
            i += 1
        if not out:
            raise KeyError(f"no conv stages found under {prefix}")
        return out

    conv_front = getattr(cfg, "frontend", "patchify") == "conv"
    encoder = {
        "blocks": blocks("encoder"),
        "out_norm": jnp.asarray(
            pick("encoder.out_norm.weight", "encoder.norm_f.weight"), dtype
        ),
        "out_norm_b": maybe(
            pick("encoder.out_norm.bias", "encoder.norm_f.bias", required=False), dtype
        ),
        "out_proj": jnp.asarray(alias("encoder.out_proj").T, dtype),
        "out_proj_b": maybe(alias("encoder.out_proj_b", required=False), dtype),
    }
    in_proj = alias("decoder.in_proj")
    in_bias = alias("decoder.in_bias", required=False)
    decoder = {
        "in_proj": jnp.asarray(in_proj.T, dtype),
        "in_bias": jnp.asarray(
            in_bias if in_bias is not None else np.zeros(in_proj.shape[0]), dtype
        ),
        "blocks": blocks("decoder"),
        "out_norm": jnp.asarray(
            pick("decoder.out_norm.weight", "decoder.norm_f.weight"), dtype
        ),
        "out_norm_b": maybe(
            pick("decoder.out_norm.bias", "decoder.norm_f.bias", required=False), dtype
        ),
    }
    if conv_front:
        encoder["conv"] = {"stages": conv_stages("encoder", transpose_conv=False)}
        decoder["conv"] = {"stages": conv_stages("decoder", transpose_conv=True)}
    else:
        pe = alias("encoder.patch_embed")
        pb = alias("encoder.patch_bias", required=False)
        encoder["patch_embed"] = jnp.asarray(pe.T, dtype)
        encoder["patch_bias"] = jnp.asarray(
            pb if pb is not None else np.zeros(pe.shape[0]), dtype
        )
        decoder["patch_unembed"] = jnp.asarray(alias("decoder.patch_unembed").T, dtype)
        decoder["patch_unembed_b"] = maybe(
            alias("decoder.patch_unembed_b", required=False), jnp.float32
        )
    encoder = {k: v for k, v in encoder.items() if v is not None}
    decoder = {k: v for k, v in decoder.items() if v is not None}
    params = {
        "encoder": encoder,
        "quantizer": {
            "codebook": jnp.asarray(alias("quantizer.codebook"), jnp.float32),
            "proj_w": jnp.asarray(alias("quantizer.proj_w").T, jnp.float32),
            "proj_b": jnp.asarray(alias("quantizer.proj_b"), jnp.float32),
        },
        "decoder": decoder,
    }
    if return_unused:
        unused = sorted(k for k in sd.keys() if k not in consumed)
        return params, unused
    return params


# ---------------------------------------------------------------------------
# Codec checkpoint save/load (framework-native .npz)
# ---------------------------------------------------------------------------

def save_codec_checkpoint(path: str, params: Dict, cfg) -> None:
    """Save codec params + config as a single .npz (portable, no orbax dir)."""
    import jax

    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}{i}.")
        else:
            arr = np.asarray(jax.device_get(tree))
            if arr.dtype not in (np.float32, np.int32, np.int64):
                arr = arr.astype(np.float32)  # npz can't hold bfloat16
            flat[prefix[:-1]] = arr

    walk(params, "")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, __config__=json.dumps(dataclasses.asdict(cfg)), **flat)


def load_codec_checkpoint(path: str):
    """Load a codec .npz checkpoint -> (params pytree, CodecConfig)."""
    import jax.numpy as jnp

    from .codec import CodecConfig

    data = np.load(path, allow_pickle=False)
    cfg_kwargs = json.loads(str(data["__config__"]))
    if "conv_ratios" in cfg_kwargs:
        cfg_kwargs["conv_ratios"] = tuple(cfg_kwargs["conv_ratios"])
    cfg = CodecConfig(**cfg_kwargs)
    dtype = jnp.dtype(cfg.compute_dtype)

    params: Dict = {}
    for key in data.files:
        if key == "__config__":
            continue
        parts = key.split(".")
        node = params
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if p.isdigit():
                p = int(p)
            default = [] if nxt.isdigit() else {}
            if isinstance(node, list):
                while len(node) <= p:
                    node.append([] if nxt.isdigit() else {})
                node = node[p]
            else:
                node = node.setdefault(p, default)
        leaf = parts[-1]
        arr = data[key]
        # quantizer tensors stay f32 (argmax-critical); the transformer bodies
        # take the config compute dtype
        want = jnp.float32 if key.startswith("quantizer") else dtype
        val = jnp.asarray(arr, jnp.int32 if arr.dtype in (np.int32, np.int64) else want)
        if isinstance(node, list):
            idx = int(leaf)
            while len(node) <= idx:
                node.append(None)
            node[idx] = val
        else:
            node[leaf] = val
    return params, cfg
