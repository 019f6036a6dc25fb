"""Real-weight interop tests.

The HF Llama converter is verified NUMERICALLY against transformers' own
torch LlamaForCausalLM (installed in the image): convert a tiny random HF
checkpoint and require logits to match. This proves the layout map + model
graph (incl. llama3 rope scaling, GQA, RMSNorm, SwiGLU) are exact, so a real
Llama-3.2-1B checkpoint imports correctly. The MagiCodec converter is
verified as a layout round-trip (no torch MagiCodec exists in-image).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_codec_agent_tpu.models import codec as codec_lib
from realtime_codec_agent_tpu.models import convert, llama

torch = pytest.importorskip("torch")


def _tiny_hf_llama(tie=False, rope_llama3=True, seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    rope_scaling = (
        {
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        }
        if rope_llama3
        else None
    )
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=500000.0,
        rms_norm_eps=1e-5,
        max_position_embeddings=256,
        tie_word_embeddings=tie,
        rope_scaling=rope_scaling,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model, hf_cfg


@pytest.mark.parametrize("tie", [False, True])
def test_hf_llama_logits_parity(tie):
    model, hf_cfg = _tiny_hf_llama(tie=tie)
    cfg = convert.hf_config_to_lm_config(hf_cfg.to_dict(), max_context=256)
    assert cfg.tie_embeddings == tie
    assert cfg.rope_scaling is not None and cfg.rope_scaling[0] == 32.0
    params = convert.lm_params_from_hf(
        model.state_dict(), cfg, dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(1, 24))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    hidden, _ = llama.forward(params, jnp.asarray(ids), cfg32)
    ours = np.asarray(llama.logits_from_hidden(params, hidden, cfg32))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    # same argmax everywhere (token-exact greedy decode)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()


def test_hf_llama_kv_cache_matches_full_forward():
    """Converted weights through the incremental decode path must match the
    full causal forward (exercises rope positions with scaling + cache)."""
    model, hf_cfg = _tiny_hf_llama()
    cfg = convert.hf_config_to_lm_config(
        hf_cfg.to_dict(), max_context=64, compute_dtype="float32"
    )
    params = convert.lm_params_from_hf(model.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 10)))
    full_hidden, _ = llama.forward(params, ids, cfg)

    k = jnp.zeros((cfg.num_layers, 1, 64, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    v = jnp.zeros_like(k)
    h1, (k, v) = llama.forward(params, ids[:, :6], cfg, kv_cache=(k, v), cache_offset=jnp.int32(0))
    h2, _ = llama.forward(params, ids[:, 6:], cfg, kv_cache=(k, v), cache_offset=jnp.int32(6))
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full_hidden[:, 6:]), rtol=1e-4, atol=1e-4)


def test_resize_embeddings():
    model, hf_cfg = _tiny_hf_llama()
    cfg = convert.hf_config_to_lm_config(hf_cfg.to_dict(), max_context=64)
    params = convert.lm_params_from_hf(model.state_dict(), cfg)
    params2, cfg2 = convert.resize_embeddings(params, cfg, 200)
    assert cfg2.vocab_size == 200
    assert params2["embed_tokens"].shape == (200, cfg.hidden_size)
    assert params2["lm_head"].shape == (cfg.hidden_size, 200)
    # original rows untouched
    np.testing.assert_array_equal(
        np.asarray(params2["embed_tokens"][:128]), np.asarray(params["embed_tokens"])
    )
    with pytest.raises(ValueError):
        convert.resize_embeddings(params, cfg, 64)


def _codec_state_dict_from_params(params):
    """Build the torch-layout state_dict equivalent of a codec pytree
    (inverse of codec_params_from_torch) for round-trip testing."""
    sd = {}
    t = lambda a: torch.tensor(np.asarray(a, dtype=np.float32))

    def body(prefix, tree):
        sd[f"{prefix}.out_norm.weight"] = t(tree["out_norm"])
        for i, b in enumerate(tree["blocks"]):
            p = f"{prefix}.blocks.{i}"
            sd[f"{p}.attn_norm.weight"] = t(b["attn_norm"])
            sd[f"{p}.mlp_norm.weight"] = t(b["mlp_norm"])
            for name in ("wq", "wk", "wv", "wo", "w1", "w2"):
                sd[f"{p}.{name}.weight"] = t(np.asarray(b[name], np.float32).T)
            sd[f"{p}.b1"] = t(b["b1"])
            sd[f"{p}.b2"] = t(b["b2"])

    enc, dec, q = params["encoder"], params["decoder"], params["quantizer"]
    sd["encoder.patch_embed.weight"] = t(np.asarray(enc["patch_embed"], np.float32).T)
    sd["encoder.patch_embed.bias"] = t(enc["patch_bias"])
    sd["encoder.out_proj.weight"] = t(np.asarray(enc["out_proj"], np.float32).T)
    body("encoder", enc)
    sd["quantizer.codebook.weight"] = t(q["codebook"])
    sd["quantizer.codebook_proj.weight"] = t(np.asarray(q["proj_w"], np.float32).T)
    sd["quantizer.codebook_proj.bias"] = t(q["proj_b"])
    sd["decoder.in_proj.weight"] = t(np.asarray(dec["in_proj"], np.float32).T)
    sd["decoder.in_proj.bias"] = t(dec["in_bias"])
    sd["decoder.out_proj.weight"] = t(np.asarray(dec["patch_unembed"], np.float32).T)
    body("decoder", dec)
    return sd


def test_codec_torch_roundtrip():
    cfg = codec_lib.tiny_codec_config(compute_dtype="float32")
    params = codec_lib.init_codec_params(jax.random.PRNGKey(0), cfg)
    sd = _codec_state_dict_from_params(params)
    back = convert.codec_params_from_torch(sd, cfg)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6)

    # converted params actually run and match the original encode
    audio = np.random.default_rng(0).normal(size=(1, 3200)).astype(np.float32) * 0.1
    codes_a = codec_lib.JaxCodecModel(params, cfg).encode(audio)
    codes_b = codec_lib.JaxCodecModel(back, cfg).encode(audio)
    np.testing.assert_array_equal(codes_a, codes_b)


def test_codec_converter_missing_key_raises():
    cfg = codec_lib.tiny_codec_config()
    params = codec_lib.init_codec_params(jax.random.PRNGKey(0), cfg)
    sd = _codec_state_dict_from_params(params)
    del sd["quantizer.codebook.weight"]
    with pytest.raises(KeyError, match="quantizer.codebook"):
        convert.codec_params_from_torch(sd, cfg)


def test_codec_npz_checkpoint_roundtrip(tmp_path):
    cfg = codec_lib.tiny_codec_config()
    params = codec_lib.init_codec_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "codec.npz")
    convert.save_codec_checkpoint(path, params, cfg)
    params2, cfg2 = convert.load_codec_checkpoint(path)
    assert cfg2 == cfg

    audio = np.random.default_rng(0).normal(size=(1, 3200)).astype(np.float32) * 0.1
    codes_a = codec_lib.JaxCodecModel(params, cfg).encode(audio)
    codes_b = codec_lib.JaxCodecModel(params2, cfg2).encode(audio)
    np.testing.assert_array_equal(codes_a, codes_b)
    # quantizer precision preserved exactly (f32 path)
    np.testing.assert_array_equal(
        np.asarray(params["quantizer"]["codebook"]),
        np.asarray(params2["quantizer"]["codebook"]),
    )


def test_audio_tokenizer_loads_checkpoint_path(tmp_path):
    """AudioTokenizer(codec_model=str) actually loads the checkpoint (the
    string path used to silently random-init)."""
    from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer

    cfg = codec_lib.tiny_codec_config()
    params = codec_lib.init_codec_params(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "codec.npz")
    convert.save_codec_checkpoint(path, params, cfg)

    tok = AudioTokenizer(codec_model=path)
    ref = AudioTokenizer(codec_model=codec_lib.JaxCodecModel(params, cfg))
    audio = np.random.default_rng(0).normal(size=4800).astype(np.float32) * 0.1
    assert tok.tokenize_audio(audio) == ref.tokenize_audio(audio)

    with pytest.raises(FileNotFoundError):
        AudioTokenizer(codec_model=str(tmp_path / "nope.npz"))


def test_forward_decode_matches_full_forward():
    """The read-only-cache decode path (forward_decode + commit) must match
    the full causal forward — incl. chained small-buffer steps as the fused
    chunk scan uses them."""
    from realtime_codec_agent_tpu.models.llama import (
        commit_kv, commit_kv_scatter, forward, forward_decode,
    )

    cfg = llama.tiny_lm_config(vocab_size=97, compute_dtype="float32", max_context=64)
    params = llama.init_lm_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 97, size=(1, 12)))

    full_hidden, _ = llama.forward(params, ids, cfg)

    S = 32
    k = jnp.zeros((cfg.num_layers, 1, S, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    v = jnp.zeros_like(k)

    # prefill 6 tokens contiguously
    h, nk, nv = forward_decode(params, ids[:, :6], cfg, k, v, jnp.arange(6))
    k, v = commit_kv(k, v, nk, nv, 0)
    np.testing.assert_allclose(np.asarray(h), np.asarray(full_hidden[:, :6]), rtol=1e-4, atol=1e-5)

    # then 3 chained pair-steps through a small side buffer (scan pattern)
    small_k = jnp.zeros((cfg.num_layers, 1, 6, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    small_v = jnp.zeros_like(small_k)
    small_pos = jnp.full((6,), 2**30, jnp.int32)
    outs = []
    for i in range(3):
        pos = jnp.asarray([6 + 2 * i, 7 + 2 * i])
        h, nk, nv = forward_decode(
            params, ids[:, 6 + 2 * i : 8 + 2 * i], cfg, k, v, pos,
            cache_valid=jnp.int32(6), extra_kv=(small_k, small_v), extra_pos=small_pos,
        )
        small_k = jax.lax.dynamic_update_slice(small_k, nk, (0, 0, 2 * i, 0, 0))
        small_v = jax.lax.dynamic_update_slice(small_v, nv, (0, 0, 2 * i, 0, 0))
        small_pos = jax.lax.dynamic_update_slice(small_pos, pos, (2 * i,))
        outs.append(np.asarray(h))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full_hidden[:, 6:12]), rtol=1e-4, atol=1e-5)

    # scatter-commit then read back through a plain decode step
    k, v = commit_kv_scatter(k, v, small_k, small_v, jnp.arange(6, 12))
    h, _, _ = forward_decode(params, ids[:, 11:12], cfg, k, v, jnp.asarray([11]))
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(full_hidden[:, 11:12]), rtol=1e-4, atol=1e-5
    )


def test_forward_decode_flash_prefill_matches_full_forward():
    """T>8 prefill takes the flash (online-softmax key-block) path — must
    match the one-shot small-T path and the full causal forward."""
    from realtime_codec_agent_tpu.models.llama import commit_kv, forward_decode

    cfg = llama.tiny_lm_config(vocab_size=97, compute_dtype="float32", max_context=128)
    params = llama.init_lm_params(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 97, size=(1, 40)))

    full_hidden, _ = llama.forward(params, ids, cfg)

    S = 64
    k = jnp.zeros((cfg.num_layers, 1, S, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    v = jnp.zeros_like(k)
    # prefill 8 (one-shot path), then 32 (flash path) on top of the cache
    h1, nk, nv = forward_decode(params, ids[:, :8], cfg, k, v, jnp.arange(8))
    k, v = commit_kv(k, v, nk, nv, 0)
    h2, nk, nv = forward_decode(params, ids[:, 8:40], cfg, k, v, jnp.arange(8, 40))
    got = np.concatenate([np.asarray(h1), np.asarray(h2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full_hidden), rtol=2e-4, atol=1e-5)


def test_forward_flash_causal_matches_attention():
    """T>512 full-causal forward takes flash_causal_attention — must match
    the incremental (verified) decode path, including padding masks."""
    from realtime_codec_agent_tpu.models.llama import commit_kv, forward_decode

    cfg = llama.tiny_lm_config(vocab_size=97, compute_dtype="float32", max_context=768)
    params = llama.init_lm_params(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(6)
    T = 600
    ids = jnp.asarray(rng.integers(0, 97, size=(1, T)))

    flash_hidden, _ = llama.forward(params, ids, cfg)  # flash path (T>512)

    S = 768
    k = jnp.zeros((cfg.num_layers, 1, S, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    v = jnp.zeros_like(k)
    h1, nk, nv = forward_decode(params, ids[:, :300], cfg, k, v, jnp.arange(300))
    k, v = commit_kv(k, v, nk, nv, 0)
    h2, _, _ = forward_decode(params, ids[:, 300:], cfg, k, v, jnp.arange(300, T))
    got = np.concatenate([np.asarray(h1), np.asarray(h2)], axis=1)
    np.testing.assert_allclose(np.asarray(flash_hidden), got, rtol=3e-4, atol=3e-5)

    # padding mask: padded batch rows must not change the valid prefix
    pad_ids = jnp.concatenate([ids, jnp.zeros((1, 100), jnp.int32)], axis=1)
    valid = jnp.concatenate(
        [jnp.ones((1, T), jnp.int32), jnp.zeros((1, 100), jnp.int32)], axis=1
    )
    padded_hidden, _ = llama.forward(params, pad_ids, cfg, attn_mask=valid)
    np.testing.assert_allclose(
        np.asarray(padded_hidden[:, :T]), np.asarray(flash_hidden), rtol=3e-4, atol=3e-5
    )
