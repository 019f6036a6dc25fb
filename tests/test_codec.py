"""Codec + streaming AudioTokenizer tests (tiny config, virtual CPU devices).

Mirrors the reference's de-facto codec checks: run_stream_codes.py round-trip
and the chunk-vs-full streaming equivalence the 2 s rolling context exists for
(reference audio_tokenizer.py:44-46, 72-74, 111-113).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
from realtime_codec_agent_tpu.models.codec import (
    JaxCodecModel,
    tiny_codec_config,
)
from realtime_codec_agent_tpu.ops.quantize import nearest_code_xla


@pytest.fixture(scope="module")
def codec():
    return JaxCodecModel.random_init(tiny_codec_config(), seed=0)


@pytest.fixture(scope="module")
def tokenizer(codec):
    return AudioTokenizer(codec_model=codec)


def test_framerate_is_50hz(tokenizer):
    assert tokenizer.framerate == 50.0
    assert tokenizer.sampling_rate == 16000
    assert tokenizer.context_samples == 32000
    assert tokenizer.context_frames == 100


def test_encode_shapes(codec):
    audio = np.random.default_rng(0).normal(size=(1, 16000)).astype(np.float32)
    codes = codec.encode(audio)
    assert codes.shape == (1, 50)
    assert codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < codec.codebook_size).all()


def test_encode_pads_to_hop(codec):
    audio = np.zeros((1, 16000 + 100), dtype=np.float32)
    codes = codec.encode(audio)
    assert codes.shape == (1, 51)  # ceil(16100/320)


def test_decode_shapes(codec):
    codes = np.zeros((1, 50), dtype=np.int32)
    audio = codec.decode(codes)
    assert audio.shape == (1, 16000)


def test_encode_decode_roundtrip_runs(tokenizer):
    rng = np.random.default_rng(1)
    audio = rng.normal(size=8000).astype(np.float32) * 0.1
    s = tokenizer.tokenize_audio(audio)
    assert len(s) == 25  # 0.5 s at 50 Hz mono
    (sr, out), hanging, preroll = tokenizer.detokenize_audio(s)
    assert sr == 16000 and out.shape[-1] == 8000 and hanging == ""


def test_streaming_matches_manual_windows(codec):
    """The rolling-context streaming logic must be *exactly* equivalent to
    encoding an explicit max(chunk, 2 s) trailing window per chunk
    (reference audio_tokenizer.py:72-74, 98-101). This pins the streaming
    bookkeeping independent of codec training state."""
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=16000 * 3) * 0.1).astype(np.float32)
    chunk = 3200  # 0.2 s
    ctx = 32000

    tok = AudioTokenizer(codec_model=codec, fixed_context=False)
    from realtime_codec_agent_tpu.units.codes import chars_to_codes

    for start in range(0, len(audio), chunk):
        c = audio[start : start + chunk]
        streamed = tok.tokenize_audio(c)
        end = start + chunk
        window = audio[max(0, end - max(chunk, ctx)) : end]
        manual_codes = codec.encode(window[None, :])[0][-(chunk // 320) :]
        streamed_codes = chars_to_codes(streamed, 1, codec.codebook_size)[0]
        np.testing.assert_array_equal(streamed_codes, manual_codes)


def test_fixed_context_matches_zero_prefixed_windows(codec):
    """Fixed-context mode == encoding a zeros-prefixed (silence-preceded)
    trailing window: the TPU-first static-shape design invariant."""
    rng = np.random.default_rng(6)
    audio = (rng.normal(size=16000) * 0.1).astype(np.float32)
    chunk = 3200
    ctx = 32000

    tok = AudioTokenizer(codec_model=codec, fixed_context=True)
    from realtime_codec_agent_tpu.units.codes import chars_to_codes

    padded = np.concatenate([np.zeros(ctx, dtype=np.float32), audio])
    for start in range(0, len(audio), chunk):
        c = audio[start : start + chunk]
        streamed = tok.tokenize_audio(c)
        end = ctx + start + chunk
        window = padded[end - ctx : end]
        manual_codes = codec.encode(window[None, :])[0][-(chunk // 320) :]
        streamed_codes = chars_to_codes(streamed, 1, codec.codebook_size)[0]
        np.testing.assert_array_equal(streamed_codes, manual_codes)


def test_fixed_context_stationary_after_warmup(codec):
    """Fixed-context mode must produce identical tokens to legacy growing-context
    mode for chunks after the context window is saturated."""
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=16000 * 3) * 0.1).astype(np.float32)
    chunk = 8000  # 0.5 s -> context saturated after 4 chunks

    tok_fixed = AudioTokenizer(codec_model=codec, fixed_context=True)
    tok_legacy = AudioTokenizer(codec_model=codec, fixed_context=False)
    out_fixed, out_legacy = [], []
    for start in range(0, len(audio), chunk):
        c = audio[start : start + chunk]
        out_fixed.append(tok_fixed.tokenize_audio(c))
        out_legacy.append(tok_legacy.tokenize_audio(c))
    # chunks after 2 s of context: identical
    assert out_fixed[4:] == out_legacy[4:]


def test_stereo_interleaving(codec):
    tok = AudioTokenizer(codec_model=codec, num_channels=2)
    audio = np.zeros((2, 3200), dtype=np.float32)
    s = tok.tokenize_audio(audio)
    assert len(s) == 20  # 0.2 s * 50 Hz * 2 channels
    (sr, out), hanging, _ = tok.detokenize_audio(s)
    assert out.shape == (2, 3200)


def test_detokenize_hanging_code(tokenizer):
    tok = AudioTokenizer(codec_model=tokenizer.codec_model, num_channels=2)
    s = tok.tokenize_audio(np.zeros((2, 3200), dtype=np.float32))
    (sr, out), hanging, _ = tok.detokenize_audio(s[:-1])  # odd length
    # reference quirk: end_hanging is tail of trimmed string
    assert len(hanging) == 1


def test_preroll_samples(tokenizer):
    tok = AudioTokenizer(codec_model=tokenizer.codec_model)
    s = tok.tokenize_audio(np.zeros(1600, dtype=np.float32))
    (_, out), _, preroll = tok.detokenize_audio(s, preroll_samples=320)
    assert out.shape[-1] == 1600 + 320
    assert preroll == 320


def test_nearest_code_xla_correctness():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(17, 16)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(257, 16)).astype(np.float32))
    idx = nearest_code_xla(x, cb)
    dists = ((np.asarray(x)[:, None, :] - np.asarray(cb)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), dists.argmin(axis=1))


def test_nearest_code_pallas_interpret_matches_xla():
    """Pallas kernel logic parity via interpreter mode on CPU."""
    from realtime_codec_agent_tpu.ops import quantize as q

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float32))
    idx_pallas = q.nearest_code_pallas(x, cb, block_v=128, interpret=True)
    idx_xla = q.nearest_code_xla(x, cb)
    np.testing.assert_array_equal(np.asarray(idx_pallas), np.asarray(idx_xla))


def test_codec_embeddings_shape(tokenizer):
    emb = tokenizer.get_codec_embeddings()
    assert emb.shape == (tokenizer.codebook_size, 16)
    assert emb.dtype == np.float32


class TestConvFrontend:
    """MagiCodec/Encodec-style strided-conv front-end (frontend="conv")."""

    def _cfg(self):
        from realtime_codec_agent_tpu.models.codec import tiny_codec_config

        return tiny_codec_config(frontend="conv", conv_ratios=(8, 5, 4, 2), conv_base_channels=8)

    def test_shapes_and_roundtrip(self):
        import jax
        import numpy as np

        from realtime_codec_agent_tpu.models.codec import JaxCodecModel

        cfg = self._cfg()
        assert np.prod(cfg.conv_ratios) == cfg.hop_length
        model = JaxCodecModel.random_init(cfg, seed=0)
        audio = (0.1 * np.random.default_rng(0).normal(size=(1, 6400))).astype(np.float32)
        codes = model.encode(audio)
        assert codes.shape == (1, 20)  # 6400 / 320
        recon = model.decode(codes)
        assert recon.shape == (1, 6400)
        assert np.isfinite(recon).all()

    def test_streaming_tokenizer_over_conv_codec(self):
        import numpy as np

        from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
        from realtime_codec_agent_tpu.models.codec import JaxCodecModel

        model = JaxCodecModel.random_init(self._cfg(), seed=1)
        at = AudioTokenizer(codec_model=model)
        audio = (0.1 * np.random.default_rng(1).normal(size=4800)).astype(np.float32)
        s = at.tokenize_audio(audio)
        assert len(s) == 15
        (sr, out), _, _ = at.detokenize_audio(s)
        assert sr == model.sample_rate

    def test_conv_converter_roundtrip(self, tmp_path):
        import jax
        import numpy as np

        from realtime_codec_agent_tpu.models import convert
        from realtime_codec_agent_tpu.models.codec import JaxCodecModel, init_codec_params

        cfg = self._cfg()
        params = init_codec_params(jax.random.PRNGKey(2), cfg)
        # npz checkpoint round trip covers the conv stage lists
        path = str(tmp_path / "codec.npz")
        convert.save_codec_checkpoint(path, params, cfg)
        params2, cfg2 = convert.load_codec_checkpoint(path)
        assert cfg2 == cfg
        audio = (0.1 * np.random.default_rng(2).normal(size=(1, 3200))).astype(np.float32)
        np.testing.assert_array_equal(
            JaxCodecModel(params, cfg).encode(audio), JaxCodecModel(params2, cfg2).encode(audio)
        )

        # torch state_dict layout round trip (Conv1d / ConvTranspose1d shapes)
        import torch

        sd = {}
        t = lambda a: torch.tensor(np.asarray(a, np.float32))
        for prefix, tree, tconv in (("encoder", params["encoder"], False),
                                    ("decoder", params["decoder"], True)):
            for i, st in enumerate(tree["conv"]["stages"]):
                w = np.asarray(st["w"], np.float32)
                # ours (k,in,out) -> torch Conv1d (out,in,k); ConvTranspose1d
                # (in,out,k) additionally un-flips the spatial axis
                sd[f"{prefix}.conv.stages.{i}.weight"] = t(
                    np.ascontiguousarray(w[::-1].transpose(1, 2, 0))
                    if tconv
                    else w.transpose(2, 1, 0)
                )
                sd[f"{prefix}.conv.stages.{i}.bias"] = t(st["b"])
            sd[f"{prefix}.out_norm.weight" if prefix == "encoder" else f"{prefix}.out_norm.weight"] = t(tree["out_norm"])
            for j, b in enumerate(tree["blocks"]):
                p = f"{prefix}.blocks.{j}"
                sd[f"{p}.attn_norm.weight"] = t(b["attn_norm"])
                sd[f"{p}.mlp_norm.weight"] = t(b["mlp_norm"])
                for name in ("wq", "wk", "wv", "wo", "w1", "w2"):
                    sd[f"{p}.{name}.weight"] = t(np.asarray(b[name], np.float32).T)
                sd[f"{p}.b1"] = t(b["b1"])
                sd[f"{p}.b2"] = t(b["b2"])
        sd["encoder.out_proj.weight"] = t(np.asarray(params["encoder"]["out_proj"], np.float32).T)
        sd["quantizer.codebook.weight"] = t(params["quantizer"]["codebook"])
        sd["quantizer.codebook_proj.weight"] = t(np.asarray(params["quantizer"]["proj_w"], np.float32).T)
        sd["quantizer.codebook_proj.bias"] = t(params["quantizer"]["proj_b"])
        sd["decoder.in_proj.weight"] = t(np.asarray(params["decoder"]["in_proj"], np.float32).T)
        sd["decoder.in_proj.bias"] = t(params["decoder"]["in_bias"])
        back = convert.codec_params_from_torch(sd, cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-2, atol=1e-3
            )

    def test_conv_ops_match_torch_semantics(self):
        """The converter's layout map must make our lax conv ops numerically
        reproduce torch's Conv1d / ConvTranspose1d — the operational contract
        for importing real conv-front-end checkpoints (even stride ratios)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import torch

        from realtime_codec_agent_tpu.models.codec import _conv_downsample, _conv_upsample

        rng = np.random.default_rng(3)
        cin, cout, r = 2, 6, 4
        k = 2 * r
        T = 16

        # --- downsample vs torch Conv1d (stride r, SAME padding) ---
        x = rng.normal(size=(1, cin, T * r)).astype(np.float32)
        w_conv = rng.normal(size=(cout, cin, k)).astype(np.float32) * 0.2
        b_conv = rng.normal(size=(cout,)).astype(np.float32)
        # jax SAME for stride r, kernel k on length T*r: pad total k - r
        lo = (k - r) // 2
        hi = (k - r) - lo
        y_t = torch.nn.functional.conv1d(
            torch.nn.functional.pad(torch.tensor(x), (lo, hi)),
            torch.tensor(w_conv), torch.tensor(b_conv), stride=r,
        ).numpy()
        stage = {"w": jnp.asarray(w_conv.transpose(2, 1, 0)), "b": jnp.asarray(b_conv)}
        y_j = np.asarray(
            _conv_downsample([stage], jnp.asarray(x.transpose(0, 2, 1)), (r,))
        ).transpose(0, 2, 1)
        np.testing.assert_allclose(y_j, y_t, rtol=2e-2, atol=2e-2)

        # --- upsample vs torch ConvTranspose1d (stride r, padding r/2) ---
        z = rng.normal(size=(1, cout, T)).astype(np.float32)
        w_tr = rng.normal(size=(cout, cin, k)).astype(np.float32) * 0.2
        b_tr = rng.normal(size=(cin,)).astype(np.float32)
        y_t = torch.nn.functional.conv_transpose1d(
            torch.tensor(z), torch.tensor(w_tr), torch.tensor(b_tr),
            stride=r, padding=r // 2,
        ).numpy()
        stage = {
            "w": jnp.asarray(np.ascontiguousarray(w_tr.transpose(2, 0, 1)[::-1])),
            "b": jnp.asarray(b_tr),
        }
        y_j = np.asarray(
            _conv_upsample([stage], jnp.asarray(z.transpose(0, 2, 1)), (r,))
        ).transpose(0, 2, 1)
        assert y_j.shape == y_t.shape
        np.testing.assert_allclose(y_j, y_t, rtol=2e-2, atol=2e-2)
