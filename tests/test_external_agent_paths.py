"""Agent-level integration of the external-service paths VERDICT r1 flagged
as unexercised: the external-LLM sentence-coordinated response generation
(reference realtime_agent_v2.py:222-254) and the external-TTS substitution
with interrupt scoring (:374-397), each against an in-process server."""
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer
from tests.fakes import FakeLMEngine, FakeResources
from tests.test_serving import _FakeOpenAIHandler


@pytest.fixture(scope="module")
def codec():
    return JaxCodecModel.random_init(tiny_codec_config(), seed=0)


@pytest.fixture(scope="module")
def text_tok(codec):
    return CodecTextTokenizer(codebook_size=codec.codebook_size)


def chunk_audio():
    return np.zeros(1600, dtype=np.float32)


def test_external_llm_coordinated_response(codec, text_tok):
    """Response event with use_external_llm: the native LM's content tokens
    are suppressed (constrained), the external LLM's sentences are spliced
    in as marked external ranges, and the transcript records the response."""
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAIHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        fake = FakeLMEngine(default_token=text_tok.codec_vocab_start + 7)
        resources = FakeResources(AudioTokenizer(codec_model=codec), text_tok, fake)
        config = RealtimeAgentConfig(
            use_whisper=False,
            agent_opening_text=None,
            force_trans_after_inactivity_secs=0.0,
            force_response_after_inactivity_secs=0.0,
            use_external_llm=True,
            external_llm_base_url=f"http://127.0.0.1:{httpd.server_address[1]}/v1",
            external_llm_model="fake-model",
            external_llm_api_key="k",
        )
        agent = RealtimeAgent(resources=resources, config=config)

        agent_sp = text_tok.encode(" A", add_special_tokens=False)[0]
        end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
        start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
        audio_tok = text_tok.codec_vocab_start + 21
        colon = text_tok.encode(":", add_special_tokens=False)
        content = text_tok.encode(" x", add_special_tokens=False)

        # the speculative speaker probe must point at the AGENT, else the
        # coordinated path defers to the user (realtime_agent_v2.py:503)
        fake.speaker_probs = (0.9, 0.1)
        agent.process_audio(chunk_audio())  # enter audio mode
        # response event: end_audio -> agent speaker -> ":" -> native content
        # (constrained: dropped) -> coordinated external sentences -> the
        # native closes each splice; final <|audio|> returns to audio mode
        fake.script = (
            [audio_tok, end_audio, agent_sp]
            + colon + content          # native content token gets stop-dropped
            + [start_audio]            # close after sentence 1
            + [audio_tok] * 4
        )
        out = agent.process_audio(chunk_audio())
        assert out.shape == (1600,)

        assert len(agent.transcript) == 1
        entry = agent.transcript[0]
        assert entry["speaker"] == "A"
        assert "hello there" in entry["text"]
        # the external words are marked as external ranges
        assert entry["text_with_external_markers"].count(config.external_marker_token) >= 2
        seq = agent.get_sequence_str()
        assert "hello there" in seq
        # messages sent to the external LLM are inspectable (client state)
        msgs = agent.get_external_llm_messages()
        assert msgs and msgs[0]["role"] == "system"
    finally:
        httpd.shutdown()


def test_external_tts_substitution(codec, text_tok):
    """Live TTS substitution: the agent pulls codec chunks from the TTS
    server (opening-text stream prepped at reset), swaps them in for the
    duplex LM's agent tokens via set_audio_tokens + KV recompute, and scores
    interruptions."""
    from realtime_codec_agent_tpu.serving.tts_server import (
        SyntheticTTSEngine, TTSServer, make_http_server,
    )

    server_at = AudioTokenizer(codec_model=codec)
    httpd = make_http_server(TTSServer(SyntheticTTSEngine(), server_at), "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        fake = FakeLMEngine(default_token=text_tok.codec_vocab_start + 7)
        resources = FakeResources(AudioTokenizer(codec_model=codec), text_tok, fake)
        config = RealtimeAgentConfig(
            use_whisper=False,
            agent_opening_text="hello there friend",
            force_trans_after_inactivity_secs=0.0,
            force_response_after_inactivity_secs=0.0,
            use_external_tts=True,
            external_tts_server_url=f"http://127.0.0.1:{httpd.server_address[1]}",
        )
        agent = RealtimeAgent(resources=resources, config=config)

        subbed = []
        for _ in range(6):
            agent.process_audio(chunk_audio())
            frames = agent.chunk_size_frames_per_channel
            idx = agent.audio_tokens_idx[-2 * frames :: 2]
            subbed.append([agent.input_ids[i] for i in idx])

        # interrupt scores were recorded every chunk
        assert len(agent.stats.tts_interrupt_score) == 6
        # at least one chunk actually substituted TTS audio: the agent-channel
        # tokens differ from the fake LM's constant default token in >= 1 chunk
        default = fake.default_token
        assert any(any(t != default for t in chunk_toks) for chunk_toks in subbed)
        # all agent-channel tokens remain codec ids (the substitution is audio)
        assert all(
            t >= text_tok.codec_vocab_start for chunk_toks in subbed for t in chunk_toks
        )
    finally:
        httpd.shutdown()
