"""Agent state-machine tests with a scripted fake LM.

Exercises the 100 ms duplex step: pure-audio chunks, transcription events,
response events, event suppression + rollback, forced events, transcript
bookkeeping, and chunk-size invariants (reference realtime_agent_v2.py:332-372,
504-554 behaviors).
"""
import numpy as np
import pytest

from realtime_codec_agent_tpu.agent.agent import RealtimeAgent
from realtime_codec_agent_tpu.agent.config import RealtimeAgentConfig
from realtime_codec_agent_tpu.audio_tokenizer import AudioTokenizer
from realtime_codec_agent_tpu.models.codec import JaxCodecModel, tiny_codec_config
from realtime_codec_agent_tpu.tokenization import CodecTextTokenizer

from fakes import FakeLMEngine, FakeResources


@pytest.fixture(scope="module")
def codec():
    return JaxCodecModel.random_init(tiny_codec_config(), seed=0)


@pytest.fixture(scope="module")
def text_tok(codec):
    return CodecTextTokenizer(codebook_size=codec.codebook_size)


def make_agent(codec, text_tok, script=None, **config_kwargs):
    fake = FakeLMEngine(script=script, default_token=text_tok.codec_vocab_start + 7)
    resources = FakeResources(AudioTokenizer(codec_model=codec), text_tok, fake)
    config_kwargs.setdefault("use_whisper", False)
    config_kwargs.setdefault("agent_opening_text", None)
    config_kwargs.setdefault("force_trans_after_inactivity_secs", 0.0)
    config_kwargs.setdefault("force_response_after_inactivity_secs", 0.0)
    config = RealtimeAgentConfig(**config_kwargs)
    agent = RealtimeAgent(resources=resources, config=config)
    return agent, fake


def chunk_audio():
    return np.zeros(1600, dtype=np.float32)  # 100 ms @ 16 kHz


def codec_id(text_tok, code):
    return text_tok.codec_vocab_start + code


def test_reset_builds_header_and_prefills(codec, text_tok):
    agent, fake = make_agent(codec, text_tok)
    seq = agent.get_sequence_str()
    assert seq.startswith("<|agent|><|speaker|> A<|speaker|> B<|agent_voice|>")
    assert seq.endswith("<|audio|>")
    # everything except the trailing <|audio|> is prefilled
    assert fake.n_tokens == len(agent.input_ids) - 1
    assert agent.context_start_pos > 0


def test_opening_text_in_prompt_and_transcript(codec, text_tok):
    agent, _ = make_agent(codec, text_tok, agent_opening_text="hello?")
    assert " A: hello?" in agent.get_sequence_str()
    assert agent.transcript[0]["speaker"] == "A"
    assert agent.transcript[0]["text"] == "hello?"


def test_pure_audio_chunk(codec, text_tok):
    agent, fake = make_agent(codec, text_tok)
    out = agent.process_audio(chunk_audio())
    assert out.shape == (1600,)
    assert agent.total_frames == 10  # 5 agent + 5 user tokens = 5 pairs
    assert agent.total_secs == pytest.approx(0.1)
    # sequence tail: 5 interleaved (agent, user) codec pairs
    tail = agent.input_ids[-10:]
    assert all(t >= text_tok.codec_vocab_start for t in tail)


def test_audio_pairs_interleaved(codec, text_tok):
    a1, a2 = codec_id(text_tok, 11), codec_id(text_tok, 12)
    agent, fake = make_agent(codec, text_tok, seed=1)
    fake.script = [a1, a2] + [codec_id(text_tok, 13)] * 3
    agent.process_audio(chunk_audio())
    # audio_tokens_idx points at (agent, user) positions pairwise
    idx = agent.audio_tokens_idx
    assert len(idx) == 10
    assert agent.input_ids[idx[0]] == a1
    assert agent.input_ids[idx[2]] == a2
    # user tokens are the encoded input chunk
    user_ids = [agent.input_ids[i] for i in idx[1::2]]
    assert all(u >= text_tok.codec_vocab_start for u in user_ids)


def test_transcription_event(codec, text_tok):
    user_sp = text_tok.encode(" B", add_special_tokens=False)[0]
    end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    colon = text_tok.encode(":", add_special_tokens=False)
    hi = text_tok.encode(" hi", add_special_tokens=False)
    audio_tok = codec_id(text_tok, 21)

    # frame 0: audio; frame 1: end_audio -> " B" -> ": hi" -> <|audio|> -> audio
    script = [audio_tok, end_audio, user_sp] + colon + hi + [start_audio] + [audio_tok] * 4
    agent, fake = make_agent(codec, text_tok)
    fake.script = script
    out = agent.process_audio(chunk_audio())
    assert out.shape == (1600,)
    assert len(agent.transcript) == 1
    entry = agent.transcript[0]
    assert entry["speaker"] == "B"
    assert entry["text"] == ": hi".replace(": ", "") or entry["text"] == "hi"
    assert "<|end_audio|> B: hi<|audio|>" in agent.get_sequence_str()
    # trans sampler was engaged then restored
    temps = [s.get("temp") for s in fake.sampler_inits]
    assert 0.0 in temps  # trans_temperature default 0.0


def test_response_event(codec, text_tok):
    agent_sp = text_tok.encode(" A", add_special_tokens=False)[0]
    end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    colon_yes = text_tok.encode(": yes", add_special_tokens=False)
    audio_tok = codec_id(text_tok, 30)

    script = [audio_tok, end_audio, agent_sp] + colon_yes + [start_audio] + [audio_tok] * 4
    agent, fake = make_agent(codec, text_tok)
    fake.script = script
    agent.process_audio(chunk_audio())
    assert len(agent.transcript) == 1
    entry = agent.transcript[0]
    assert entry["speaker"] == "A"
    assert entry["text"] == "yes"
    assert entry["end_secs"] is None  # agent entries get end time on finalize
    assert agent.ch1_inactivity_elapsed_secs == 0.0


def test_event_suppression_rolls_back(codec, text_tok):
    user_sp = text_tok.encode(" B", add_special_tokens=False)[0]
    end_audio = text_tok.convert_tokens_to_ids("<|end_audio|>")
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    audio_tok = codec_id(text_tok, 40)

    # event emits end_audio + speaker then immediately <|audio|> (=> <2 tokens
    # generated => suppressed, reference realtime_agent_v2.py:256-262)
    script = [end_audio, user_sp, start_audio] + [audio_tok] * 5
    agent, fake = make_agent(codec, text_tok)
    seq_before = list(agent.input_ids)
    fake.script = script
    agent.process_audio(chunk_audio())
    seq = agent.get_sequence_str()
    assert "<|end_audio|>" not in seq[len("<|agent|>") :] or seq.count("<|end_audio|>") == 0
    assert agent.transcript == []
    # sequence = original prompt + 5 audio pairs
    assert len(agent.input_ids) == len(seq_before) + 10
    # suppression engaged the end_audio logit bias once
    assert any(s.get("logit_bias") for s in fake.sampler_inits)


def test_forced_response_injects_event(codec, text_tok):
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    colon_ok = text_tok.encode(": ok", add_special_tokens=False)
    audio_tok = codec_id(text_tok, 50)

    agent, fake = make_agent(codec, text_tok)
    # enter audio mode first (force events only fire from an audio pair,
    # reference realtime_agent_v2.py:345-350)
    fake.script = [audio_tok] * 5
    agent.process_audio_input_ids([codec_id(text_tok, 60)] * 5)
    # forced response: agent appends end_audio itself and picks the agent
    # speaker; the script only supplies the response text + audio
    fake.script = colon_ok + [start_audio] + [audio_tok] * 5
    out_ids = agent.process_audio_input_ids(
        [codec_id(text_tok, 60)] * 5, force_trans=False, force_response=True
    )
    assert len(out_ids) == 5
    assert len(agent.transcript) == 1
    assert agent.transcript[0]["speaker"] == "A"
    assert agent.transcript[0]["text"] == "ok"


def test_forced_trans_injects_user_event(codec, text_tok):
    start_audio = text_tok.convert_tokens_to_ids("<|audio|>")
    colon_hey = text_tok.encode(": hey", add_special_tokens=False)
    audio_tok = codec_id(text_tok, 55)

    agent, fake = make_agent(codec, text_tok)
    fake.script = [audio_tok] * 5
    agent.process_audio_input_ids([codec_id(text_tok, 61)] * 5)
    fake.script = colon_hey + [start_audio] + [audio_tok] * 5
    agent.process_audio_input_ids(
        [codec_id(text_tok, 61)] * 5, force_trans=True, force_response=False
    )
    assert agent.transcript[0]["speaker"] == "B"
    assert agent.transcript[0]["text"] == "hey"


def test_chunk_size_assertion(codec, text_tok):
    agent, _ = make_agent(codec, text_tok)
    with pytest.raises(AssertionError):
        agent.process_audio(np.zeros(100, dtype=np.float32))


def test_self_play_returns_ids(codec, text_tok):
    fake_script = None
    agent, fake = make_agent(codec, text_tok)
    agent.self_play_mode = True
    out, out_ids = agent.process_audio(chunk_audio())
    assert len(out_ids) == 5
    assert out.shape == (1600,)


def test_get_audio_history_stereo(codec, text_tok):
    agent, _ = make_agent(codec, text_tok)
    agent.process_audio(chunk_audio())
    agent.process_audio(chunk_audio())
    hist = agent.get_audio_history()
    assert hist.shape == (2, 3200)


def test_get_and_set_audio_tokens(codec, text_tok):
    agent, fake = make_agent(codec, text_tok)
    agent.process_audio(chunk_audio())
    tokens = agent.get_audio_tokens()
    assert len(tokens) == 10
    new_agent_tokens = [codec_id(text_tok, 99)] * 5
    agent.set_audio_tokens(new_agent_tokens, start_frame=0, channel=0)
    assert agent.get_audio_tokens()[0::2] == new_agent_tokens
    # set_audio_tokens re-evals the edited range
    assert fake.n_tokens >= agent.audio_tokens_idx[0]


def test_format_transcript_times(codec, text_tok):
    agent, _ = make_agent(codec, text_tok, agent_opening_text="yo")
    out = agent.format_transcript()
    assert out.startswith("[0:00:00.000 - ")
    assert "A: yo" in out


def test_event_prob_measured_each_chunk(codec, text_tok):
    agent, fake = make_agent(codec, text_tok)
    fake.end_audio_prob = 0.9
    agent.process_audio(chunk_audio())
    assert len(agent.stats.event_prob) == 1
    # elevated prob (z >= 0) triggers the speaker probe; fake returns agent-heavy
    fake.speaker_probs = (0.9, 0.1)
    agent.process_audio(chunk_audio())
    assert agent.prob_event_speaker_token_id == agent.agent_speaker_token_id


def test_trim_sequences_advances_and_rebuilds(codec, text_tok):
    agent, fake = make_agent(codec, text_tok, max_context_secs=0.2, trim_by_secs=0.1)
    agent.process_audio(chunk_audio())
    agent.process_audio(chunk_audio())
    n_evals_before = len(fake.eval_calls)
    agent.process_audio(chunk_audio())  # total 0.3 s > 0.2 s => trim fires
    assert agent.trim_to_secs == pytest.approx(0.1)

