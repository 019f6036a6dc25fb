"""Break an event chunk into timed phases on the real chip.

Forces three transcription and three response events through a full-size
agent and prints, per event, wall-clock totals of each agent/engine method
(monkeypatched timers). Companion to profile_tpu.py (hot-path) — this one
covers the HARD path: inline text generation, event replay, finalize scoring.
Run from the repo root: python tools/profile_event_path.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
from realtime_codec_agent_tpu import RealtimeAgentConfig, RealtimeAgentResources
from realtime_codec_agent_tpu.agent.agent import RealtimeAgent

res = RealtimeAgentResources(whisper_model=None)
cfg = RealtimeAgentConfig(
    seed=42, use_whisper=False, agent_opening_text=None,
    force_trans_after_inactivity_secs=0.0, force_response_after_inactivity_secs=0.0,
    pipeline_chunks=False, max_inline_text_tokens=30,
)
agent = RealtimeAgent(resources=res, config=cfg)
_orig = agent.set_sampler
def set_sampler(for_trans=False, suppress_end_audio=False):
    _orig(for_trans=for_trans, suppress_end_audio=suppress_end_audio)
    res.llm.settings.min_token_id = res.tokenizer.codec_vocab_start
agent.set_sampler = set_sampler
agent.set_sampler()

# instrument phases
import realtime_codec_agent_tpu.agent.agent as A
times = {}
def wrap(obj, name):
    f = getattr(obj, name)
    def g(*a, **k):
        t0 = time.perf_counter()
        try:
            return f(*a, **k)
        finally:
            times.setdefault(name, []).append((time.perf_counter()-t0)*1000)
    setattr(obj, name, g)

for m in ("generate_for_trans", "generate_for_response", "_native_generate_text",
          "finalize_last_response", "recompute_kv_cache", "process_audio_input_ids",
          "measure_event_prob", "update_transcript", "whisper_trans",
          "detokenize_output_chunk", "_chunked_tokenize", "_commit_accepted_frames"):
    wrap(agent, m)
wrap(res.llm, "get_logprobs")
wrap(res.llm, "generate_until")
wrap(res.llm, "eval")
wrap(res.llm, "eval_and_sample")

sr = res.audio_tokenizer.sampling_rate
chunk = agent.chunk_size_samples
rng = np.random.default_rng(0)
t = np.arange(sr * 8) / sr
audio = (0.2*np.sin(2*np.pi*150*t) + 0.02*rng.normal(size=t.shape)).astype(np.float32)

# warm 30 chunks
for i in range(30):
    agent.process_audio(audio[i*chunk:(i+1)*chunk])
times.clear()

for kind, patch in (("TRANS", "should_force_transcription"), ("RESP", "should_force_response")):
    for j in range(3):
        i = 30 + j
        keep = getattr(agent, patch)
        setattr(agent, patch, lambda: True)
        t0 = time.perf_counter()
        agent.process_audio(audio[(i % 70)*chunk:((i % 70)+1)*chunk])
        total = (time.perf_counter()-t0)*1000
        setattr(agent, patch, keep)
        print(f"--- {kind} event #{j}: total={total:.0f}ms")
        for name, ts in sorted(times.items(), key=lambda kv: -sum(kv[1])):
            print(f"    {name:28s} n={len(ts)} sum={sum(ts):7.1f}ms  {['%.0f'%x for x in ts[:8]]}")
        times.clear()
        # a couple of normal chunks between events
        for k in range(3):
            agent.process_audio(audio[((i+k) % 70)*chunk:(((i+k) % 70)+1)*chunk])
        times.clear()
