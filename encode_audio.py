"""CLI wrapper: batched TPU corpus encode (replaces the reference's
encode_audio_gpu_{1..4}.sh / encode_audio_stereo.sh sharded GPU jobs;
see realtime_codec_agent_tpu/data/encode_corpus.py)."""
from realtime_codec_agent_tpu.data.encode_corpus import main

if __name__ == "__main__":
    main()
