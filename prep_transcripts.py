"""CLI wrapper: corpus transcript normalization (see realtime_codec_agent_tpu/data/prep_transcripts.py)."""
from realtime_codec_agent_tpu.data.prep_transcripts import main

if __name__ == "__main__":
    main()
