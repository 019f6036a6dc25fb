"""CLI wrapper: speaker->channel mapping (see realtime_codec_agent_tpu/data/prep_channel_map.py)."""
from realtime_codec_agent_tpu.data.prep_channel_map import main

if __name__ == "__main__":
    main()
