"""CLI wrapper: stratified dataset split (see realtime_codec_agent_tpu/data/split_lm_dataset.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from realtime_codec_agent_tpu.data.split_lm_dataset import main

if __name__ == "__main__":
    main()
