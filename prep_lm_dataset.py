"""CLI shim: compile codes + transcripts into the LM text dataset
(reference prep_lm_dataset.py)."""
from realtime_codec_agent_tpu.data.prep_lm_dataset import main

if __name__ == "__main__":
    main()
