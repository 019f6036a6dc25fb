from .transcript_utils import load_transcript, set_agent_speaker, is_speaker_channel_isolated
from .lm_dataset_builder import LMDatasetBuilder, InterleaveOrder, get_codes_files
