from .engine import DuplexLMEngine, PREFILL_BUCKETS
