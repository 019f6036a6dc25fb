"""TPU-native full-duplex codec dialogue agent framework.

Rebuild of AbrahamSanders/realtime-codec-agent for TPU: JAX/XLA/Pallas compute
path, jitted codec + duplex LM engines, and the realtime agent stack on top.

Public surface mirrors the reference package exports
(reference realtime_codec_agent/__init__.py:1-5). Imports are lazy so that
pure-host layers (units, tokenization, data prep) don't pull in JAX.
"""

__version__ = "0.1.0"

__all__ = [
    "RealtimeAgentResources",
    "RealtimeAgentConfig",
    "RealtimeAgent",
    "RealtimeAgentMultiprocessing",
    "add_common_inference_args",
]

_LAZY = {
    "RealtimeAgentResources": ("realtime_codec_agent_tpu.agent.resources", "RealtimeAgentResources"),
    "RealtimeAgentConfig": ("realtime_codec_agent_tpu.agent.config", "RealtimeAgentConfig"),
    "RealtimeAgent": ("realtime_codec_agent_tpu.agent.agent", "RealtimeAgent"),
    "RealtimeAgentMultiprocessing": ("realtime_codec_agent_tpu.agent.agent", "RealtimeAgentMultiprocessing"),
    "add_common_inference_args": ("realtime_codec_agent_tpu.utils.cli_utils", "add_common_inference_args"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
