"""CLI shim: codec-chunk streaming TTS server (reference tts_server.py)."""
from realtime_codec_agent_tpu.serving.tts_server import main

if __name__ == "__main__":
    main()
