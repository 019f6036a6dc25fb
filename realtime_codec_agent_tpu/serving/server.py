"""OpenAI-compatible completions server over the TPU engine (stdlib HTTP).

Replaces the vLLM server the reference demos target (reference
utils/vllm_utils.py:3-27, run_demo.py:74-92): GET /v1/models and
POST /v1/completions with streaming SSE, stop strings, seed, temperature /
top_p / min_p, and skip_special_tokens=False output.
"""
from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .backend import CompletionBackend


def _completion_chunk(model: str, text: str, finish: Optional[str] = None) -> dict:
    return {
        "id": f"cmpl-{uuid.uuid4().hex[:24]}",
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {"index": 0, "text": text, "logprobs": None, "finish_reason": finish}
        ],
    }


def make_handler(backend: CompletionBackend):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path.rstrip("/") == "/v1/models":
                self._json(
                    200,
                    {
                        "object": "list",
                        "data": [
                            {
                                "id": backend.model_name,
                                "object": "model",
                                "created": int(time.time()),
                                "owned_by": "rtca-tpu",
                            }
                        ],
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path.rstrip("/") != "/v1/completions":
                self._json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "invalid JSON"})
                return
            prompt = req.get("prompt", "")
            if isinstance(prompt, list):
                prompt = prompt[0] if prompt else ""
            kwargs = dict(
                max_tokens=int(req.get("max_tokens", 256)),
                temperature=float(req.get("temperature", 1.0)),
                top_p=float(req.get("top_p", 1.0)),
                min_p=float(req.get("min_p", 0.0)),
                presence_penalty=float(req.get("presence_penalty", 0.0)),
                frequency_penalty=float(req.get("frequency_penalty", 0.0)),
                seed=req.get("seed"),
                stop=req.get("stop"),
            )
            if isinstance(kwargs["stop"], str):
                kwargs["stop"] = [kwargs["stop"]]

            if req.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send_chunk(obj):
                    data = f"data: {json.dumps(obj)}\n\n".encode()
                    self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")

                try:
                    for delta in backend.generate(prompt, **kwargs):
                        send_chunk(_completion_chunk(backend.model_name, delta))
                    send_chunk(_completion_chunk(backend.model_name, "", finish="stop"))
                    done = b"data: [DONE]\n\n"
                    self.wfile.write(f"{len(done):x}\r\n".encode() + done + b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    # client went away mid-stream: normal teardown, not an error
                    self.close_connection = True
            else:
                text = "".join(backend.generate(prompt, **kwargs))
                resp = _completion_chunk(
                    backend.model_name, text, finish=backend.last_finish_reason or "stop"
                )
                self._json(200, resp)

    return Handler


class _QuietServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that treats client disconnects as normal teardown
    instead of dumping 'Exception occurred during processing of request'
    tracebacks into the server log."""

    def handle_error(self, request, client_address):
        import sys

        exc = sys.exc_info()[1]
        if isinstance(exc, (BrokenPipeError, ConnectionResetError, TimeoutError)):
            return
        super().handle_error(request, client_address)


class CompletionServer:
    def __init__(self, backend: CompletionBackend, host: str = "0.0.0.0", port: int = 8000):
        self.httpd = _QuietServer((host, port), make_handler(backend))
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()


def main(argv=None):
    import argparse

    from ..agent.resources import RealtimeAgentResources

    parser = argparse.ArgumentParser(description="OpenAI-compatible completions server")
    parser.add_argument("--llm_model_path", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument(
        "--batch_size", type=int, default=1,
        help=">1 enables continuous batching: concurrent requests share one "
             "jitted decode step (the concurrency the reference got from vLLM)",
    )
    parser.add_argument("--serving_context", type=int, default=4096)
    parser.add_argument(
        "--int8", action="store_true",
        help="int8 decode weights (serve the reference's q8_0-parity artifact)",
    )
    parser.add_argument(
        "--int4", action="store_true",
        help="int4 decode weights (the reference's Q4_K_M artifact, imported "
        "bit-exactly from a .gguf path)",
    )
    parser.add_argument(
        "--mesh", default=None, metavar="DPxTP",
        help="multi-chip serving mesh, e.g. 2x4: stream rows data-parallel "
             "over dp, weights/KV-heads tensor-parallel over tp (requires "
             "batch_size divisible by dp and dp*tp local devices)",
    )
    args = parser.parse_args(argv)

    resources = RealtimeAgentResources(
        llm_model_path=args.llm_model_path, tiny=args.tiny, whisper_model=None,
        quantize_int8=args.int8,
        quantize_int4=args.int4,
        # completions serving keeps the reference's full 16k context headroom
        # (the realtime agent's policy-sized default doesn't apply here)
        llm_n_ctx=16384,
    )
    if args.batch_size > 1:
        from ..lm.batched_engine import BatchedDecodeEngine
        from .batched_backend import BatchedCompletionBackend

        engine = BatchedDecodeEngine(
            resources.lm_params, resources.lm_config,
            batch_size=args.batch_size, max_context=args.serving_context,
        )
        if args.mesh:
            from ..parallel import make_mesh, shard_batched_engine_for_serving

            dp, tp = (int(x) for x in args.mesh.lower().split("x"))
            shard_batched_engine_for_serving(
                engine, make_mesh(dp=dp, fsdp=1, tp=tp)
            )
        backend = BatchedCompletionBackend(engine, resources.tokenizer)
    else:
        backend = CompletionBackend(resources.llm, resources.tokenizer)
        print("prewarming decode cache-view variants...", flush=True)
        backend.prewarm()  # no view-bucket cold compile mid-request
    server = CompletionServer(backend, host=args.host, port=args.port)
    print(f"Serving {backend.model_name} on {args.host}:{server.port} (batch={args.batch_size})")
    server.serve_forever()


if __name__ == "__main__":
    main()
