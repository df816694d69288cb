"""Streaming HTTP server over the LLM engine.

Reference: flood/service/launch_server.py — FastAPI ``POST /generate`` with
a pool of output queues, one per concurrent stream (:19-44), plus
bench_service.py / send_http_request.py drivers. Here the engine's
per-request stream queues make the pool unnecessary.

FastAPI is used when available; otherwise a stdlib http.server fallback
serves the same endpoints (this container must not pip install).

Endpoints:
  POST /generate   {"prompt": str | "input_ids": [int], "max_new_tokens": N,
                    "temperature": f, "top_k": n, "top_p": f,
                    "stream": bool}
  GET  /health
  GET  /metrics
"""

from __future__ import annotations

import json
import threading
from typing import Optional

from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams


def _sampling_from(body: dict) -> SamplingParams:
    return SamplingParams(
        temperature=float(body.get("temperature", 0.0)),
        top_k=int(body.get("top_k", 0)),
        top_p=float(body.get("top_p", 1.0)),
        max_new_tokens=int(body.get("max_new_tokens", 256)),
        eos_token_id=body.get("eos_token_id"),
    )


def _ids_from(llm: LLM, body: dict):
    if "input_ids" in body:
        return [int(x) for x in body["input_ids"]]
    return llm.encode(body["prompt"])


def make_fastapi_app(llm: LLM):
    """FastAPI app factory (reference launch_server.py:19)."""
    from fastapi import FastAPI
    from fastapi.responses import StreamingResponse

    app = FastAPI()

    @app.get("/health")
    def health():
        return {"status": "ok"}

    @app.get("/metrics")
    def metrics():
        return llm.metrics.summary()

    @app.post("/generate")
    async def generate(body: dict):
        ids = _ids_from(llm, body)
        sampling = _sampling_from(body)
        if body.get("stream", True):
            async def gen():
                async for tok in llm.async_stream_generate(ids, sampling):
                    piece = (
                        llm.decode_text([tok]) if llm.tokenizer else str(tok)
                    )
                    yield json.dumps({"token": tok, "text": piece}) + "\n"

            return StreamingResponse(gen(), media_type="application/jsonl")
        req = llm.add_request(ids, sampling)
        import asyncio

        while req.state != "finished":
            await asyncio.sleep(0.002)
        text = llm.decode_text(req.output_ids) if llm.tokenizer else None
        return {
            "output_ids": req.output_ids,
            "text": text,
            "finish_reason": req.finish_reason,
        }

    return app


class StdlibServer:
    """Dependency-free fallback server with chunked streaming."""

    def __init__(self, llm: LLM, host: str = "0.0.0.0", port: int = 8000):
        import http.server

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path == "/health":
                    self._json({"status": "ok"})
                elif self.path == "/metrics":
                    self._json(outer.llm.metrics.summary())
                else:
                    self.send_error(404)

            def do_POST(self):
                if self.path != "/generate":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                ids = _ids_from(outer.llm, body)
                sampling = _sampling_from(body)
                if body.get("stream", True):
                    self.send_response(200)
                    self.send_header("Content-Type", "application/jsonl")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    for tok in outer.llm.stream_generate(ids, sampling):
                        piece = (
                            outer.llm.decode_text([tok])
                            if outer.llm.tokenizer else str(tok)
                        )
                        line = (json.dumps({"token": tok, "text": piece}) + "\n").encode()
                        self.wfile.write(b"%x\r\n%s\r\n" % (len(line), line))
                    self.wfile.write(b"0\r\n\r\n")
                else:
                    req = outer.llm.add_request(ids, sampling)
                    import time as _t

                    while req.state != "finished":
                        _t.sleep(0.002)
                    self._json({
                        "output_ids": req.output_ids,
                        "finish_reason": req.finish_reason,
                    })

            def _json(self, obj):
                data = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.llm = llm
        import socketserver

        class ThreadingHTTPServer(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self.llm.launch()
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.llm.shutdown()


def launch_server(llm: LLM, host: str = "0.0.0.0", port: int = 8000,
                  prefer_fastapi: bool = True):
    """Start serving; returns the server object (stdlib) or runs uvicorn."""
    if prefer_fastapi:
        try:
            import uvicorn

            app = make_fastapi_app(llm)
            llm.launch()
            uvicorn.run(app, host=host, port=port)
            return None
        except ImportError:
            pass
    srv = StdlibServer(llm, host, port)
    srv.start()
    return srv
