"""A-20 live service: the always-on POST /ingest endpoint
(reference: mcp_server.py:10-43, a FastAPI app) re-expressed over the
Spark engine with ONLY the standard library (http.server) — FastAPI/
uvicorn are not available in this container and are not needed for
request/response parity: the reference endpoint is a plain
JSON-in/JSON-out POST with no streaming, auth, or middleware.

Design: one long-lived SparkSession serves all requests (Spark
sessions are thread-safe for job submission; the driver schedules
concurrent single-row jobs FIFO). Each request runs the SAME
DataFrame graph as the batch path via ingest_single — the service is
a thin transport shim, so batch/service semantic parity is enforced
by construction and tested in tests/test_ingest_pipeline.py.

Request parity with mcp_server.py:
- POST /ingest, JSON body {"volume": ..., "pdf_url": ...,
  "source": optional} (DocumentRequest, mcp_server.py:12-15);
- missing required fields -> 422 (FastAPI's validation status);
- any other path -> 404; GET -> 405;
- response: the document dict, or {"error": ...} with HTTP 200
  (the reference returns errors as 200-OK objects, not 4xx/5xx —
  mcp_server.py:24,30 — so clients see identical bodies).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_ingest_server(
    spark,
    host: str = "127.0.0.1",
    port: int = 0,
    fetcher=None,
    extractor=None,
    ingest_date: str | None = None,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server. port=0 binds an ephemeral
    port (read it from server.server_address). fetcher/extractor are
    injectable exactly as in ingest_single, so the service is testable
    offline — the same injection seam the batch path uses."""
    from ethiopia_legal_etl_spark.operators.ingest import ingest_single

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:  # quiet: no stderr spam
            pass

        def _reply(self, status: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:
            self._reply(405, {"detail": "Method Not Allowed"})

        def do_POST(self) -> None:
            if self.path != "/ingest":
                self._reply(404, {"detail": "Not Found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._reply(422, {"detail": "invalid JSON body"})
                return
            missing = [k for k in ("volume", "pdf_url") if k not in req]
            if missing:
                self._reply(
                    422,
                    {"detail": [{"loc": ["body", m], "msg": "field required"}
                                for m in missing]},
                )
                return
            doc = ingest_single(
                spark,
                volume=req["volume"],
                pdf_url=req["pdf_url"],
                fetcher=fetcher,
                extractor=extractor,
                ingest_date=ingest_date,
            )
            # errors are 200-OK objects, reference parity (mcp_server.py:24,30)
            self._reply(200, doc)

    return ThreadingHTTPServer((host, port), Handler)


def start_ingest_server(server: ThreadingHTTPServer) -> threading.Thread:
    """Serve forever on a daemon thread; shut down with
    server.shutdown(). Returns the thread."""
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
