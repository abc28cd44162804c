"""HTTP serving layer: batched forced alignment as a service.

The reference ships a JS/WASM binding (js/api.js) so browsers can run
the decoder locally; a TPU framework's equivalent deployment surface is
a serving endpoint in front of the accelerator.  This module provides
one with no dependencies beyond the standard library:

* ``AlignService`` — a dynamic batcher around :class:`TpuAligner`:
  requests queue up, a worker groups same-transcript requests into one
  `align_batch` dispatch (the vectorized fast path) and flushes on
  either ``max_batch`` or ``max_wait_ms``, whichever comes first.
* ``make_server`` / ``main`` — a ThreadingHTTPServer exposing

  - ``POST /v1/align``: JSON ``{"text": str, "audio": base64 int16 LE
    pcm}`` (or ``"audio_f32"``) -> the reference's result-JSON schema
    ``{"b","d","p","t","w":[...]}`` per word with phone nesting
    (README.md:63-74 of the reference).
  - ``GET /v1/health``: liveness + model info.
  - ``GET /v1/config``: the effective decoder configuration (JSON).

Run: ``python -m soundswallower_tpu.serve --model <dir> --port 8000``.
"""

from __future__ import annotations

import argparse
import base64
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

LOG = logging.getLogger("soundswallower_tpu.serve")


class AlignService:
    """Dynamic batcher around TpuAligner.align_batch."""

    def __init__(self, aligner, max_batch: int = 64,
                 max_wait_ms: float = 20.0):
        self.aligner = aligner
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self._finisher = None   # tail of the in-order end() chain
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, audio: np.ndarray, text: str) -> Future:
        fut: Future = Future()
        self._q.put((audio, text, fut))
        return fut

    def align(self, audio: np.ndarray, text: str, timeout: float = 300.0):
        return self.submit(audio, text).result(timeout)

    def close(self):
        self._stop = True
        self._q.put(None)
        self._worker.join(timeout=5)
        fin = self._finisher
        if fin is not None:
            fin.join(timeout=5)

    # -- batching worker -----------------------------------------------------

    def _run(self):
        while not self._stop:
            item = self._q.get()
            if item is None:
                continue
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remain = deadline - time.monotonic()
                if remain <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remain)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            audios = [b[0] for b in batch]
            texts = [b[1] for b in batch]
            try:
                # Same-transcript batches go through the pipelined
                # begin/end split so the NEXT batch's host FE + upload
                # can overlap this one's device compute: the finisher
                # thread runs end() while this worker loops back to
                # collect and begin() the next batch.
                if len(set(texts)) == 1:
                    handle = self.aligner.align_batch_begin(audios, texts)
                    self._finish(handle, batch)
                else:
                    results = self.aligner.align_batch(audios, texts)
                    self._resolve(results, batch)
            except Exception as e:  # per-request isolation
                LOG.exception("batch of %d failed", len(batch))
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def _finish(self, handle, batch):
        """Resolve a dispatched batch on the finisher thread (keeps the
        batching worker free to begin the next batch)."""
        def run():
            try:
                self._resolve(self.aligner.align_batch_end(handle), batch)
            except Exception as e:
                LOG.exception("batch of %d failed", len(batch))
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
        prev = self._finisher
        def chained():
            if prev is not None:
                prev.join()
            run()
        t = threading.Thread(target=chained, daemon=True)
        self._finisher = t
        t.start()

    def _resolve(self, results, batch):
        for (_, _, fut), segs in zip(batch, results):
            if segs is None:
                fut.set_exception(RuntimeError(
                    "alignment failed (unreachable final state "
                    "or unknown word)"))
            else:
                fut.set_result(segs)


def segs_to_json(segs, frate: int = 100) -> dict:
    """WordSeg list -> the reference's result-JSON schema
    (decoder_result_json, src/decoder.c:1502-1593)."""
    words = []
    t_start = segs[0].start if segs else 0
    t_end = (segs[-1].start + segs[-1].duration) if segs else 0
    for s in segs:
        w = {"b": round(s.start / frate, 3),
             "d": round(s.duration / frate, 3),
             "t": s.word}
        if s.phones:
            w["w"] = [{"b": round(p[1] / frate, 3),
                       "d": round(p[2] / frate, 3), "t": p[0]}
                      for p in s.phones]
        words.append(w)
    text = " ".join(s.word for s in segs
                    if not (s.word.startswith("<") or s.word.startswith("[")))
    return {"b": round(t_start / frate, 3),
            "d": round((t_end - t_start) / frate, 3),
            "t": text, "w": words}


def make_server(aligner, host: str = "127.0.0.1", port: int = 8000,
                max_batch: int = 64, max_wait_ms: float = 20.0):
    service = AlignService(aligner, max_batch, max_wait_ms)
    frate = aligner.config.get_int("frate")

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            LOG.debug(fmt, *args)

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/health":
                self._json(200, {
                    "status": "ok",
                    "model": aligner.config["hmm"],
                    "n_sen": aligner.am.n_sen,
                    "backend": aligner.am.backend,
                })
            elif self.path == "/v1/config":
                self._json(200, json.loads(
                    aligner.config.serialize_json()))
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/align":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                text = req["text"]
                if "audio" in req:
                    audio = np.frombuffer(
                        base64.b64decode(req["audio"]), np.int16)
                elif "audio_f32" in req:
                    f = np.frombuffer(
                        base64.b64decode(req["audio_f32"]), np.float32)
                    audio = (f * 32768.0).clip(-32768, 32767).astype(np.int16)
                else:
                    raise KeyError("audio")
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                segs = service.align(audio, text)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(200, segs_to_json(segs, frate))

    server = ThreadingHTTPServer((host, port), Handler)
    server.service = service
    return server


def main(argv=None):
    from .aligner import TpuAligner

    ap = argparse.ArgumentParser(
        description="Batched TPU forced-alignment server")
    ap.add_argument("--model", required=True,
                    help="acoustic model directory (hmm)")
    ap.add_argument("--dict", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    args = ap.parse_args(argv)
    kw = dict(hmm=args.model)
    if args.dict:
        kw["dict"] = args.dict
    aligner = TpuAligner(**kw)
    server = make_server(aligner, args.host, args.port,
                         args.max_batch, args.max_wait_ms)
    LOG.info("serving on %s:%d", args.host, args.port)
    try:
        server.serve_forever()
    finally:
        server.service.close()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
