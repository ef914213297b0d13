"""Serving: a jit-compiled batched depth-inference engine, a micro-batching
HTTP server, and AOT model export.

New capability beyond the reference (its only inference surface is the
`test_simple.py` CLI, `/root/reference/test_simple.py:46-190`): production
serving wants ONE compiled program at a fixed batch shape, request
coalescing so concurrent clients share a device call, and an exportable
artifact that loads without the Python model code.

  * InferenceEngine: loads any checkpoint (orbax or reference .pth), jits
    encoder+decoder at a fixed (max_batch, H, W, 3) shape once, pads partial
    batches — no shape-driven recompiles at serve time.
  * MicroBatcher: queues concurrent requests and flushes by size/deadline.
  * HTTP server (stdlib): POST /predict (PNG/JPEG body) -> .npy disparity;
    GET /healthz.
  * export_artifact / load_artifact: jax.export StableHLO serialization —
    the artifact re-loads and executes without flax or the model zoo.
"""

from __future__ import annotations

import io
import json
import os
import queue
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import Options
from .ops.geometry import disp_to_depth


class InferenceEngine:
    """Fixed-shape batched depth inference on one compiled program."""

    def __init__(self, opt: Options, max_batch: int = 8):
        from .eval.evaluate_depth import load_eval_state
        from .train.step import build_infer_step

        self.opt = opt
        self.max_batch = max_batch
        self.height, self.width = opt.height, opt.width
        bundle, state = load_eval_state(opt)
        infer = build_infer_step(bundle)
        params, stats = state.params, state.batch_stats

        def fn(images):  # (max_batch, H, W, 3) float32 [0,1]
            disps = infer(params, stats, images)
            return disps[0][..., 0]  # (max_batch, H, W)

        self._fn = jax.jit(fn)
        # compile once at the serving shape
        self._fn(jnp.zeros((max_batch, self.height, self.width, 3),
                           jnp.float32))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8/float -> (N, H, W) disparity; N <= max_batch
        (padded to the compiled shape internally)."""
        n = images.shape[0]
        assert n <= self.max_batch, f"batch {n} > max_batch {self.max_batch}"
        x = images.astype(np.float32)
        if images.dtype == np.uint8:
            x = x / 255.0
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n,) + x.shape[1:], np.float32)
            x = np.concatenate([x, pad], 0)
        out = np.asarray(self._fn(jnp.asarray(x)))
        return out[:n]

    def predict_depth(self, images: np.ndarray) -> np.ndarray:
        disp = self.predict(images)
        _, depth = disp_to_depth(disp, self.opt.min_depth, self.opt.max_depth)
        return np.asarray(depth)


class MicroBatcher:
    """Coalesce concurrent single-image requests into shared device calls."""

    def __init__(self, engine: InferenceEngine, max_delay_ms: float = 5.0):
        self.engine = engine
        self.max_delay = max_delay_ms / 1000.0
        self._queue: "queue.Queue[Tuple[np.ndarray, queue.Queue]]" = \
            queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, timeout: float = 30.0) -> np.ndarray:
        """(H, W, 3) -> (H, W) disparity; blocks until served."""
        reply: "queue.Queue" = queue.Queue(maxsize=1)
        self._queue.put((image, reply))
        out = reply.get(timeout=timeout)
        if isinstance(out, Exception):
            raise out
        return out

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_delay
            while len(batch) < self.engine.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            images = np.stack([b[0] for b in batch], 0)
            try:
                disps = self.engine.predict(images)
                for (_, reply), d in zip(batch, disps):
                    reply.put(d)
            except Exception as err:  # propagate to every waiter
                for _, reply in batch:
                    reply.put(err)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2)


def make_http_server(batcher: MicroBatcher, host: str = "127.0.0.1",
                     port: int = 0):
    """-> http.server.ThreadingHTTPServer serving the engine.

    POST /predict: image file body (any PIL-readable format) -> .npy bytes
    of the (H, W) float32 disparity (resized server-side to the feed shape).
    GET /healthz: {"status": "ok", ...}.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    engine = batcher.engine

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "status": "ok",
                "feed": [engine.height, engine.width],
                "max_batch": engine.max_batch,
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = Image.open(io.BytesIO(self.rfile.read(n)))
                img = img.convert("RGB").resize(
                    (engine.width, engine.height), Image.LANCZOS)
                disp = batcher.submit(np.asarray(img, np.uint8))
                buf = io.BytesIO()
                np.save(buf, disp.astype(np.float32))
                payload = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npy")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as err:
                self.send_error(500, str(err))

    return ThreadingHTTPServer((host, port), Handler)


# ---------------------------------------------------------------------------
# AOT export
# ---------------------------------------------------------------------------


def export_artifact(opt: Options, out_path: str, max_batch: int = 8,
                    bundle=None, state=None) -> str:
    """Serialize the batched depth forward as a StableHLO artifact
    (jax.export). The artifact runs without flax / the model definitions."""
    from .train.step import build_infer_step

    if bundle is None or state is None:
        from .eval.evaluate_depth import load_eval_state

        bundle, state = load_eval_state(opt)
    infer = build_infer_step(bundle)
    params, stats = state.params, state.batch_stats

    def fn(images):
        return infer(params, stats, images)[0][..., 0]

    spec = jax.ShapeDtypeStruct((max_batch, opt.height, opt.width, 3),
                                jnp.float32)
    exported = jax.export.export(jax.jit(fn))(spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    meta = {"height": opt.height, "width": opt.width, "max_batch": max_batch,
            "min_depth": opt.min_depth, "max_depth": opt.max_depth}
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f)
    return out_path


def load_artifact(path: str):
    """-> (callable images(float32 [0,1], (B,H,W,3)) -> disparity, meta)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(path + ".json") as f:
        meta = json.load(f)
    call = jax.jit(exported.call)
    return call, meta
