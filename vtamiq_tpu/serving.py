"""Production serving: micro-batching scorer + HTTP endpoint.

The reference has no serving story (it is a research trainer); this module
is new TPU-native capability for the deployment path:

- :class:`MicroBatcher` coalesces concurrent score requests into device
  batches. TPU executables are shape-static, so batches are padded UP to a
  small fixed ladder of sizes (1, 2, 4, ..., max_batch) per image (H, W),
  and results are sliced back per request and delivered through futures
  (completion order follows per-shape group dispatch, not strict arrival
  order). A dispatcher thread flushes on ``max_batch`` or ``max_wait_ms``
  after the first queued request (a bounded worst-case latency window).
  Variable-size traffic: construct the VTAMIQScorer with ``size_buckets``
  (data/buckets.py canonical shapes) and requests group by their COVERING
  BUCKET — mixed true sizes share padded device batches and the executable
  set is bounded by len(buckets) x ladder. Without buckets, pass
  ``restrict_to_warmed=True`` so that, after :meth:`warmup`, requests
  with novel (H, W) are rejected fast instead of stalling every queued
  request behind a multi-minute XLA compile; with buckets the same flag
  admits ANY shape a warmed bucket covers.
- :class:`ScoringServer` exposes it over HTTP (stdlib ``http.server``,
  threading; no extra dependencies):
    POST /score    body = .npz with arrays ``ref``, ``dist`` (HWC [0,1])
                   -> {"q": <float>}
    POST /compare  body = .npz with ``ref``, ``dist_a``, ``dist_b``
                   -> {"preference": <float>}  (sigmoid(q_a - q_b))
    GET  /healthz  -> {"ok": true, "served": N, ...}

Example:
    scorer = VTAMIQScorer.from_checkpoint("best.npz")
    server = ScoringServer(scorer, port=8080, max_batch=16)
    server.start()            # non-blocking; server.stop() to shut down
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from concurrent.futures import TimeoutError as _FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .inference import VTAMIQScorer, preference_from_scores


def _batch_ladder(max_batch: int) -> List[int]:
    """1, 2, 4, ... up to max_batch (compile-once sizes)."""
    ladder, b = [], 1
    while b < max_batch:
        ladder.append(b)
        b *= 2
    ladder.append(max_batch)
    return ladder


class QueueFullError(RuntimeError):
    """Request queue at capacity — retryable overload (HTTP 503)."""


class UnknownShapeError(ValueError):
    """Image shape not pre-compiled and restrict_to_warmed is on."""


class MicroBatcher:
    """Thread-safe request coalescer in front of a VTAMIQScorer.

    ``submit`` returns a Future resolving to the scalar q for that pair.
    The dispatcher groups queued requests by image (H, W) (shape-static
    executables), pads each group up to the nearest ladder size by
    repeating the last pair, scores ONE device batch, and resolves the
    futures. Exceptions propagate to the affected requests' futures.
    """

    def __init__(self, scorer: VTAMIQScorer, max_batch: int = 16,
                 max_wait_ms: float = 5.0, max_queue: int = 1024,
                 restrict_to_warmed: bool = False):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.scorer = scorer
        self.max_batch = int(max_batch)
        self.max_wait_s = max(0.0, float(max_wait_ms) / 1e3)
        self.ladder = _batch_ladder(self.max_batch)
        self.restrict_to_warmed = bool(restrict_to_warmed)
        self._warmed_shapes: set = set()
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._lock = threading.Lock()  # one device batch in flight at a time
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats = {"served": 0, "batches": 0, "padded_slots": 0,
                      "errors": 0, "rejected": 0}

    # -- public ---------------------------------------------------------------

    def start(self) -> "MicroBatcher":
        t = self._thread
        if t is not None and t.is_alive():
            if self._stop.is_set():
                # a timed-out stop() left the old loop draining; spawning a
                # second dispatcher would split batches permanently
                raise RuntimeError(
                    "previous stop() timed out and its dispatcher is still "
                    "running; wait for it to exit before restarting")
            return self  # already running
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0):
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout)
            if not t.is_alive():
                self._thread = None
            # else: keep the handle — start() must not run two loops
        # never abandon a pending future: callers blocked in result() with
        # no timeout would hang forever. Two passes: submit() checks _stop
        # before enqueuing, but a request racing the flag can still land
        # after the first drain.
        for _ in range(2):
            while True:
                try:
                    (_r, _d, fut) = self._queue.get_nowait()
                except queue.Empty:
                    break
                try:
                    if not fut.done():
                        fut.set_exception(RuntimeError("batcher stopped"))
                except InvalidStateError:
                    pass  # caller cancelled between the check and here
            time.sleep(0.01)

    def _exec_key(self, shape) -> tuple:
        """The executable the request will compile/run: its canonical bucket
        when the scorer has size_buckets, else the exact (H, W). Duck-typed
        so minimal scorer stand-ins (tests) need no bucket support."""
        f = getattr(self.scorer, "executable_key", None)
        if f is not None:
            return tuple(f(int(shape[0]), int(shape[1])))
        return (int(shape[0]), int(shape[1]))

    def submit(self, ref: np.ndarray, dist: np.ndarray) -> "Future[float]":
        if ref.shape != dist.shape:
            raise ValueError(f"ref {ref.shape} != dist {dist.shape}")
        if self._stop.is_set():
            # stopping/stopped: nothing will ever service the future — fail
            # retryable instead of handing out a hang (stop() double-drains
            # to catch the remaining enqueue race)
            self.stats["rejected"] += 1
            raise QueueFullError("batcher is stopped; retry later")
        if self.restrict_to_warmed and \
                self._exec_key(ref.shape) not in self._warmed_shapes:
            self.stats["rejected"] += 1
            raise UnknownShapeError(
                f"image shape {ref.shape[:2]} maps to no pre-compiled "
                f"executable (warmed: {sorted(self._warmed_shapes)}); "
                f"warmup() it, add a covering size bucket, or construct "
                f"with restrict_to_warmed=False")
        fut: "Future[float]" = Future()
        try:
            # non-blocking: a full queue must fail FAST (503) — a blocking
            # put would park handler threads before their timeout even starts
            self._queue.put_nowait((ref, dist, fut))
        except queue.Full:
            self.stats["rejected"] += 1
            raise QueueFullError(
                f"request queue full ({self._queue.maxsize}); retry later")
        return fut

    def score(self, ref: np.ndarray, dist: np.ndarray,
              timeout: Optional[float] = None) -> float:
        fut = self.submit(ref, dist)
        try:
            return fut.result(timeout)
        except _FuturesTimeout:
            # abandon the request: a still-queued future cancels (and
            # _score_group drops it before padding), so sustained overload
            # doesn't keep the device scoring work no caller waits on
            fut.cancel()
            raise

    def warmup(self, h: int, w: int,
               batch_sizes: Optional[Sequence[int]] = None):
        """Pre-compile the (h, w) pipelines at the ladder batch sizes so the
        first real request doesn't pay the XLA compile (minutes on remote
        -compile TPU setups). Call once per expected image shape; with
        ``restrict_to_warmed`` only warmed shapes are accepted afterwards."""
        key = self._exec_key((h, w))
        zero = np.zeros((key[0], key[1], 3), np.float32)
        for b in (batch_sizes if batch_sizes is not None else self.ladder):
            with self._lock:
                self.scorer.score_batch([zero] * b, [zero] * b)
        self._warmed_shapes.add(key)

    # -- dispatcher -----------------------------------------------------------

    def _drain(self) -> List[tuple]:
        """Block for one request, then keep taking more until max_batch or
        until max_wait_s has elapsed SINCE THE FIRST request (a fixed
        window — bounded worst-case queueing latency per batch)."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            # group by EXECUTABLE, not exact shape: with size buckets,
            # mixed-size traffic coalesces into shared padded batches
            by_exec = {}
            for item in items:
                by_exec.setdefault(self._exec_key(item[0].shape), []).append(item)
            for group in by_exec.values():
                self._score_group(group)

    def _score_group(self, group: List[tuple]):
        # timed-out/abandoned callers cancelled their futures while queued;
        # don't pay device work (or pad slots) for them
        group = [g for g in group if not g[2].cancelled()]
        if not group:
            return
        refs = [g[0] for g in group]
        dists = [g[1] for g in group]
        target = next(b for b in self.ladder if b >= len(group))
        pad = target - len(group)
        if pad:  # ladder padding -> bounded executable set
            refs = refs + [refs[-1]] * pad
            dists = dists + [dists[-1]] * pad
        try:
            with self._lock:
                qs = self.scorer.score_batch(refs, dists)
            for (_r, _d, fut), q in zip(group, qs):
                # per-future guard: a caller-cancelled future must not
                # poison the rest of the batch. The done() check alone
                # races with score()'s timeout cancel (cancel can land
                # between the check and set_result), so the
                # InvalidStateError is also swallowed per-future.
                try:
                    if not fut.done() and not fut.cancelled():
                        fut.set_result(float(q))
                except InvalidStateError:
                    pass  # caller abandoned it mid-resolve
            self.stats["served"] += len(group)
            self.stats["batches"] += 1
            self.stats["padded_slots"] += pad
        except Exception as e:  # surface to every affected caller
            self.stats["errors"] += 1
            for (_r, _d, fut) in group:
                try:
                    if not fut.done():
                        fut.set_exception(e)
                except InvalidStateError:
                    pass  # cancelled mid-resolve; an escape here would
                    # kill the dispatcher thread for every later request


# --------------------------------------------------------------------------
# HTTP front end
# --------------------------------------------------------------------------

def _load_npz(body: bytes, names: Sequence[str]) -> Tuple[np.ndarray, ...]:
    """uint8 arrays pass through UNCONVERTED (VTAMIQScorer treats uint8 as
    0-255 image data on every path; with ``ingest_uint8`` they ship to the
    device as-is — 4x smaller payloads AND 4x less device ingest). Anything
    else coerces to fp32 [0, 1]."""
    data = np.load(io.BytesIO(body))
    missing = [n for n in names if n not in data]
    if missing:
        raise KeyError(f"npz body missing arrays: {missing}")
    out = []
    for n in names:
        arr = data[n]
        arr = arr if arr.dtype == np.uint8 else np.asarray(arr, np.float32)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"array {n!r} must be (H, W, 3), got {arr.shape}")
        out.append(arr)
    return tuple(out)


class _Handler(BaseHTTPRequestHandler):
    server_version = "vtamiq-tpu"

    # attached by ScoringServer
    batcher: MicroBatcher = None
    request_timeout_s: float = 60.0
    max_body_bytes: int = 256 << 20  # an unbounded Content-Length read
    # would let one request OOM the process (and a killed TPU-attached
    # process wedges the chip claim — CLAUDE.md env rule 2)

    def log_message(self, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, {"ok": True, **self.batcher.stats})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length > self.max_body_bytes:
                self._reply(413, {"error": f"body {length} bytes exceeds "
                                           f"limit {self.max_body_bytes}"})
                return
            body = self.rfile.read(length)
            if self.path == "/score":
                ref, dist = _load_npz(body, ("ref", "dist"))
                q = self.batcher.score(ref, dist,
                                       timeout=self.request_timeout_s)
                self._reply(200, {"q": q})
            elif self.path == "/compare":
                ref, da, db = _load_npz(body, ("ref", "dist_a", "dist_b"))
                fa = self.batcher.submit(ref, da)
                try:
                    fb = self.batcher.submit(ref, db)
                except Exception:
                    # half-enqueued compare (queue filled between the two
                    # submits): don't leave the first request consuming a
                    # device slot nobody will read
                    fa.cancel()
                    raise
                # ONE deadline for the whole request: sequential full
                # timeouts would block the handler up to 2x the advertised
                # budget under first-compile/overload latency
                deadline = time.monotonic() + self.request_timeout_s
                try:
                    qa = fa.result(max(0.0, deadline - time.monotonic()))
                    qb = fb.result(max(0.0, deadline - time.monotonic()))
                except _FuturesTimeout:
                    fa.cancel()
                    fb.cancel()
                    raise
                self._reply(200, {"preference": preference_from_scores(qa, qb),
                                  "q_a": qa, "q_b": qb})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})
        except (TimeoutError, _FuturesTimeout, QueueFullError) as e:
            # overload / first-compile latency: retryable, not a client
            # error (concurrent.futures.TimeoutError only aliases the
            # builtin on py3.11+, hence the explicit pair)
            self._reply(503, {"error": f"{type(e).__name__}: {e}"})
        except (UnknownShapeError, KeyError, ValueError) as e:
            # malformed payload / unserveable shape: genuinely the client's
            self._reply(400, {"error": f"{type(e).__name__}: {e}"})
        except Exception as e:
            # scorer/device failure (e.g. transient 'UNAVAILABLE: TPU device
            # error'): server-side and retryable — a 400 here would teach
            # well-behaved clients NOT to retry transient device faults
            self._reply(502, {"error": f"{type(e).__name__}: {e}"})


class ScoringServer:
    """Threaded HTTP server wrapping a MicroBatcher (stdlib only)."""

    def __init__(self, scorer: VTAMIQScorer, host: str = "127.0.0.1",
                 port: int = 8080, max_batch: int = 16,
                 max_wait_ms: float = 5.0, request_timeout_s: float = 60.0,
                 max_queue: int = 1024, restrict_to_warmed: bool = False,
                 max_body_bytes: int = 256 << 20):
        self.batcher = MicroBatcher(scorer, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms,
                                    max_queue=max_queue,
                                    restrict_to_warmed=restrict_to_warmed)
        handler = type("BoundHandler", (_Handler,), {
            "batcher": self.batcher,
            "request_timeout_s": request_timeout_s,
            "max_body_bytes": int(max_body_bytes),
        })
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self.httpd.server_address[:2]

    def warmup(self, h: int, w: int,
               batch_sizes: Optional[Sequence[int]] = None) -> "ScoringServer":
        """Pre-compile pipelines for (h, w) before taking traffic."""
        self.batcher.warmup(h, w, batch_sizes)
        return self

    def start(self) -> "ScoringServer":
        self.batcher.start()
        if self._thread is None:
            self._thread = threading.Thread(target=self.httpd.serve_forever,
                                            daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(5.0)
            self._thread = None
        self.batcher.stop()
