"""Streaming runtime: multi-camera ingest -> batched device detection.

This is the TPU-native replacement for the reference's synchronous webcam
loop (reference examples/webcam_kamera.rs:28-77): instead of
capture -> detect -> draw one frame at a time, producers push frames into
native lock-free ring buffers (C++, native/stream_buffer.cpp), a batch
assembler packs them into fixed-shape (B, H, W) batches, and the jitted
detect(+pose) program runs on the device while the next batch is being
assembled (double-buffered host pipeline).  Covers BASELINE config 5
(4x concurrent 1080p@60fps streams, mixed per-stream dictionaries by
running one StreamPipeline per dictionary).

The native library is built by tools/build_native.sh; when it is absent
(fresh checkout), a pure-numpy fallback with identical semantics keeps the
API usable (slower, still correct).
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "lib", "libaruco3stream.so"
)


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stream_ring_create.restype = ctypes.c_void_p
    lib.stream_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.stream_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.stream_ring_push.restype = ctypes.c_uint64
    lib.stream_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.stream_ring_pop.restype = ctypes.c_int64
    lib.stream_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.stream_ring_size.restype = ctypes.c_int64
    lib.stream_ring_size.argtypes = [ctypes.c_void_p]
    lib.stream_ring_dropped.restype = ctypes.c_uint64
    lib.stream_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.stream_ring_enqueued.restype = ctypes.c_uint64
    lib.stream_ring_enqueued.argtypes = [ctypes.c_void_p]
    lib.batch_assemble.restype = ctypes.c_int64
    lib.batch_assemble.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rgb_to_luma_u8.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    return lib


_LIB = _load_lib()


class FrameRing:
    """Fixed-shape frame ring with drop-oldest backpressure.

    Native (lock-free C++) when the shared library is built; numpy+lock
    fallback otherwise.
    """

    def __init__(self, frame_shape: tuple[int, ...], capacity: int = 8):
        self.frame_shape = tuple(frame_shape)
        self.slot_bytes = int(np.prod(frame_shape))
        self.capacity = capacity
        if _LIB is not None:
            self._h = _LIB.stream_ring_create(self.slot_bytes, capacity)
            self._native = True
        else:
            self._native = False
            self._buf = [None] * capacity
            self._seq = [0] * capacity
            self._head = 0
            self._tail = 0
            self._next_seq = 0
            self._dropped = 0
            self._enq = 0
            self._lock = threading.Lock()

    def push(self, frame: np.ndarray) -> int:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.shape == self.frame_shape, (
            frame.shape,
            self.frame_shape,
        )
        if self._native:
            return int(
                _LIB.stream_ring_push(
                    self._h, frame.ctypes.data_as(ctypes.c_char_p)
                )
            )
        with self._lock:
            if self._head - self._tail >= self.capacity:
                self._tail += 1
                self._dropped += 1
            slot = self._head % self.capacity
            self._buf[slot] = frame.copy()
            self._seq[slot] = self._next_seq
            self._next_seq += 1
            self._head += 1
            self._enq += 1
            return self._next_seq - 1

    def pop(self) -> tuple[np.ndarray, int] | None:
        if self._native:
            out = np.empty(self.frame_shape, dtype=np.uint8)
            seq = int(
                _LIB.stream_ring_pop(
                    self._h, out.ctypes.data_as(ctypes.c_char_p)
                )
            )
            if seq < 0:
                return None
            return out, seq
        with self._lock:
            if self._tail >= self._head:
                return None
            slot = self._tail % self.capacity
            out = self._buf[slot]
            seq = self._seq[slot]
            self._tail += 1
            return out, seq

    def __len__(self) -> int:
        if self._native:
            return int(_LIB.stream_ring_size(self._h))
        with self._lock:
            return self._head - self._tail

    @property
    def dropped(self) -> int:
        if self._native:
            return int(_LIB.stream_ring_dropped(self._h))
        return self._dropped

    @property
    def enqueued(self) -> int:
        if self._native:
            return int(_LIB.stream_ring_enqueued(self._h))
        return self._enq

    def __del__(self):
        if getattr(self, "_native", False) and _LIB is not None:
            _LIB.stream_ring_destroy(self._h)


def assemble_batch(
    rings: list[FrameRing], batch: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Round-robin rings into a (batch, *frame_shape) array.

    Returns (frames, stream_ids, seqs, n_real); padding lanes carry
    stream_id == -1 and repeat the last real frame.
    """
    shape = rings[0].frame_shape
    out = np.zeros((batch,) + shape, dtype=np.uint8)
    ids = np.full(batch, -1, dtype=np.int64)
    seqs = np.full(batch, -1, dtype=np.int64)
    if _LIB is not None and all(r._native for r in rings):
        handles = (ctypes.c_void_p * len(rings))(
            *[r._h for r in rings]
        )
        n = int(
            _LIB.batch_assemble(
                handles,
                len(rings),
                batch,
                out.ctypes.data_as(ctypes.c_char_p),
                rings[0].slot_bytes,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
        )
        return out, ids, seqs, n
    # Fallback: same round-robin semantics in Python.
    filled = 0
    start = 0
    while filled < batch:
        progress = False
        for i in range(len(rings)):
            if filled >= batch:
                break
            item = rings[(start + i) % len(rings)].pop()
            if item is None:
                continue
            frame, seq = item
            out[filled] = frame
            ids[filled] = (start + i) % len(rings)
            seqs[filled] = seq
            filled += 1
            progress = True
        start = (start + 1) % len(rings)
        if not progress:
            break
    for j in range(filled, batch):
        if filled > 0:
            out[j] = out[filled - 1]
    return out, ids, seqs, filled


def rgb_to_luma_host(rgb: np.ndarray) -> np.ndarray:
    """Host-side Rec.709 luma (native when available); matches
    frontend.rgb_to_luma_u8."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    c = rgb.shape[-1]
    n = int(np.prod(rgb.shape[:-1]))
    out = np.empty(rgb.shape[:-1], dtype=np.uint8)
    if _LIB is not None and c in (3, 4):
        _LIB.rgb_to_luma_u8(
            rgb.ctypes.data_as(ctypes.c_char_p),
            out.ctypes.data_as(ctypes.c_char_p),
            n,
            c,
        )
        return out
    w = np.array([0.212671, 0.715160, 0.072169])
    luma = (rgb[..., :3].astype(np.float64) * w).sum(-1)
    return np.round(luma).astype(np.uint8)


@dataclass
class StreamStats:
    batches: int = 0
    frames: int = 0
    padded: int = 0
    results_dropped: int = 0
    detect_seconds: float = 0.0
    per_stream_dropped: dict = field(default_factory=dict)


class StreamPipeline:
    """Multi-stream detect(+pose) pipeline.

    Producers call ``push(stream_idx, frame)``; a worker thread assembles
    batches and runs the detector's compiled batch program; results (device
    outputs + provenance) arrive on ``results`` as dicts.  Double-buffered:
    batch N+1 assembles on the host while batch N runs on the device.
    """

    def __init__(
        self,
        detector,
        frame_shape: tuple[int, int],
        n_streams: int = 4,
        batch: int = 8,
        ring_capacity: int = 8,
    ):
        self.detector = detector
        self.rings = [
            FrameRing(frame_shape, ring_capacity) for _ in range(n_streams)
        ]
        self.batch = batch
        self.frame_shape = frame_shape
        self.results: queue.Queue = queue.Queue(maxsize=4)
        self.stats = StreamStats()
        self._stop = threading.Event()
        self._worker = None

    def push(self, stream_idx: int, frame: np.ndarray) -> int:
        return self.rings[stream_idx].push(frame)

    def start(self):
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stop(self):
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=10)

    # The three pipeline hooks below are what tests override to measure
    # the overlap property with synthetic timings.
    def _assemble(self):
        return assemble_batch(self.rings, self.batch)

    def _dispatch(self, frames: np.ndarray):
        """Enqueue one batch on the device; returns without waiting (jax
        dispatch is asynchronous)."""
        import jax.numpy as jnp

        return self.detector.detect_batch(jnp.asarray(frames))

    def _sync(self, out) -> None:
        """Block until a dispatched batch has completed on the device.
        block_until_ready is unreliable through the remote-TPU relay; a
        1-element fetch drains the FIFO queue."""
        import jax.numpy as jnp

        _ = np.asarray(jnp.ravel(out["marker_valid"])[:1])

    def _run(self):
        # Double-buffered: batch N runs on the device while batch N+1
        # assembles on the host; N is only synced after N+1 has been
        # assembled and dispatched behind it (the device queue is FIFO).
        pending = None  # (t_dispatch, outputs, ids, seqs, n)
        while not self._stop.is_set():
            frames, ids, seqs, n = self._assemble()
            if n == 0 and pending is None:
                time.sleep(0.001)
                continue
            fresh = None
            if n > 0:
                t0 = time.perf_counter()
                out = self._dispatch(frames)
                fresh = (t0, out, ids, seqs, n)
            if pending is not None:
                self._complete(pending)
            pending = fresh
        if pending is not None:
            self._complete(pending)

    def _complete(self, pending) -> None:
        t0, out, ids, seqs, n = pending
        self._sync(out)
        self.stats.detect_seconds += time.perf_counter() - t0
        self.stats.batches += 1
        self.stats.frames += n
        self.stats.padded += self.batch - n
        item = {"outputs": out, "stream_ids": ids, "seqs": seqs, "n": n}
        # Drop-oldest when the consumer lags (live streams must not
        # stall the device loop behind a slow consumer).
        while True:
            try:
                self.results.put_nowait(item)
                break
            except queue.Full:
                try:
                    self.results.get_nowait()
                    self.stats.results_dropped += 1
                except queue.Empty:
                    pass

    def drain(self, max_items: int = 64):
        items = []
        try:
            while len(items) < max_items:
                items.append(self.results.get_nowait())
        except queue.Empty:
            pass
        return items
