"""Online (streaming) inference over one video stream.

Beyond-reference serving capability. The reference driver requires the
whole decoded video in memory before inference starts
(AFSD/thumos14/test.py:203-256 loads the full npy, then loops windows);
here frames arrive in chunks (a live capture, a decoder pipe, a
network stream), each sliding window runs as soon as its frames exist,
and `finalize()` reproduces the offline pipeline's proposals for the
whole stream — same window offsets (incl. the irregular tail window,
test.py:48-56), same post-processing path (host soft-NMS or the fused
device post), same numbers up to the packed path's batch-tiling float
noise (tests/test_streaming.py).

Memory is bounded: consumed frames are trimmed from the buffer as soon
as no future window can read them (O(clip_length + chunk) resident
frames for any stream length), and every forward runs one fixed
(max_batch, clip, H, W, C) uint8 graph, so an unbounded stream
compiles exactly one forward XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from opental_tpu.data import transforms
from opental_tpu.infer.pipeline import InferencePipeline, window_offsets

_ROW_KEYS = ('segments', 'scores', 'uncertainty', 'actionness')


class StreamingSession:
    """Incremental window-batched inference for one video stream.

    Wraps an `InferencePipeline` (default per-window semantics: no
    shared_backbone / device_ingest / fusion) and drives its packed
    uint8 forward (`_packed_forward`) with fixed-shape batches.

    Usage::

        sess = StreamingSession(pipe, sample_fps=10.0)
        for chunk in frame_source:       # (n, H, W, C) uint8 chunks
            sess.feed(chunk)
        proposals = sess.finalize()      # == pipe.run_video(whole)
    """

    def __init__(self, pipe: InferencePipeline, sample_fps: float,
                 max_batch: int = 8, name: str = 'stream'):
        assert not pipe.shared_backbone and not pipe.device_ingest, \
            'streaming drives the default per-window semantics'
        assert pipe.flow_model is None, \
            'streaming is single-stream (no RGB+flow fusion)'
        if pipe.mesh is not None:
            assert max_batch % pipe.mesh.size == 0, \
                'max_batch must be a mesh-size multiple'
        self.pipe = pipe
        self.sample_fps = sample_fps
        self.max_batch = max_batch
        self.name = name
        self.clip = pipe.clip_length
        self.stride = pipe.stride

        # frame ring: _buf[i] holds stream frame _base + i
        self._buf: Optional[np.ndarray] = None
        self._base = 0                 # stream index of _buf[0]
        self._t = 0                    # total frames received
        self._next_off = 0             # next regular window offset
        self._queue: List[np.ndarray] = []   # assembled windows (uint8)
        self._windows_run = 0
        self._got: Dict[str, List[np.ndarray]] = {k: [] for k in _ROW_KEYS}
        self._final: Optional[List[Dict[str, Any]]] = None

    # ---- frame buffer -------------------------------------------------

    def _append(self, frames: np.ndarray) -> None:
        n = frames.shape[0]
        used = self._t - self._base
        if self._buf is None:
            cap = max(4 * self.clip, 2 * n)
            self._buf = np.empty((cap,) + frames.shape[1:], np.uint8)
        elif used + n > self._buf.shape[0]:
            cap = max(2 * self._buf.shape[0], used + n)
            grown = np.empty((cap,) + self._buf.shape[1:], np.uint8)
            grown[:used] = self._buf[:used]
            self._buf = grown
        self._buf[used:used + n] = frames
        self._t += n

    def _trim(self) -> None:
        """Drop frames no future window can read: every regular window
        from `_next_off` on, and the tail window, which starts at
        (final_count - clip) >= _t - clip for any final count >= _t."""
        keep_from = min(self._next_off, max(0, self._t - self.clip))
        if keep_from > self._base:
            used = self._t - self._base
            drop = keep_from - self._base
            self._buf[:used - drop] = self._buf[drop:used]
            self._base = keep_from

    def _window(self, off: int, valid_end: int) -> np.ndarray:
        """Assemble the uint8 window at stream offset `off`, zero-padded
        past `valid_end` (the normalized pad is exactly 0.0 in [-1, 1]
        space, matching stack_windows_u8)."""
        lo = off - self._base
        avail = min(self.clip, max(0, valid_end - off))
        out = np.zeros((self.clip,) + self._buf.shape[1:], np.uint8)
        out[:avail] = self._buf[lo:lo + avail]
        return out

    # ---- forward ------------------------------------------------------

    def _run(self, windows: List[np.ndarray],
             valids: List[int]) -> None:
        """One fixed-shape packed forward: always pads to max_batch so
        the whole stream uses a single compiled graph."""
        n = len(windows)
        batch = np.zeros((self.max_batch, self.clip)
                         + self._buf.shape[1:], np.uint8)
        valid = np.zeros((self.max_batch,), np.int32)
        for i, (w, v) in enumerate(zip(windows, valids)):
            batch[i] = w
            valid[i] = v
        dec = self.pipe._packed_forward(self.pipe.variables,
                                        jnp.asarray(batch),
                                        jnp.asarray(valid))
        rows = (dec.segments, dec.scores, dec.uncertainty, dec.actionness)
        for key, arr in zip(_ROW_KEYS, rows):
            if arr is not None:
                self._got[key].append(np.asarray(arr[:n]))
        self._windows_run += n

    def _drain(self, flush: bool = False) -> None:
        while len(self._queue) >= self.max_batch or (flush and self._queue):
            take = self._queue[:self.max_batch]
            self._queue = self._queue[self.max_batch:]
            self._run([w for w, _ in take], [v for _, v in take])

    # ---- public API ---------------------------------------------------

    @property
    def frames_received(self) -> int:
        return self._t

    @property
    def windows_processed(self) -> int:
        return self._windows_run

    @property
    def frames_resident(self) -> int:
        """Frames currently held (bounded for any stream length)."""
        return self._t - self._base

    def feed(self, frames: np.ndarray) -> int:
        """Add a chunk of (n, H, W, C) uint8 frames (any n >= 1; frames
        larger than the pipeline crop are center-cropped). Returns the
        number of windows whose forward ran during this call."""
        assert self._final is None, 'session already finalized'
        from opental_tpu.infer.pipeline import _require_u8
        _require_u8(frames, 'stream frames')
        before = self._windows_run
        self._append(transforms.center_crop(frames, self.pipe.crop_size))
        while self._next_off + self.clip <= self._t:
            self._queue.append((self._window(self._next_off, self._t),
                                self.clip))
            self._next_off += self.stride
        self._drain()
        self._trim()
        return self._windows_run - before

    def preview(self) -> List[Dict[str, Any]]:
        """Proposals from the windows completed so far — a mid-stream
        snapshot for live consumers (post-processing runs on the
        partial window set; state is not consumed). `finalize()` still
        produces the exact full-stream result afterwards."""
        assert self._final is None, 'session already finalized'
        if self._windows_run == 0:
            return []
        offsets = [i * self.stride for i in range(self._windows_run)]
        vid = {'name': self.name, 'offsets': offsets,
               'fps': self.sample_fps, 'need': 0,
               'got': {k: list(v) for k, v in self._got.items()}}
        results: Dict[str, List[Dict[str, Any]]] = {}
        self.pipe._finish_packed(vid, results)
        return results[self.name]

    def finalize(self, sample_count: Optional[int] = None
                 ) -> List[Dict[str, Any]]:
        """Run the remaining windows (incl. the irregular tail window
        and the zero-padded short-stream window) and post-process the
        whole stream. Returns the same proposal dicts as
        `InferencePipeline.run_video` on the full video; idempotent."""
        if self._final is not None:
            return self._final
        assert self._t > 0, 'no frames were fed'
        count = self._t if sample_count is None else sample_count
        assert count >= self._t, \
            'sample_count below received frames: feed fewer frames instead'
        offsets = window_offsets(count, self.clip, self.stride)
        # feed() already ran every stride-aligned offset below _next_off;
        # what remains is the irregular tail window (not stride-aligned,
        # so never queued — and it starts BELOW _next_off whenever the
        # last regular window ends past it) plus, when count > _t,
        # regular offsets whose frames never fully arrived
        for off in offsets:
            if off % self.stride != 0 or off >= self._next_off:
                self._queue.append((self._window(off, self._t),
                                    min(self.clip,
                                        max(0, self._t - off))))
        self._drain(flush=True)
        vid = {'name': self.name, 'offsets': offsets, 'fps':
               self.sample_fps, 'need': 0, 'got': self._got}
        results: Dict[str, List[Dict[str, Any]]] = {}
        self.pipe._finish_packed(vid, results)
        self._final = results[self.name]
        return self._final
