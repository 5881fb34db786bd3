"""Window-batched video inference pipeline.

Reference: the THUMOS test driver (AFSD/thumos14/test.py:203-256) runs one
sequential GPU forward per 256-frame window, then CPU soft-NMS. Here all
windows of a video stack into one (W, T, H, W, C) batch for a single
jitted forward+decode (bucketed W to bound recompiles), and only the
per-class NMS gather is host-side numpy. Output JSON is bit-compatible
with test.py:254-256.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.data import transforms
from opental_tpu.data.prefetch import prefetch
from opental_tpu.infer.decode import decode_windows, fuse_streams
from opental_tpu.ops.nms import soft_nms_numpy


def window_offsets(sample_count: int, clip_length: int,
                   stride: int) -> List[int]:
    """Sliding-window offsets incl. the tail window (test.py:48-56)."""
    if sample_count < clip_length:
        return [0]
    offsets = list(range(0, sample_count - clip_length + 1, stride))
    if (sample_count - clip_length) % stride:
        offsets.append(sample_count - clip_length)
    return offsets


def _bucket(n: int, granule: int = 8) -> int:
    return max(granule, ((n + granule - 1) // granule) * granule)


@functools.lru_cache(maxsize=1)
def _jitted_device_nms():
    from opental_tpu.ops.nms import soft_nms_device
    return jax.jit(soft_nms_device, static_argnames=('sigma', 'top_k'))


def device_windows(video_u8, offsets, frames_valid, clip_length: int):
    """Device-side window gather + normalization.

    video_u8: (Tp, H, W, C) uint8 (temporally padded); offsets: (Wc,)
    int32; frames >= frames_valid zero out after normalization — bit
    parity with the host stack_windows (pad value 0.0 in [-1, 1] space,
    test.py:67-76). Transferring the raw uint8 video once and slicing
    on device moves 8x fewer bytes than stacked float32 windows (4x
    dtype, 2x window overlap) and takes the normalize off the host.

    frames_valid may be a scalar (one video) or a (Wc,) vector: with a
    per-window valid end, windows from DIFFERENT videos can share one
    packed frame buffer (run_videos device_ingest) — a window that
    reads past its video's end zero-masks the next video's frames,
    reproducing per-video zero padding exactly. A window with valid=0
    is all-zero (the packed tail pad rows).
    """
    import jax

    def one(o, valid):
        win = jax.lax.dynamic_slice(
            video_u8, (o,) + (0,) * (video_u8.ndim - 1),
            (clip_length,) + video_u8.shape[1:])
        idx = o + jnp.arange(clip_length)
        x = (win.astype(jnp.float32) / 255.0) * 2.0 - 1.0
        return jnp.where((idx < valid)[:, None, None, None], x, 0.0)

    fv = jnp.broadcast_to(frames_valid, offsets.shape)
    return jax.vmap(one)(offsets, fv)


def stack_windows(data: np.ndarray, offsets: Sequence[int],
                  clip_length: int, pad_value: float = 0.0,
                  bucket: int = 8) -> np.ndarray:
    """(T, H, W, C) uint8 video -> (W_padded, clip, H, W, C) float32 in
    [-1, 1]; zero-pads short tails (test.py:67-76) and pads the window
    count to a bucket size to bound jit recompiles."""
    t, h, w, c = data.shape
    n = len(offsets)
    n_pad = _bucket(n, bucket)
    out = np.full((n_pad, clip_length, h, w, c), pad_value, np.float32)
    for i, off in enumerate(offsets):
        clip = data[off:off + clip_length].astype(np.float32)
        clip = (clip / 255.0) * 2.0 - 1.0
        out[i, :clip.shape[0]] = clip
    return out


def _require_u8(data: np.ndarray, what: str = 'frames') -> None:
    """uint8-staging intake guard: numpy assignment of float frames into
    a np.uint8 buffer TRUNCATES silently (127.5 -> 127, which normalizes
    to -0.0039 instead of the reference pad's exact 0.0). Callers with
    float videos must ship raw uint8 + a padded sample_count instead
    (see tools/test_cross_data.py _anet_item_raw)."""
    if data.dtype != np.uint8:
        raise TypeError(
            f'uint8 staging requires raw uint8 {what}, got {data.dtype}; '
            'float frames would be silently truncated — ship the raw '
            'uint8 npy (pad via sample_count, not host pad values)')


def stack_windows_u8(data: np.ndarray, offsets: Sequence[int],
                     clip_length: int, bucket: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """stack_windows' uint8 twin for the packed path: raw bytes ship 4x
    smaller through the host->device link. Returns
    ((W_padded, clip, H, W, C) uint8, (W_padded,) int32 frames-valid);
    the jitted forward normalizes and zero-fills frames >= valid
    (ingest_windows), reproducing stack_windows' normalized zero tail pad
    (test.py:67-76) to <=1 ulp (XLA's jitted /255 lowering)."""
    _require_u8(data)
    t, h, w, c = data.shape
    n = len(offsets)
    n_pad = _bucket(n, bucket)
    out = np.zeros((n_pad, clip_length, h, w, c), np.uint8)
    valid = np.zeros((n_pad,), np.int32)
    for i, off in enumerate(offsets):
        clip = data[off:off + clip_length]
        out[i, :clip.shape[0]] = clip
        valid[i] = clip.shape[0]
    return out, valid


def stage_frames(buf: np.ndarray, chunk_frames: Optional[int] = 1024,
                 pad_to: Optional[int] = None):
    """Host->device uint8 frame staging. Splitting a big buffer into
    ~28 MB chunk device_puts reassembled by ONE on-device concatenate
    moves measurably faster through a slow link than one monolithic put
    (measured 21.6 vs 15.7 MB/s — scripts/probe_transfer.py, BASELINE.md
    "Transfer bandwidth"); chunk_frames=None restores the single put.

    pad_to zero-pads the frame axis ON DEVICE to the bucketed graph
    length, so the link never carries padding bytes — a short video
    bucketed to 1024/16384 frames previously shipped up to 78% zeros."""
    if pad_to is not None and pad_to < buf.shape[0]:
        raise ValueError(f'pad_to {pad_to} < frames {buf.shape[0]}')
    if chunk_frames is None or buf.shape[0] <= chunk_frames:
        dev = jnp.asarray(buf)
    else:
        n_ck = -(-buf.shape[0] // chunk_frames)
        parts = [jax.device_put(
            buf[i * chunk_frames:(i + 1) * chunk_frames])
            for i in range(n_ck)]
        dev = jnp.concatenate(parts)
    if pad_to is not None and pad_to > dev.shape[0]:
        dev = jnp.pad(dev, ((0, pad_to - dev.shape[0]),)
                      + ((0, 0),) * (dev.ndim - 1))
    return dev


def ingest_windows(clips_u8, valid):
    """Device half of stack_windows_u8: uint8 [0,255] -> f32 [-1,1] with
    frames >= valid zeroed (the reference's post-normalize zero pad)."""
    x = (clips_u8.astype(jnp.float32) / 255.0) * 2.0 - 1.0
    mask = jnp.arange(clips_u8.shape[1])[None, :] < valid[:, None]
    return jnp.where(mask[:, :, None, None, None], x, 0.0)


class InferencePipeline:
    """Jitted forward + decode over window batches for one model.

    Post-processing modes:
      * default — host numpy filtering + per-class soft-NMS (exact
        reference semantics, used by the parity tests);
      * device_nms — the candidate block of each class pads to a bucket
        and runs the bounded lax.while_loop kernel, still one dispatch
        per class;
      * device_post — ONE jitted call per video: per-class top-k
        candidate preselection + soft-NMS vmapped over all classes on
        device; the host only formats kept rows. This removes the
        serial host NMS (the reference's known hot spot,
        segment_utils.py:129) from the e2e path entirely.

    n_candidates bounds the per-class device_post preselect; the 2048
    default matches the THUMOS CLI (tools/test.py) — large enough that
    truncation was never observed on real score distributions
    (PARITY.md "Known deviations").
    """

    def __init__(self, model, variables, clip_length: int = 256,
                 stride: int = 128, crop_size: int = 96,
                 conf_thresh: float = 0.01, top_k: int = 5000,
                 nms_sigma: float = 0.5, use_edl: bool = False,
                 os_head: bool = False, use_gcpl: bool = False,
                 evidence: str = 'exp',
                 flow_model=None, flow_variables=None, mesh=None,
                 device_nms: bool = False, device_post: bool = False,
                 n_candidates: int = 2048, device_ingest: bool = False,
                 shared_backbone: bool = False, shared_group: int = 4):
        self.model = model
        self.variables = variables
        self.flow_model = flow_model
        self.flow_variables = flow_variables
        self.clip_length = clip_length
        self.stride = stride
        self.crop_size = crop_size
        self.conf_thresh = conf_thresh
        self.top_k = top_k
        self.nms_sigma = nms_sigma
        self.use_edl = use_edl
        self.os_head = os_head
        self.use_gcpl = use_gcpl
        self.evidence = evidence
        self.num_classes = model.head_classes
        self.mesh = mesh
        self.device_nms = device_nms
        self.device_post = device_post
        self.n_candidates = n_candidates
        self.device_ingest = device_ingest
        self._device_post_fn = None
        score_func = 'dirichlet' if use_edl else 'softmax'

        def forward_decode(variables, clips, flow_vars=None,
                           flow_clips=None):
            out = model.apply(variables, clips)
            if flow_model is not None and flow_clips is not None:
                flow_out = flow_model.apply(flow_vars, flow_clips)
                out = fuse_streams(out, flow_out)
            return decode_windows(out, clip_length, use_edl=use_edl,
                                  os_head=os_head, score_func=score_func,
                                  evidence=evidence, negate_conf=use_gcpl)

        def _no_plain_fusion(*a, **k):
            raise AssertionError('mesh + fusion inference must route the '
                                 'device_ingest paths')

        if mesh is not None and flow_model is not None:
            # two-stream fusion on the mesh runs ONLY via the twin-
            # buffer ingest forward below (both frame buffers + both
            # variable sets replicate, the window axis shards); the
            # plain window-staged forwards stay unreachable so a
            # mis-routed call fails loudly instead of dropping the flow
            # stream
            assert device_ingest, ('mesh + two-stream fusion requires '
                                   'device_ingest (twin-buffer ingest)')
            self._forward_decode = _no_plain_fusion
        elif mesh is not None:
            # shard the window axis across the data mesh: windows of one
            # video spread over chips (the workload's natural sequence
            # parallelism, SURVEY.md §5), params replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            from opental_tpu.parallel.mesh import DATA_AXIS
            sharded = jax.jit(
                lambda variables, clips: forward_decode(variables, clips),
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P(DATA_AXIS))),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
            self._forward_decode = \
                lambda v, c, fv=None, fc=None: sharded(v, c)
        else:
            self._forward_decode = jax.jit(forward_decode)

        self.shared_backbone = shared_backbone
        # windows per span in the shared-backbone path. k=4 measured
        # optimal at clip 256 / stride 128 (scripts/probe_span_batch.py):
        # larger k saves more backbone FLOPs but the long thin span maps
        # worse to the MXU than a wide window batch (k=16 is 0.77x).
        self.shared_group = shared_group
        # spans per forward call: chunk to bound HBM, bucket to bound
        # recompiles. 48 spans (192 windows) measured best on v5e —
        # 511.5 vs 484.9 clips/s at 32 spans (probe_span_batch; 56+
        # OOMs at compile; 40 hits a tiling dip, 415.7) — and exceeds
        # the per-window path's HBM ceiling of 128 windows in flight
        self.shared_max_groups = 48
        self._shared_forwards = {}
        if shared_backbone:
            assert flow_model is None or mesh is None, \
                'shared_backbone fusion runs are single-device'

        self._ingest_forward = None
        if device_ingest and flow_model is not None:
            # fusion ingest: both streams' raw frames stage once; the
            # SAME window offsets gather from each buffer but each
            # stream keeps its own frames-valid (TVL1 flow npys can be
            # one frame shorter than RGB)
            def ingest_fwd_fusion(variables, video_u8, offs, frames_valid,
                                  flow_vars, flow_u8, flow_valid):
                clips = device_windows(video_u8, offs, frames_valid,
                                       clip_length)
                fclips = device_windows(flow_u8, offs, flow_valid,
                                        clip_length)
                return forward_decode(variables, clips, flow_vars,
                                      fclips)

            if mesh is not None:
                # mesh fusion: twin frame buffers + both variable sets
                # replicate; window offsets and BOTH per-stream valids
                # shard over the data axis — the same window-axis
                # sequence parallelism as the single-stream ingest path
                from jax.sharding import NamedSharding, PartitionSpec as P

                from opental_tpu.parallel.mesh import DATA_AXIS
                rep = NamedSharding(mesh, P())
                shd = NamedSharding(mesh, P(DATA_AXIS))
                self._ingest_forward = jax.jit(
                    ingest_fwd_fusion,
                    in_shardings=(rep, rep, shd, shd, rep, rep, shd),
                    out_shardings=shd)
            else:
                self._ingest_forward = jax.jit(ingest_fwd_fusion)
        elif device_ingest:

            def ingest_fwd(variables, video_u8, offs, frames_valid):
                return forward_decode(
                    variables, device_windows(video_u8, offs,
                                              frames_valid, clip_length))

            if mesh is not None:
                # the frame buffer replicates; the window axis (offsets
                # + per-window valids) shards across the data mesh
                from jax.sharding import NamedSharding, PartitionSpec as P

                from opental_tpu.parallel.mesh import DATA_AXIS
                rep = NamedSharding(mesh, P())
                shd = NamedSharding(mesh, P(DATA_AXIS))
                self._ingest_forward = jax.jit(
                    ingest_fwd, in_shardings=(rep, rep, shd, shd),
                    out_shardings=shd)
            else:
                self._ingest_forward = jax.jit(ingest_fwd)

        # packed-path forward: raw uint8 window batches + per-window
        # frames-valid, normalized/zero-tailed on device (ingest_windows)
        # — 4x less transfer than the f32 staging it replaces
        def packed_forward(variables, clips_u8, valid, flow_vars=None,
                           flow_u8=None, fvalid=None):
            # flow keeps its own frames-valid: TVL1 flow npys can be one
            # frame shorter than the RGB stream, shifting tail pads
            clips = ingest_windows(clips_u8, valid)
            flow_clips = (None if flow_u8 is None
                          else ingest_windows(flow_u8, fvalid))
            return forward_decode(variables, clips, flow_vars, flow_clips)

        if mesh is not None and flow_model is not None:
            # see _no_plain_fusion above: mesh fusion routes ingest only
            self._packed_forward = _no_plain_fusion
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from opental_tpu.parallel.mesh import DATA_AXIS
            self._packed_forward = jax.jit(
                lambda variables, clips_u8, valid:
                packed_forward(variables, clips_u8, valid),
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P(DATA_AXIS)),
                              NamedSharding(mesh, P(DATA_AXIS))),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
        else:
            self._packed_forward = jax.jit(packed_forward)

    def run_video(self, data: np.ndarray, sample_count: int,
                  sample_fps: float, flow_data: Optional[np.ndarray] = None,
                  max_batch: int = 32) -> List[Dict[str, Any]]:
        """data: (T, H, W, C) uint8 full video. Returns the per-video
        proposal list (label idx, score, segment seconds, uncertainty,
        actionness)."""
        if self.shared_backbone:
            return self._run_video_shared(data, sample_count, sample_fps,
                                          flow_data=flow_data)
        data = transforms.center_crop(data, self.crop_size)
        offsets = window_offsets(sample_count, self.clip_length,
                                 self.stride)
        granule = self.mesh.size if self.mesh is not None else 8
        if self.mesh is not None:
            # the window axis buckets to mesh.size, but chunks split by
            # max_batch — a non-divisible max_batch would hand the data
            # axis a ragged tail chunk and fail with an opaque sharding
            # error (same guard as run_videos_ingest)
            assert max_batch % self.mesh.size == 0, \
                'max_batch must divide over the mesh data axis'

        if self.device_ingest:
            # ship the raw uint8 video once; gather + normalize windows
            # on device (8x fewer host->device bytes than f32 windows)
            t = data.shape[0]
            # the buffer must contain every window slice even when the
            # npy is shorter than sample_count (dynamic_slice clamps
            # starts, which would silently misalign the tail window)
            tt = max(t, sample_count)
            tpad = max(-(-tt // 1024) * 1024, self.clip_length)
            # ship only the real frames; the bucketed graph length pads
            # with device-side zeros (stage_frames pad_to)
            video_dev = stage_frames(np.ascontiguousarray(data),
                                     pad_to=tpad)
            flow_dev = None
            ffv = None
            if flow_data is not None:
                # fusion: the flow stream stages once too, same window
                # offsets, its own frames-valid (flow npys can be one
                # frame shorter than RGB)
                flow_data = transforms.center_crop(flow_data,
                                                   self.crop_size)
                tf_ = flow_data.shape[0]
                ftpad = max(-(-max(tf_, sample_count) // 1024) * 1024,
                            self.clip_length)
                flow_dev = stage_frames(np.ascontiguousarray(flow_data),
                                        pad_to=ftpad)
            n_pad = _bucket(len(offsets), granule)
            offs = np.zeros((n_pad,), np.int32)
            offs[:len(offsets)] = offsets
            # per-window valid vector (shardable over a mesh's window
            # axis; pad windows carry valid=0 -> all-zero input)
            fv = np.zeros((n_pad,), np.int32)
            fv[:len(offsets)] = min(t, sample_count)
            if flow_data is not None:
                ffv = np.zeros((n_pad,), np.int32)
                ffv[:len(offsets)] = min(tf_, sample_count)
            chunk_iter = [
                (None, (jnp.asarray(offs[i:i + max_batch]),
                        jnp.asarray(fv[i:i + max_batch]),
                        (None if ffv is None
                         else jnp.asarray(ffv[i:i + max_batch]))))
                for i in range(0, n_pad, max_batch)]
        else:
            clips = stack_windows(data, offsets, self.clip_length,
                                  bucket=granule)
            flow_clips = None
            if flow_data is not None:
                flow_data = transforms.center_crop(flow_data,
                                                   self.crop_size)
                flow_clips = stack_windows(flow_data, offsets,
                                           self.clip_length)
            chunk_iter = [(i, None)
                          for i in range(0, clips.shape[0], max_batch)]

        segs, scores, uncts, acts = [], [], [], []
        for i, off_chunk in chunk_iter:
            if self.device_ingest:
                offs_c, fv_c, ffv_c = off_chunk
                if flow_dev is not None:
                    dec = self._ingest_forward(
                        self.variables, video_dev, offs_c, fv_c,
                        self.flow_variables, flow_dev, ffv_c)
                else:
                    dec = self._ingest_forward(self.variables, video_dev,
                                               offs_c, fv_c)
            else:
                chunk = jnp.asarray(clips[i:i + max_batch])
                fchunk = (jnp.asarray(flow_clips[i:i + max_batch])
                          if flow_clips is not None else None)
                dec = self._forward_decode(self.variables, chunk,
                                           self.flow_variables, fchunk)
            if self.device_post:
                # stay on device; one fused post-process call below
                segs.append(dec.segments)
                scores.append(dec.scores)
                uncts.append(dec.uncertainty)
                acts.append(dec.actionness)
                continue
            segs.append(np.asarray(dec.segments))
            scores.append(np.asarray(dec.scores))
            uncts.append(None if dec.uncertainty is None
                         else np.asarray(dec.uncertainty))
            acts.append(None if dec.actionness is None
                        else np.asarray(dec.actionness))
        n = len(offsets)
        if self.device_post:
            from opental_tpu.infer.decode import DecodedWindows
            cat = (segs[0] if len(segs) == 1
                   else jnp.concatenate(segs))
            dec_all = DecodedWindows(
                cat,
                scores[0] if len(scores) == 1 else jnp.concatenate(scores),
                None if uncts[0] is None else (
                    uncts[0] if len(uncts) == 1 else jnp.concatenate(uncts)),
                None if acts[0] is None else (
                    acts[0] if len(acts) == 1 else jnp.concatenate(acts)))
            return self._post_process_on_device(dec_all, offsets,
                                                sample_fps, n)
        segments = np.concatenate(segs)[:n]
        conf = np.concatenate(scores)[:n]
        unct = (np.concatenate([u for u in uncts])[:n]
                if uncts[0] is not None else None)
        act = (np.concatenate([a for a in acts])[:n]
               if acts[0] is not None else None)

        # shift windows into video time, in seconds (test.py:120)
        off = np.asarray(offsets, np.float32)[:, None, None]
        seconds = (segments + off) / sample_fps
        return self._post_process(seconds, conf, unct, act)

    def run_videos(self, videos, max_batch: int = 128,
                   frames_capacity: int = 32768
                   ) -> Dict[str, List[Dict[str, Any]]]:
        """Packed cross-video inference: windows from consecutive videos
        pack into FULL forward batches of `max_batch`.

        The per-video path underfills the device on real datasets —
        short videos produce 4-32 window batches, and measured
        throughput falls with batch (W=32/64/96/128 -> 300/310/363/419
        clips/s, BASELINE.md "Window-batch sweep"). Packing keeps every
        forward at the throughput-optimal batch regardless of video
        length, with ONE jit graph shape for the whole run (the final
        partial batch zero-pads). Windows stage as RAW uint8 with
        per-window frames-valid and normalize on device
        (stack_windows_u8/ingest_windows) — 4x less host->device
        transfer than f32 staging. Results match per-video run_video:
        inference has no cross-window coupling (BN is frozen
        constants); only last-ulp float differences from batch tiling
        and the jitted /255 lowering remain (~1e-6 relative, tests).
        The reference processes one window at a time (test.py:227-235);
        this is the framework-native equivalent of its whole test loop.

        videos: iterable of (name, data, sample_count, sample_fps) or
        (..., flow_data) tuples; consumed lazily so callers can stream
        np.load one video at a time. Returns {name: proposals}.

        Routing: with shared_backbone the spans pack via
        run_videos_shared; with device_ingest the videos' raw frames
        pack into a contiguous device buffer via run_videos_ingest
        (each frame ships once — the fastest e2e mode on a
        transfer-bound link; fusion stages twin RGB/flow buffers);
        otherwise windows stage host-side as below.
        """
        if self.shared_backbone:
            return self.run_videos_shared(videos,
                                          frames_capacity=frames_capacity)
        if self.device_ingest:
            return self.run_videos_ingest(videos, max_batch=max_batch,
                                          frames_capacity=frames_capacity)
        fusion = self.flow_model is not None

        pending: List[Dict[str, Any]] = []   # FIFO of open videos
        buf: List[np.ndarray] = []           # queued uint8 window arrays
        vbuf: List[np.ndarray] = []          # per-window frames-valid
        fbuf: List[np.ndarray] = []
        fvbuf: List[np.ndarray] = []
        buffered = 0
        results: Dict[str, List[Dict[str, Any]]] = {}

        def cat_pad(arrs, pad_to, dtype):
            batch = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
            if pad_to is not None and batch.shape[0] < pad_to:
                pad = np.zeros((pad_to - batch.shape[0],)
                               + batch.shape[1:], dtype)
                batch = np.concatenate([batch, pad])
            return batch

        def flush(pad_to: Optional[int] = None):
            """Forward the queued windows (padding the tail batch; pad
            rows carry valid=0, i.e. all-zero normalized frames) and
            scatter decoded rows back to their videos in FIFO order."""
            nonlocal buf, vbuf, fbuf, fvbuf, buffered
            if buffered == 0:
                return
            batch = cat_pad(buf, pad_to, np.uint8)
            valid = cat_pad(vbuf, pad_to, np.int32)
            if fusion:
                fbatch = cat_pad(fbuf, pad_to, np.uint8)
                fvalid = cat_pad(fvbuf, pad_to, np.int32)
                dec = self._packed_forward(
                    self.variables, jnp.asarray(batch), jnp.asarray(valid),
                    self.flow_variables, jnp.asarray(fbatch),
                    jnp.asarray(fvalid))
            else:
                dec = self._packed_forward(
                    self.variables, jnp.asarray(batch), jnp.asarray(valid))
            rows = {
                'segments': np.asarray(dec.segments),
                'scores': np.asarray(dec.scores),
                'uncertainty': (None if dec.uncertainty is None
                                else np.asarray(dec.uncertainty)),
                'actionness': (None if dec.actionness is None
                               else np.asarray(dec.actionness)),
            }
            pos = 0
            for vid in pending:
                take = min(vid['need'], buffered - pos)
                if take <= 0:
                    break
                for key, arr in rows.items():
                    if arr is not None:
                        vid['got'][key].append(arr[pos:pos + take])
                vid['need'] -= take
                pos += take
            buf, vbuf, fbuf, fvbuf, buffered = [], [], [], [], 0
            while pending and pending[0]['need'] == 0:
                self._finish_packed(pending.pop(0), results)

        def split_queue(arrs, cap):
            """Split an exactly-`cap` window batch off the queue front;
            depends only on leading dims, so parallel queues (windows,
            valids, flow) split identically."""
            head, rest, acc = [], [], 0
            for a in arrs:
                if acc + a.shape[0] <= cap:
                    head.append(a)
                    acc += a.shape[0]
                elif acc < cap:
                    head.append(a[:cap - acc])
                    rest.append(a[cap - acc:])
                    acc = cap
                else:
                    rest.append(a)
            return head, rest

        for item in videos:
            name, data, sample_count, sample_fps = item[:4]
            flow_data = item[4] if fusion else None
            data = transforms.center_crop(data, self.crop_size)
            offsets = window_offsets(sample_count, self.clip_length,
                                     self.stride)
            clips, valid = stack_windows_u8(data, offsets,
                                            self.clip_length, bucket=1)
            if fusion:
                flow_data = transforms.center_crop(flow_data,
                                                   self.crop_size)
                fclips, fvalid = stack_windows_u8(flow_data, offsets,
                                                  self.clip_length,
                                                  bucket=1)
                fbuf.append(fclips)
                fvbuf.append(fvalid)
            buf.append(clips)
            vbuf.append(valid)
            buffered += clips.shape[0]
            pending.append({
                'name': name, 'offsets': offsets, 'fps': sample_fps,
                'need': len(offsets),
                'got': {k: [] for k in ('segments', 'scores',
                                        'uncertainty', 'actionness')}})
            while buffered >= max_batch:
                buf, rest = split_queue(buf, max_batch)
                vbuf, vrest = split_queue(vbuf, max_batch)
                if fusion:
                    fbuf, frest = split_queue(fbuf, max_batch)
                    fvbuf, fvrest = split_queue(fvbuf, max_batch)
                leftover = buffered - max_batch
                buffered = max_batch
                flush()
                buf, vbuf, buffered = rest, vrest, leftover
                if fusion:
                    fbuf, fvbuf = frest, fvrest
        flush(pad_to=max_batch)
        assert not pending, 'scheduler left unfinished videos'
        return results

    def _finish_packed(self, vid: Dict[str, Any],
                       results: Dict[str, List[Dict[str, Any]]]) -> None:
        """Post-process one completed video from its collected decodes
        (same tail as run_video: host numpy or fused device post)."""
        got = vid['got']
        n = len(vid['offsets'])
        segments = np.concatenate(got['segments'])
        conf = np.concatenate(got['scores'])
        unct = (np.concatenate(got['uncertainty'])
                if got['uncertainty'] else None)
        act = (np.concatenate(got['actionness'])
               if got['actionness'] else None)
        if self.device_post:
            from opental_tpu.infer.decode import DecodedWindows

            def pad(a):
                if a is None:
                    return None
                n_pad = _bucket(n, 8)
                if n_pad == a.shape[0]:
                    return jnp.asarray(a)
                z = np.zeros((n_pad - a.shape[0],) + a.shape[1:], a.dtype)
                return jnp.asarray(np.concatenate([a, z]))

            dec = DecodedWindows(pad(segments), pad(conf), pad(unct),
                                 pad(act))
            results[vid['name']] = self._post_process_on_device(
                dec, vid['offsets'], vid['fps'], n)
            return
        off = np.asarray(vid['offsets'], np.float32)[:, None, None]
        seconds = (segments + off) / vid['fps']
        results[vid['name']] = self._post_process(seconds, conf, unct,
                                                  act)

    def run_videos_ingest(self, videos, max_batch: int = 128,
                          frames_capacity: int = 16384,
                          stage_chunk_frames: Optional[int] = 1024
                          ) -> Dict[str, List[Dict[str, Any]]]:
        """Packed frame-staged inference: consecutive videos' RAW uint8
        frames concatenate into one fixed-capacity device frame buffer
        per flush; windows gather + normalize ON DEVICE (device_windows,
        per-window frames_valid) and batch to full `max_batch` forwards
        across video boundaries.

        This is the contiguous-buffer twin of run_videos_shared for the
        exact per-window path, replacing the window-staged packed mode
        whenever device_ingest is on. Two properties make it the fastest
        e2e mode on a transfer-bound link (BASELINE.md "Transfer
        bandwidth"):
          * each frame ships ONCE — the window-staged path materializes
            overlapping windows host-side and ships every interior frame
            clip/stride times (2x at the shipped stride 128);
          * staging overlaps compute — flush i+1's host assembly AND
            host->device transfer run on a daemon thread
            (data/prefetch.prefetch) while flush i's forwards execute,
            and the transfer itself is split into `stage_chunk_frames`
            pieces (re-assembled by one on-device concatenate): ~28 MB
            chunks measured fastest through the tunnel — 21.6 vs 15.7
            MB/s for one monolithic 256 MB put, while concurrent
            streams HURT (2 threads: 11 MB/s), so staging stays
            single-threaded (scripts/probe_transfer.py, BASELINE.md
            "Transfer bandwidth").

        The frame buffer has a FIXED bucketed capacity (`cap = k *
        frames_capacity`, k=1 except for oversize single videos), so a
        whole dataset run compiles ONE gather+forward graph per chunk
        shape. Results match per-video run_video(device_ingest) up to
        batch-tiling float noise: windows never cross video boundaries,
        and a window whose tail pad would read the next video's frames
        zero-masks them via its frames_valid (the reference's per-window
        zero padding, test.py:67-76). Replaces the reference's
        sequential per-window loop (test.py:227-235).

        videos: iterable of (name, data, sample_count, sample_fps) or
        (..., flow_data) tuples (two-stream fusion), consumed lazily.
        Returns {name: proposals}. In fusion mode both streams stage
        into twin buffers sharing ONE cursor layout (per-video region =
        max of the streams' extents, gap cost <=1 frame/video since TVL1
        flow is at most one frame shorter), so one offsets array gathers
        from both; each stream keeps its own frames-valid.
        """
        fusion = self.flow_model is not None
        if self.mesh is not None:
            assert max_batch % self.mesh.size == 0, \
                'max_batch must divide over the mesh data axis'
        clip, stride = self.clip_length, self.stride
        results: Dict[str, List[Dict[str, Any]]] = {}

        def plans():
            staged: List[Dict[str, Any]] = []
            cursor = 0

            def close():
                nonlocal staged, cursor
                if not staged:
                    return None
                cap = -(-max(cursor, 1) // frames_capacity) \
                    * frames_capacity
                shape = staged[0]['data'].shape[1:]
                # host buffer covers only the real extent; the fixed
                # graph capacity pads with device-side zeros at staging
                # (stage_frames pad_to) so the link carries no padding
                buf = np.zeros((cursor,) + shape, np.uint8)
                fbuf = (np.zeros((cursor,) + shape[:-1] + (2,), np.uint8)
                        if fusion else None)
                offs_l, fv_l, ffv_l = [], [], []
                for v in staged:
                    t = v['data'].shape[0]
                    buf[v['start']:v['start'] + t] = v['data']
                    offs_l.append(v['start']
                                  + np.asarray(v['offsets'], np.int32))
                    fv_l.append(np.full((len(v['offsets']),), v['fv'],
                                        np.int32))
                    del v['data']          # free per-video host frames
                    if fusion:
                        tf_ = v['flow'].shape[0]
                        fbuf[v['start']:v['start'] + tf_] = v['flow']
                        ffv_l.append(np.full((len(v['offsets']),),
                                             v['ffv'], np.int32))
                        del v['flow']
                offs = np.concatenate(offs_l)
                fv = np.concatenate(fv_l)
                n = offs.shape[0]
                n_pad = _bucket(n, max_batch)
                pad = np.zeros((n_pad - n,), np.int32)
                plan = {'buf': buf, 'fbuf': fbuf, 'cap': cap,
                        'offs': np.concatenate([offs, pad]),
                        'fv': np.concatenate([fv, pad]),
                        'ffv': (np.concatenate(ffv_l + [pad])
                                if fusion else None), 'n': n,
                        'vids': staged}
                staged, cursor = [], 0
                return plan

            for item in videos:
                name, data, sample_count, sample_fps = item[:4]
                _require_u8(data, f'frames ({name})')
                data = transforms.center_crop(data, self.crop_size)
                flow_data = None
                if fusion:
                    _require_u8(item[4], f'flow frames ({name})')
                    flow_data = transforms.center_crop(item[4],
                                                       self.crop_size)
                offsets = window_offsets(sample_count, clip, stride)
                t = data.shape[0]
                # the video's region must physically contain every
                # window slice (dynamic_slice clamps starts at the
                # buffer end, which would silently misalign windows);
                # in fusion mode both streams share the region, sized
                # to the larger extent
                need = max(offsets[-1] + clip, t)
                if fusion:
                    need = max(need, flow_data.shape[0])
                if staged and cursor + need > frames_capacity:
                    plan = close()
                    if plan is not None:
                        yield plan
                staged.append({
                    'name': name, 'data': data, 'start': cursor,
                    'offsets': offsets, 'fps': sample_fps,
                    'fv': cursor + min(t, sample_count),
                    'flow': flow_data,
                    'ffv': (cursor + min(flow_data.shape[0], sample_count)
                            if fusion else None),
                    'need': len(offsets),
                    'got': {k: [] for k in ('segments', 'scores',
                                            'uncertainty', 'actionness')}})
                cursor += need
            plan = close()
            if plan is not None:
                yield plan

        def stage(plan):
            """Host buffer -> device; runs on the prefetch worker so the
            transfer overlaps the previous flush's forwards (chunked —
            see stage_frames)."""
            buf = plan.pop('buf')        # free host copy after staging
            cap = plan.pop('cap')
            plan['buf_dev'] = stage_frames(buf, stage_chunk_frames,
                                           pad_to=cap)
            fbuf = plan.pop('fbuf')
            plan['fbuf_dev'] = (None if fbuf is None else
                                stage_frames(fbuf, stage_chunk_frames,
                                             pad_to=cap))
            return plan

        for plan in prefetch(plans(), transform=stage, depth=2):
            buf_dev = plan['buf_dev']
            offs, fv, n = plan['offs'], plan['fv'], plan['n']
            vi = 0
            for i in range(0, offs.shape[0], max_batch):
                if fusion:
                    dec = self._ingest_forward(
                        self.variables, buf_dev,
                        jnp.asarray(offs[i:i + max_batch]),
                        jnp.asarray(fv[i:i + max_batch]),
                        self.flow_variables, plan['fbuf_dev'],
                        jnp.asarray(plan['ffv'][i:i + max_batch]))
                else:
                    dec = self._ingest_forward(
                        self.variables, buf_dev,
                        jnp.asarray(offs[i:i + max_batch]),
                        jnp.asarray(fv[i:i + max_batch]))
                rows = {
                    'segments': np.asarray(dec.segments),
                    'scores': np.asarray(dec.scores),
                    'uncertainty': (None if dec.uncertainty is None
                                    else np.asarray(dec.uncertainty)),
                    'actionness': (None if dec.actionness is None
                                   else np.asarray(dec.actionness)),
                }
                r, valid_rows = 0, max(0, min(max_batch, n - i))
                while r < valid_rows:
                    vid = plan['vids'][vi]
                    take = min(vid['need'], valid_rows - r)
                    for key, arr in rows.items():
                        if arr is not None:
                            vid['got'][key].append(arr[r:r + take])
                    vid['need'] -= take
                    r += take
                    if vid['need'] == 0:
                        vi += 1
            for vid in plan['vids']:
                self._finish_packed(vid, results)
            del plan['buf_dev'], plan['fbuf_dev']
        return results

    def run_videos_shared(self, videos, frames_capacity: int = 32768
                          ) -> Dict[str, List[Dict[str, Any]]]:
        """Packed shared-backbone inference: k-window spans from
        CONSECUTIVE videos pack into full `shared_max_groups` forward
        chunks over one staged uint8 device buffer per flush.

        The per-video shared path (_run_video_shared) falls back to
        small bucketed group counts on short videos (a 6-window video
        runs a 2-group graph), losing the measured 48-span optimum
        (BASELINE.md "Shared-backbone"). Here videos concatenate into a
        zero-initialized frame buffer (each video 8-aligned so feature
        slices stay stride-aligned) and every span carries its own
        frames_valid = its video's global end — a span whose +8/tail
        margin reads into the next video's region zero-masks those
        frames, reproducing per-video zero padding exactly. Buffer
        lengths bucket to 8192 frames so the whole run compiles a
        handful of graphs. Same edge-context deviation as the per-video
        shared path (PARITY.md), same results up to batch-tiling float
        noise (tests/test_packed_inference.py).
        """
        assert self.flow_model is None or self.mesh is None, \
            'shared_backbone fusion runs are single-device'
        fusion = self.flow_model is not None
        k = self.shared_group
        span = self.stride * (k - 1) + self.clip_length + 8
        clip, stride = self.clip_length, self.stride
        results: Dict[str, List[Dict[str, Any]]] = {}
        staged: List[Dict[str, Any]] = []
        cursor = 0

        def flush():
            nonlocal staged, cursor
            if not staged:
                return
            cap = _bucket(cursor + span, 8192)
            shape = staged[0]['data'].shape[1:]
            # host buffers cover only the real extent; the bucketed
            # graph capacity pads device-side (stage_frames pad_to)
            buf = np.zeros((cursor,) + shape, np.uint8)
            fbuf = (np.zeros((cursor,) + shape[:-1] + (2,), np.uint8)
                    if fusion else None)
            spans: List[Tuple[Dict[str, Any], int]] = []
            for v in staged:
                t = v['data'].shape[0]
                buf[v['start']:v['start'] + t] = v['data']
                if fusion:
                    f = v['flow']
                    fbuf[v['start']:v['start'] + f.shape[0]] = f
                spans.extend((v, c) for c in v['counts'])
            video_dev = stage_frames(buf, pad_to=cap)
            flow_dev = (stage_frames(fbuf, pad_to=cap)
                        if fusion else None)
            all_bases = np.concatenate([v['bases'] for v in staged])
            all_local = np.concatenate([v['local'] for v in staged])
            all_fv = np.concatenate([v['fv'] for v in staged])
            n_spans = all_bases.shape[0]
            for i in range(0, n_spans, self.shared_max_groups):
                chunk = min(self.shared_max_groups, n_spans - i)
                if self.mesh is not None:
                    b = _bucket(chunk, self.mesh.size)
                else:
                    b = (1 << (chunk - 1).bit_length() if chunk <= 8
                         else _bucket(chunk, 8))
                cb = np.zeros((b,), np.int32)
                cl = np.zeros((b, k), np.int32)
                cfv = np.zeros((b,), np.int32)
                cb[:chunk] = all_bases[i:i + chunk]
                cl[:chunk] = all_local[i:i + chunk]
                cfv[:chunk] = all_fv[i:i + chunk]
                cb[chunk:] = all_bases[i + chunk - 1]  # pad: repeat last
                cl[chunk:] = all_local[i + chunk - 1]
                cfv[chunk:] = all_fv[i + chunk - 1]
                args = (self.variables, video_dev, jnp.asarray(cb),
                        jnp.asarray(cl), jnp.asarray(cfv))
                if fusion:
                    args += (self.flow_variables, flow_dev)
                dec = self._shared_forward(b)(*args)
                rows = {
                    'segments': np.asarray(dec.segments),
                    'scores': np.asarray(dec.scores),
                    'uncertainty': (None if dec.uncertainty is None
                                    else np.asarray(dec.uncertainty)),
                    'actionness': (None if dec.actionness is None
                                   else np.asarray(dec.actionness)),
                }
                for j in range(chunk):
                    vid, count = spans[i + j]
                    sl = slice(j * k, j * k + count)
                    for key, arr in rows.items():
                        if arr is not None:
                            vid['got'][key].append(arr[sl])
            for v in staged:
                self._finish_packed(v, results)
            staged, cursor = [], 0

        for item in videos:
            name, data, sample_count, sample_fps = item[:4]
            _require_u8(data, f'frames ({name})')
            flow_data = item[4] if fusion else None
            if fusion:
                _require_u8(flow_data, f'flow frames ({name})')
            data = transforms.center_crop(data, self.crop_size)
            offsets = window_offsets(sample_count, clip, stride)
            # snap the irregular tail offset up to a multiple of 8 so
            # its feature slice stays aligned (as _run_video_shared)
            offsets = [o if o % 8 == 0 else ((o + 7) // 8) * 8
                       for o in offsets]
            n = len(offsets)
            n_groups = -(-n // k)
            bases = np.zeros((n_groups,), np.int32)
            local = np.zeros((n_groups, k), np.int32)
            for g in range(n_groups):
                grp = offsets[g * k:(g + 1) * k]
                bases[g] = grp[0]
                rel = np.asarray(grp, np.int32) - grp[0]
                local[g, :len(grp)] = rel
                local[g, len(grp):] = rel[-1]
            t = data.shape[0]
            # the video's region must physically contain every span
            # slice (dynamic_slice clamps starts at the buffer end,
            # which would silently misalign windows)
            need = max(int(bases[-1]) + span, t)
            start = -(-cursor // 8) * 8
            if staged and start + need > frames_capacity:
                flush()
                start = 0
            counts = [k] * (n_groups - 1) + [n - (n_groups - 1) * k]
            if fusion:
                flow_data = transforms.center_crop(flow_data,
                                                   self.crop_size)
                flow_data = flow_data[:t]
            staged.append({
                'name': name, 'data': data, 'flow': flow_data,
                'start': start, 'offsets': offsets, 'fps': sample_fps,
                'bases': start + bases, 'local': local,
                'fv': np.full((n_groups,), start + min(t, sample_count),
                              np.int32),
                'counts': counts,
                'got': {key: [] for key in ('segments', 'scores',
                                            'uncertainty', 'actionness')}})
            cursor = start + need
        flush()
        return results

    def _shared_forward(self, n_groups: int):
        """One jitted graph per bucketed group COUNT: each of `n_groups`
        spans covers `shared_group` consecutive overlapping windows;
        slice the spans from the device-resident uint8 video, run the
        backbone ONCE per span (a (n_groups, span, ...) batch), slice
        each window's Mixed_4f/Mixed_5c features per span (temporal
        strides 4/8 divide the window stride), then pyramid+decode the
        flattened (n_groups*shared_group, ...) window batch.

        At clip 256 / stride 128, k=4 spans of 648 frames do 1.58x fewer
        backbone FLOPs than 4 windows of 256 — and keep a wide span
        batch so the MXU stays fed (scripts/probe_span_batch.py: fully
        shared k=16 LOSES at 0.77x despite 1.88x fewer FLOPs). Deviation
        vs the reference's per-window forward (test.py:227-235): windows
        see their real temporal context through conv receptive fields
        instead of SAME zero padding at window edges (PARITY.md "Known
        deviations").
        """
        if n_groups in self._shared_forwards:
            return self._shared_forwards[n_groups]
        model, flow_model = self.model, self.flow_model
        clip = self.clip_length
        k = self.shared_group
        # +8: the irregular tail offset (window_offsets) snaps up to the
        # next multiple of 8 so feature slices stay stride-aligned
        span = self.stride * (k - 1) + clip + 8
        score_func = 'dirichlet' if self.use_edl else 'softmax'
        use_edl, os_head = self.use_edl, self.os_head
        evidence, negate = self.evidence, self.use_gcpl
        w4, w8 = clip // 4, clip // 8

        def window_out(mdl, variables, video_u8, bases, local_offs,
                       frames_valid):
            """One stream: span slice -> backbone -> per-window feature
            slices -> pyramid/heads out_dict on the flattened windows."""

            def one_span(base, valid):
                sl = jax.lax.dynamic_slice(
                    video_u8, (base,) + (0,) * (video_u8.ndim - 1),
                    (span,) + video_u8.shape[1:])
                idx = base + jnp.arange(span)
                x = (sl.astype(jnp.float32) / 255.0) * 2.0 - 1.0
                return jnp.where((idx < valid)[:, None, None, None],
                                 x, 0.0)

            # frames_valid: scalar (one video) or (n_groups,) vector —
            # per-span valid ends let spans from DIFFERENT videos share
            # one staged buffer (run_videos_shared): a span that reads
            # past its video's end zero-masks the next video's frames,
            # reproducing per-video zero padding exactly
            fv = jnp.broadcast_to(frames_valid, bases.shape)
            x = jax.vmap(one_span)(bases, fv)
            feats = mdl.apply(variables, x,
                              method=type(mdl).backbone_features)
            f4 = feats['Mixed_4f']        # (n_groups, span/4, ...)
            f8 = feats['Mixed_5c']        # (n_groups, span/8, ...)

            def one_window(g4, g8, lo):
                return (jax.lax.dynamic_slice_in_dim(g4, lo // 4, w4, 0),
                        jax.lax.dynamic_slice_in_dim(g8, lo // 8, w8, 0))

            s4, s8 = jax.vmap(lambda g4, g8, los: jax.vmap(
                lambda lo: one_window(g4, g8, lo))(los))(
                    f4, f8, local_offs)
            s4 = s4.reshape((n_groups * k,) + s4.shape[2:])
            s8 = s8.reshape((n_groups * k,) + s8.shape[2:])
            return mdl.apply(variables, {'Mixed_4f': s4, 'Mixed_5c': s8},
                             method=type(mdl).detect_from_features)

        def fwd(variables, video_u8, bases, local_offs, frames_valid,
                flow_vars=None, flow_u8=None):
            # bases (n_groups,) int32; local_offs (n_groups, k) int32
            out = window_out(model, variables, video_u8, bases,
                             local_offs, frames_valid)
            if flow_model is not None and flow_u8 is not None:
                flow_out = window_out(flow_model, flow_vars, flow_u8,
                                      bases, local_offs, frames_valid)
                out = fuse_streams(out, flow_out)
            return decode_windows(out, clip, use_edl=use_edl,
                                  os_head=os_head, score_func=score_func,
                                  evidence=evidence, negate_conf=negate)

        if self.mesh is not None:
            # sequence-parallel over spans: groups shard across the data
            # axis (n_groups is bucketed to a mesh-size multiple), video
            # + params replicated; the flattened window axis comes back
            # group-major so it stays contiguously sharded
            from jax.sharding import NamedSharding, PartitionSpec as P

            from opental_tpu.parallel.mesh import DATA_AXIS
            rep = NamedSharding(self.mesh, P())
            shd = NamedSharding(self.mesh, P(DATA_AXIS))
            self._shared_forwards[n_groups] = jax.jit(
                fwd, in_shardings=(rep, rep, shd, shd, rep),
                out_shardings=shd)
        else:
            self._shared_forwards[n_groups] = jax.jit(fwd)
        return self._shared_forwards[n_groups]

    def _run_video_shared(self, data: np.ndarray, sample_count: int,
                          sample_fps: float,
                          flow_data: Optional[np.ndarray] = None
                          ) -> List[Dict[str, Any]]:
        """Shared-backbone run_video: k consecutive windows share one
        backbone span; all spans of a chunk batch into one forward.
        With fusion, both streams share the span geometry and fuse
        head-wise before decode. Returns the same proposal contract."""
        data = transforms.center_crop(data, self.crop_size)
        offsets = window_offsets(sample_count, self.clip_length,
                                 self.stride)
        # snap the irregular tail offset UP to a multiple of 8 so its
        # feature slice is aligned; the over-hang reads zero-masked pad,
        # exactly like a zero-padded tail window
        offsets = [o if o % 8 == 0 else ((o + 7) // 8) * 8
                   for o in offsets]
        n = len(offsets)
        k = self.shared_group
        span = self.stride * (k - 1) + self.clip_length + 8
        n_groups = -(-n // k)

        # group bases + per-window local offsets; tail groups repeat
        # their last real window (dropped after decode)
        bases = np.zeros((n_groups,), np.int32)
        local = np.zeros((n_groups, k), np.int32)
        for g in range(n_groups):
            grp = offsets[g * k:(g + 1) * k]
            bases[g] = grp[0]
            rel = np.asarray(grp, np.int32) - grp[0]
            local[g, :len(grp)] = rel
            local[g, len(grp):] = rel[-1]

        t = data.shape[0]
        tt = max(t, sample_count)
        tpad = -(-(tt + span) // 1024) * 1024
        # ship only the real frames; the bucketed graph length pads
        # with device-side zeros (stage_frames pad_to)
        video_dev = stage_frames(np.ascontiguousarray(data), pad_to=tpad)
        frames_valid = jnp.int32(min(t, sample_count))
        flow_dev = None
        if flow_data is not None:
            assert self.flow_model is not None
            flow_data = transforms.center_crop(flow_data, self.crop_size)
            flow_dev = stage_frames(
                np.ascontiguousarray(flow_data[:t]), pad_to=tpad)

        to_host = not self.device_post
        segs, scores, uncts, acts = [], [], [], []
        done = 0          # real windows consumed so far
        for i in range(0, n_groups, self.shared_max_groups):
            chunk = min(self.shared_max_groups, n_groups - i)
            if self.mesh is not None:
                # group axis shards across the mesh -> mesh-size multiple
                b = _bucket(chunk, self.mesh.size)
            else:
                # graph shapes: {1, 2, 4, 8, 16, 24, 32, 40, 48}
                b = (1 << (chunk - 1).bit_length() if chunk <= 8
                     else _bucket(chunk, 8))
            cb = np.zeros((b,), np.int32)
            cl = np.zeros((b, k), np.int32)
            cb[:chunk] = bases[i:i + chunk]
            cl[:chunk] = local[i:i + chunk]
            cl[chunk:] = local[i + chunk - 1]   # pad groups: repeat last
            cb[chunk:] = bases[i + chunk - 1]
            if flow_dev is None:
                dec = self._shared_forward(b)(
                    self.variables, video_dev, jnp.asarray(cb),
                    jnp.asarray(cl), frames_valid)
            else:
                dec = self._shared_forward(b)(
                    self.variables, video_dev, jnp.asarray(cb),
                    jnp.asarray(cl), frames_valid,
                    self.flow_variables, flow_dev)
            keep = min(chunk * k, n - done)
            done += keep
            conv = np.asarray if to_host else (lambda a: a)
            segs.append(conv(dec.segments[:keep]))
            scores.append(conv(dec.scores[:keep]))
            uncts.append(None if dec.uncertainty is None
                         else conv(dec.uncertainty[:keep]))
            acts.append(None if dec.actionness is None
                        else conv(dec.actionness[:keep]))

        if self.device_post:
            from opental_tpu.infer.decode import DecodedWindows

            def cat_pad(parts):
                # pad the window axis to a bucket so the fused post
                # graph compiles once per size class, not per video
                a = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                n_pad = _bucket(n, 8)
                if n_pad == a.shape[0]:
                    return a
                pad = jnp.zeros((n_pad - a.shape[0],) + a.shape[1:],
                                a.dtype)
                return jnp.concatenate([a, pad])

            dec_all = DecodedWindows(
                cat_pad(segs), cat_pad(scores),
                None if uncts[0] is None else cat_pad(uncts),
                None if acts[0] is None else cat_pad(acts))
            return self._post_process_on_device(dec_all, offsets,
                                                sample_fps, n)
        segments = np.concatenate(segs)
        conf = np.concatenate(scores)
        unct = (np.concatenate(uncts) if uncts[0] is not None else None)
        act = (np.concatenate(acts) if acts[0] is not None else None)
        off = np.asarray(offsets, np.float32)[:, None, None]
        seconds = (segments + off) / sample_fps
        return self._post_process(seconds, conf, unct, act)

    def _build_device_post(self):
        """One jitted graph: seconds shift + per-class candidate top-k +
        vmapped soft-NMS for every class at once."""
        import jax
        import jax.numpy as jnp

        from opental_tpu.ops.nms import soft_nms_device

        k = self.num_classes
        cls_cols = (list(range(k)) if self.os_head
                    else list(range(1, k)))
        n_cand = self.n_candidates
        use_edl, os_head = self.use_edl, self.os_head
        conf_thresh, sigma = self.conf_thresh, self.nms_sigma
        top_k = self.top_k

        def post(segments, scores, unct, act, offsets, sample_fps,
                 n_valid):
            # segments (W,P,2) clip-frame units; scores (W,P,K); the
            # window axis stays bucket-padded — n_valid is traced so a
            # video's true window count never forces a recompile
            w, p = segments.shape[:2]
            seconds = ((segments + offsets[:, None, None]) / sample_fps
                       ).reshape(-1, 2)
            flat = scores.reshape(-1, scores.shape[-1])
            gate = jnp.repeat(jnp.arange(w) < n_valid, p)
            extras = []
            if use_edl:
                extras.append(unct.reshape(-1))
            if os_head:
                a = act.reshape(-1)
                gate = gate & (a > 0.5)
                extras.append(a)

            k_eff = min(n_cand, flat.shape[0])

            def per_class(cl_scores):
                m = (cl_scores > conf_thresh) & gate
                sc = jnp.where(m, cl_scores, 0.0)
                top_sc, idx = jax.lax.top_k(sc, k_eff)
                cols = [seconds[idx], top_sc[:, None]]
                cols += [e[idx][:, None] for e in extras]
                block = jnp.concatenate(cols, axis=-1)
                return soft_nms_device(block, sigma=sigma, top_k=top_k,
                                       valid=top_sc > 0)

            stacked = jnp.stack([flat[:, c] for c in cls_cols], 0)
            return jax.vmap(per_class)(stacked)

        return jax.jit(post), cls_cols

    def _post_process_on_device(self, dec, offsets: Sequence[int],
                                sample_fps: float, n: int
                                ) -> List[Dict[str, Any]]:
        import jax.numpy as jnp
        if self._device_post_fn is None:
            self._device_post_fn = self._build_device_post()
        post, cls_cols = self._device_post_fn
        w_pad = dec.segments.shape[0]
        off = np.zeros((w_pad,), np.float32)
        off[:n] = np.asarray(offsets, np.float32)
        blocks, _ = post(dec.segments, dec.scores,
                         dec.uncertainty if self.use_edl else None,
                         dec.actionness if self.os_head else None,
                         jnp.asarray(off), jnp.float32(sample_fps),
                         jnp.int32(n))
        blocks = np.asarray(blocks)           # (C, n_cand, D+1)
        proposals: List[Dict[str, Any]] = []
        for ci, cl in enumerate(cls_cols):
            kept = blocks[ci]
            kept = kept[(kept[:, -1] > 0) & (kept[:, 2] > 0)]
            cl_idx = cl + 1 if self.os_head else cl
            for row in kept:
                proposals.append({
                    'cls': int(cl_idx),
                    'score': float(row[2]),
                    'segment': [float(row[0]), float(row[1])],
                    'uncertainty': float(row[3]) if self.use_edl else 0.0,
                    'actionness': (float(row[-2]) if self.os_head
                                   else 0.0),
                })
        return proposals

    def _soft_nms(self, block: np.ndarray) -> np.ndarray:
        """Greedy gaussian-decay suppression of one class's candidates.

        Host numpy by default; with device_nms=True the candidate block
        pads to a bucket size and runs the bounded lax.while_loop kernel
        (ops/nms.soft_nms_device) — same results, no host loop.
        """
        if not self.device_nms:
            kept, _ = soft_nms_numpy(block, sigma=self.nms_sigma,
                                     top_k=self.top_k)
            return kept
        import jax.numpy as jnp
        n, d = block.shape
        n_pad = max(64, 1 << (n - 1).bit_length())
        padded = np.zeros((n_pad, d), np.float32)
        padded[:n] = block
        valid = np.zeros((n_pad,), bool)
        valid[:n] = True
        out, _ = _jitted_device_nms()(jnp.asarray(padded),
                                      sigma=self.nms_sigma,
                                      top_k=self.top_k,
                                      valid=jnp.asarray(valid))
        out = np.asarray(out)
        return out[out[:, -1] > 0][:, :-1]

    def _post_process(self, seconds: np.ndarray, conf: np.ndarray,
                      unct: Optional[np.ndarray],
                      act: Optional[np.ndarray]) -> List[Dict[str, Any]]:
        """Per-class filter + Soft-NMS + top-k (test.py:143-200).

        Returns proposals with integer class index `cls` (1-based known
        class ids; callers map to names via idx_to_class).
        """
        w, p, k = conf.shape
        seconds = seconds.reshape(-1, 2)
        conf = conf.reshape(-1, k)
        flat_unct = unct.reshape(-1) if unct is not None else None
        flat_act = act.reshape(-1) if act is not None else None

        cls_range = range(0, k) if self.os_head else range(1, k)
        proposals: List[Dict[str, Any]] = []
        collected = []
        for cl in cls_range:
            mask = conf[:, cl] > self.conf_thresh
            if self.os_head:
                mask &= flat_act > 0.5
            if not mask.any():
                collected.append(None)
                continue
            cols = [seconds[mask], conf[mask, cl][:, None]]
            if self.use_edl:
                cols.append(flat_unct[mask][:, None])
            if self.os_head:
                cols.append(flat_act[mask][:, None])
            block = np.concatenate(cols, axis=1)
            kept = self._soft_nms(block)
            collected.append(kept)

        for cl, kept in zip(cls_range, collected):
            if kept is None or len(kept) == 0:
                continue
            cl_idx = cl + 1 if self.os_head else cl
            for row in kept:
                if row[2] <= 0:
                    continue
                proposals.append({
                    'cls': int(cl_idx),
                    'score': float(row[2]),
                    'segment': [float(row[0]), float(row[1])],
                    'uncertainty': float(row[3]) if self.use_edl else 0.0,
                    'actionness': (float(row[-1]) if self.os_head else 0.0),
                })
        return proposals


def proposals_to_json(result_dict: Dict[str, List[Dict[str, Any]]],
                      idx_to_class: Dict[int, str], output_path: str,
                      json_name: str, version: str = 'THUMOS14',
                      external_data: Optional[dict] = None) -> str:
    """Write the detection JSON with reference schema parity
    (test.py:254-256)."""
    results = {}
    for video, props in result_dict.items():
        results[video] = [{
            'label': idx_to_class[p['cls']],
            'score': p['score'],
            'segment': p['segment'],
            'uncertainty': p['uncertainty'],
            'actionness': p['actionness'],
        } for p in props]
    payload = {'version': version, 'results': results,
               'external_data': external_data or {}}
    os.makedirs(output_path, exist_ok=True)
    path = os.path.join(output_path, json_name)
    with open(path, 'w') as f:
        json.dump(payload, f)
    return path
