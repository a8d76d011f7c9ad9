"""Serving runtime: request queue -> micro-batcher -> jitted generate.

Production wrapper over the eval Predictor: requests accumulate in a queue
and flush as a batch whenever ``max_batch`` requests are waiting or
``max_wait_ms`` elapses, amortizing decode's weight streaming across the
batch (decode is HBM-bound: one weight pass serves the whole batch).
Host-side postprocess (canvas crop + original-size resize + binarize) runs
on worker threads so the device never waits for it.

The reference has no serving layer (research eval scripts only); this is the
deployment surface for the >=5 queries/sec/chip target.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from .config import AnyRefConfig
from .data.base import SegDataset
from .data.collator import Collator
from .eval.runner import Predictor, binary_mask
from .tokenizer import AnyRefTokenizer, audio_ref_question, \
    img_ref_question, seg_question


@dataclass
class Request:
    image: np.ndarray                       # [H, W, 3] uint8 RGB
    text: Optional[str] = None
    ref_image: Optional[np.ndarray] = None
    roi_xyxy: Optional[np.ndarray] = None   # pixel coords
    audio_waveform: Optional[np.ndarray] = None
    callback: Optional[Callable] = None
    _result: dict = field(default_factory=dict)
    _done: threading.Event = field(default_factory=threading.Event)

    def result(self, timeout: Optional[float] = None) -> dict:
        self._done.wait(timeout)
        return self._result


class Server:
    def __init__(self, params, cfg: AnyRefConfig,
                 tokenizer: Optional[AnyRefTokenizer] = None,
                 max_batch: int = 2, max_wait_ms: float = 5.0,
                 preprocess_workers: int = 8,
                 speculative: Optional[bool] = None,
                 max_new_tokens: Optional[int] = None,
                 draft_len: Optional[int] = None,
                 max_accept: Optional[int] = None,
                 force_accept: bool = False,
                 fetch_segs: Optional[int] = 1,
                 fill_wait_ms: float = 500.0,
                 pipeline_depth: int = 3):
        self.cfg = cfg
        self.tok = tokenizer or AnyRefTokenizer()
        # speculative decoding is the measured-best config (bench.py: ~5 q/s
        # vs 1.1 plain at decode32, batch 1); with batch > 1 the lockstep
        # batched variant shares each verify pass's weight stream across
        # rows AND accepts multi-token spans. max_batch default 2 = the
        # measured single-chip operating point (BASELINE.md: batch 2 shares
        # each verify pass's weight stream; batch 4 fails compile on a
        # 16 GiB chip) — the server exercises its own batching by default.
        if speculative is None:
            speculative = True
        # ONE batch bucket = max_batch: a partial group (queue momentarily
        # short) rides the full-batch program with padded rows instead of
        # compiling a second program. Decode is weight-streaming-bound, so
        # the max_batch program costs about the same as a smaller one
        # (BASELINE.md verify-chunk costs are flat in rows) — while a fresh
        # generate compile on device is minutes: one stray batch-1 group
        # mid-serving stalled the measured server path from ~7 q/s to 0.2.
        # mask_fetch_dtype bf16: halves the per-batch device->host mask
        # readback (tunnel-bound at ~30 MB/s on axon; measured 133 ms for a
        # batch-2 f32 fetch) — one bf16 ulp is ~0.03 on the logit scale,
        # inside the sigmoid>0.5 margin
        # fetch_segs=1: serving answers carry one [SEG] (the reference answer
        # templates emit exactly one), and fetching all 8 canvas slots costs
        # 8x the d2h bytes per batch on the tunnel. fetch_segs=None restores
        # the full readback for multi-seg callers.
        self.predictor = Predictor(params, cfg, speculative=speculative,
                                   max_new_tokens=max_new_tokens,
                                   draft_len=draft_len,
                                   max_accept=max_accept,
                                   force_accept=force_accept,
                                   batch_buckets=(max_batch,),
                                   mask_fetch_dtype="bfloat16",
                                   fetch_segs=fetch_segs)
        self.collator = Collator(self.tok, cfg, train=False)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        # fill_wait: how long the micro-batcher may hold a partial group
        # when MORE requests are already inside the server (submitted but
        # not yet grouped). A singleton group still pays the full padded
        # batch program (ONE bucket, see below), so dispatching at
        # max_wait while a partner is mid-preprocess halves throughput for
        # nothing — measured 1.55 rows/batch at max_wait=20ms (r5). The
        # plain max_wait still bounds the no-load case: an idle server
        # dispatches a singleton after max_wait_ms.
        self.fill_wait = fill_wait_ms / 1000.0
        # submitted-but-not-yet-grouped: lets the batcher distinguish "no
        # partner coming" (dispatch now) from "partner mid-preprocess"
        # (hold the group open up to fill_wait)
        self._pending = 0
        self._pending_lock = threading.Lock()
        # batching efficiency counters (single device thread writes them):
        # avg rows/batch << max_batch means the micro-batcher is starved.
        # *_ms sums are per-stage wall time for throughput diagnosis:
        # wait (device loop idle for first sample), group (micro-batch
        # window), collate, dispatch (host->device upload + program enqueue),
        # fetch (device->host readback incl. device time not yet elapsed),
        # post (host mask postprocess + decode)
        self.stats = {"batches": 0, "rows": 0, "wait_ms": 0.0,
                      "group_ms": 0.0, "collate_ms": 0.0, "dispatch_ms": 0.0,
                      "fetch_ms": 0.0, "post_ms": 0.0}
        # reset_stats() epoch: the device loop may be mid-idle-wait (t0
        # already ticking) when a caller zeros the counters — e.g. bench.py
        # resetting after the warmup batch whose first jit compile the loop
        # idled through — so wait spans clamp to max(t0, epoch) or the
        # first post-reset batch absorbs minutes of pre-reset idle time
        self._stats_epoch = 0.0
        # uint8 image I/O: preprocess threads emit uint8 PIXEL canvases and
        # the device normalizes — cuts the per-batch host->device upload 4x
        # (f32 images measured ~800 ms/batch-2 over the ~30 MB/s serving
        # tunnel, wiping out the device program's 360 ms)
        self._helper = SegDataset(cfg, uint8_images=True)
        self._pre_q: "queue.Queue" = queue.Queue()
        self._run_q: "queue.Queue" = queue.Queue()
        # dispatched-but-unfetched programs; maxsize bounds in-flight device
        # programs: the device loop dispatches batch N+1 while the
        # completion thread fetches/postprocesses N, hiding fetch time and
        # the tunnel's slow-dispatch windows behind device time. Depth 3 is
        # the measured optimum (r5 sweep: depth 2 = 3.2 q/s starved, depth
        # 3 = 5.5, depth 4 = 4.2 — deeper queues contend on the wire);
        # preprocess_workers=8 likewise (4 starves the loop at ~90 ms
        # make_sample per request).
        self._fin_q: "queue.Queue" = queue.Queue(maxsize=max(1, pipeline_depth))
        self._stop = threading.Event()
        # orders submit's stop-check-then-enqueue against shutdown's
        # stop-set-then-drain, so no request can land in _pre_q after the
        # drain (ADVICE r2)
        self._submit_lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._preprocess_loop, daemon=True)
            for _ in range(preprocess_workers)
        ] + [threading.Thread(target=self._device_loop, daemon=True),
             threading.Thread(target=self._complete_loop, daemon=True)]
        for t in self._threads:
            t.start()

    # -- public API ----------------------------------------------------------
    def submit(self, req: Request) -> Request:
        with self._submit_lock:
            if self._stop.is_set():
                self._finish(req, {"error": "server shut down"})
                return req
            with self._pending_lock:
                self._pending += 1
            self._pre_q.put(req)
        return req

    def _ungroup(self, n: int) -> None:
        with self._pending_lock:
            self._pending -= n

    def _upstream(self) -> int:
        with self._pending_lock:
            return self._pending

    def segment(self, image, text=None, **kw) -> dict:
        return self.submit(Request(image=image, text=text, **kw)).result()

    def reset_stats(self) -> None:
        """Zero the per-stage counters (e.g. after a warmup batch whose
        first-call jit compile would swamp steady-state numbers)."""
        for k in self.stats:
            self.stats[k] = 0 if k in ("batches", "rows") else 0.0
        self._stats_epoch = time.time()
        p = self.predictor
        p.decode_passes_total = p.completed_batches = 0
        p.h2d_bytes_total = p.d2h_bytes_total = 0

    def shutdown(self, timeout: float = 30.0):
        """Stop the loops and fail any still-pending requests so no caller
        blocks forever in Request.result().

        The final drain only runs after EVERY worker thread has exited: a
        preprocess worker mid-_build_sample when _stop is set can still
        enqueue into _run_q after an early drain (it would strand that
        request), so drain repeatedly until no thread is alive, then once
        more. ``timeout`` bounds the wait — a device loop wedged inside a
        hung TPU program (a documented axon failure mode) must not hang
        shutdown itself; past the deadline the daemon threads are abandoned
        (killed at process exit) after a last drain."""
        with self._submit_lock:
            self._stop.set()
        deadline = time.time() + timeout
        while time.time() < deadline:
            for t in self._threads:
                t.join(timeout=1.0)
            self._drain()
            if not any(t.is_alive() for t in self._threads):
                break
        self._drain()

    def _drain(self) -> None:
        for q in (self._pre_q, self._run_q, self._fin_q):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                head = item[0] if isinstance(item, tuple) else item
                # _pre_q holds Requests, _run_q (req, sample) pairs, _fin_q
                # (reqs, samples, handle) groups — fail every request
                reqs = head if isinstance(head, (tuple, list)) else [head]
                if q is not self._fin_q:   # _fin_q items already ungrouped
                    self._ungroup(len(reqs))
                for req in reqs:
                    self._finish(req, {"error": "server shut down"})

    @staticmethod
    def _finish(req: Request, result: dict) -> None:
        # idempotent: a group-level error path (e.g. postprocess throwing on
        # row 2 of a batch) fails the WHOLE group, including rows already
        # finished — without this guard row 1's result would be overwritten
        # and its callback fired twice (double semaphore release in
        # bench.py's open-loop feeder; ADVICE r4)
        if req._done.is_set():
            return
        req._result = result
        req._done.set()
        if req.callback is not None:
            try:
                req.callback(result)
            except Exception:
                pass

    # -- pipeline ------------------------------------------------------------
    def _build_sample(self, req: Request) -> dict:
        kw = {}
        if req.text is not None:
            q = seg_question(req.text)
        elif req.ref_image is not None:
            q = img_ref_question()
            kw["ref_image"] = req.ref_image
        elif req.roi_xyxy is not None:
            q = img_ref_question()
            h, w = req.image.shape[:2]
            kw["ref_bbox"] = (np.asarray(req.roi_xyxy, np.float32)
                              / np.asarray([w, h, w, h], np.float32))
        elif req.audio_waveform is not None:
            from .ops.mel import audio_to_mel_clips
            q = audio_ref_question()
            kw["audio_mels"] = audio_to_mel_clips(req.audio_waveform)
        else:
            raise ValueError("request needs text/ref_image/roi/audio")
        return self._helper.make_sample(req.image, q, None, None, **kw)

    def _preprocess_loop(self):
        while not self._stop.is_set():
            try:
                req = self._pre_q.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                sample = self._build_sample(req)
                self._run_q.put((req, sample))
            except Exception as e:
                self._ungroup(1)   # never reaches a device group
                self._finish(req, {"error": str(e)})

    def _device_loop(self):
        while not self._stop.is_set():
            # t0 set ONCE per idle period: the 0.1 s get timeout retries on
            # Empty inside the inner loop, so wait_ms spans the WHOLE idle
            # stretch rather than only its final sub-100 ms slice (ADVICE r4)
            t0 = time.time()
            first = None
            while first is None and not self._stop.is_set():
                try:
                    first = self._run_q.get(timeout=0.1)
                except queue.Empty:
                    pass
            if first is None:
                break
            t1 = time.time()
            group = [first]
            # two deadlines: max_wait when the group has no partner coming
            # (idle server -> dispatch the singleton fast), fill_wait when
            # more requests are KNOWN to be upstream (submitted, still in
            # preprocess) — a partial group pays the full padded-batch
            # program, so waiting ~one preprocess latency for the partner
            # beats dispatching half-empty (measured 1.55 rows/batch ->
            # 2.0 with this rule, r5)
            hard_deadline = t1 + self.fill_wait
            while len(group) < self.max_batch:
                now = time.time()
                more_coming = self._upstream() > len(group)
                deadline = hard_deadline if more_coming else \
                    min(t1 + self.max_wait, hard_deadline)
                remaining = deadline - now
                if remaining <= 0:
                    break
                try:
                    group.append(self._run_q.get(
                        timeout=min(remaining, 0.05)))
                except queue.Empty:
                    continue
            t2 = time.time()
            self._ungroup(len(group))
            reqs, samples = zip(*group)
            self.stats["batches"] += 1
            self.stats["rows"] += len(group)
            self.stats["wait_ms"] += (t1 - max(t0, self._stats_epoch)) * 1e3
            self.stats["group_ms"] += (t2 - t1) * 1e3
            try:
                batch = self.collator(list(samples))
                t3 = time.time()
                self.stats["collate_ms"] += (t3 - t2) * 1e3
                handle = self.predictor.predict_async(batch)
                self.stats["dispatch_ms"] += (time.time() - t3) * 1e3
            except Exception as e:
                for req in reqs:
                    self._finish(req, {"error": str(e)})
                continue
            item = (reqs, samples, handle)
            while not self._stop.is_set():
                try:
                    self._fin_q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            else:
                # shutting down with the completion queue full: fail the
                # group instead of stranding it
                for req in reqs:
                    self._finish(req, {"error": "server shut down"})

    def _complete_loop(self):
        """Fetch + postprocess + reply for dispatched batches, off the
        device loop's critical path."""
        while not self._stop.is_set():
            try:
                reqs, samples, handle = self._fin_q.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                t0 = time.time()
                output_ids, masks = self.predictor.complete(handle)
                self.stats["fetch_ms"] += (time.time() - t0) * 1e3
                t0 = time.time()
                for i, req in enumerate(reqs):
                    h, w = samples[i]["height"], samples[i]["width"]
                    text = self.tok.decode(
                        [t for t in output_ids[i].tolist() if t != 2],
                        skip_special=True)
                    self._finish(req, {
                        "text": text,
                        "mask": binary_mask(masks[i], h, w),
                        "mask_logits": masks[i],
                    })
                self.stats["post_ms"] += (time.time() - t0) * 1e3
            except Exception as e:
                # _finish is idempotent, so rows already completed before
                # the failure keep their results; only the rest see the error
                for req in reqs:
                    self._finish(req, {"error": str(e)})
