"""Batched request queue over TTSPipeline — the serving front door.

The reference has no server (inference_plm.py is a one-shot CLI loop); this is
a capability addition: concurrent callers submit requests, a single worker
thread drains the queue, groups requests whose prompts share a padded-mel
length — the real zero-shot serving shape is many DIFFERENT speakers, so
distinct prompts batch into one `tts_batch(prompts=[...])` device call with
per-row cached style vectors — and runs singletons through `tts`. One worker
owns the device — JAX dispatch is not thread-safe-by-contract for concurrent
writers, and serialization also keeps per-bucket executables warm.

Usage:
    server = TTSServer(pipeline, max_batch=8, max_wait_ms=15)
    fut = server.submit("ni3 hao3 sp", prompt=prompt_feats, seed=7)
    wav = fut.result()
    server.close()
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

# kwargs tts_batch supports with identical semantics to tts(); requests with
# anything else (codes=..., exact=..., return_intermediates=...) run as
# singletons through tts() — never silently dropped by the batch path
_BATCHABLE_KW = frozenset({
    "denoise_ratio", "noise_scale_vc", "length_scale", "seed", "top_k",
    "use_plm", "output_sr",
})


@dataclass
class _Request:
    text: str
    prompt_key: int
    prompt: Any  # PromptFeatures
    kw: Dict[str, Any]
    future: Future = field(default_factory=Future)


class TTSServer:
    """Single-worker batching front-end over a TTSPipeline."""

    def __init__(self, pipeline, max_batch: int = 8, max_wait_ms: float = 15.0):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._closed = False
        self._worker.start()

    # ---------------- client API ----------------

    def submit(self, text: str, prompt, **kw) -> Future:
        """Enqueue one utterance; `prompt` is a PromptFeatures (use
        pipeline.prepare_prompt once per speaker). Returns a Future resolving
        to the 16 kHz float32 wav."""
        assert not self._closed, "server closed"
        req = _Request(text=text, prompt_key=id(prompt), prompt=prompt, kw=kw)
        self._q.put(req)
        return req.future

    def close(self):
        self._closed = True
        self._q.put(None)
        self._worker.join()

    # ---------------- worker ----------------

    def _drain(self, first: _Request) -> list:
        """Collect up to max_batch requests, waiting at most max_wait TOTAL
        for stragglers after the first arrival (absolute deadline — a
        trickle of stragglers must not extend the window)."""
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post shutdown for the main loop
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while True:
            req = self._q.get()
            if req is None:
                return
            batch = self._drain(req)
            # group by (prompt-mel length, sampling params): tts_batch takes
            # per-row prompts, so requests from DIFFERENT speakers coalesce
            # into one device call as long as their padded prompt-mel lengths
            # match (prepare_prompt(bucket=True) puts speakers on a 1 s
            # grid). Requests carrying non-batchable kwargs (arrays, exact
            # mode, ...) stay singletons — their values may be unhashable and
            # tts_batch rejects them
            groups: Dict[tuple, list] = {}
            singles: list = []
            for r in batch:
                if set(r.kw) <= _BATCHABLE_KW:
                    f_len = int(r.prompt.mel_ttv.shape[1])
                    key = (f_len, tuple(sorted(r.kw.items())))
                    groups.setdefault(key, []).append(r)
                else:
                    singles.append([r])
            for rs in list(groups.values()) + singles:
                try:
                    if len(rs) == 1:
                        r = rs[0]
                        wav = self.pipeline.tts(r.text, prompt=r.prompt, **r.kw)
                        r.future.set_result(np.asarray(wav))
                    elif len({r.prompt_key for r in rs}) == 1:
                        # one enrolled speaker: broadcast-style fast path
                        wavs = self.pipeline.tts_batch(
                            [r.text for r in rs], prompt=rs[0].prompt,
                            **rs[0].kw)
                        for r, w in zip(rs, wavs):
                            r.future.set_result(np.asarray(w))
                    else:
                        wavs = self.pipeline.tts_batch(
                            [r.text for r in rs],
                            prompts=[r.prompt for r in rs], **rs[0].kw)
                        for r, w in zip(rs, wavs):
                            r.future.set_result(np.asarray(w))
                except Exception as e:  # surface per-request, keep serving
                    for r in rs:
                        if not r.future.done():
                            r.future.set_exception(e)
