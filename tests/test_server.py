"""TTSServer queue/grouping logic with a stub pipeline (no device, fast):
batching by (prompt, params), singleton routing for non-batchable kwargs
(regression: an unhashable kwarg used to kill the worker thread), absolute
straggler deadline, and error isolation."""
import threading
import time

import numpy as np

from megatts2_hierspeechpp_tpu.infer.server import TTSServer


class StubPipeline:
    def __init__(self):
        self.batch_calls = []
        self.single_calls = []
        self.lock = threading.Lock()

    def tts(self, text, prompt=None, **kw):
        with self.lock:
            self.single_calls.append((text, kw))
        if text == "boom":
            raise RuntimeError("synthesis failed")
        return np.full(4, float(len(text)), np.float32)

    def tts_batch(self, texts, prompt=None, **kw):
        with self.lock:
            self.batch_calls.append((tuple(texts), kw))
        return [np.full(4, float(len(t)), np.float32) for t in texts]


def test_same_prompt_requests_batch():
    pipe = StubPipeline()
    server = TTSServer(pipe, max_batch=4, max_wait_ms=100)
    prompt = object()
    futs = [server.submit(t, prompt, seed=1) for t in ("aa", "bbb", "c")]
    outs = [f.result(timeout=10) for f in futs]
    server.close()
    assert len(pipe.batch_calls) == 1 and not pipe.single_calls
    assert [o[0] for o in outs] == [2.0, 3.0, 1.0]


def test_unbatchable_kwargs_run_as_singletons():
    """codes= carries an ndarray (unhashable): must route through tts(),
    not crash the worker on the group key."""
    pipe = StubPipeline()
    server = TTSServer(pipe, max_batch=4, max_wait_ms=100)
    prompt = object()
    f1 = server.submit("aa", prompt, seed=1)
    f2 = server.submit("bbb", prompt, codes=np.arange(5))
    r1, r2 = f1.result(timeout=10), f2.result(timeout=10)
    # server still alive for further work after the ndarray kwarg
    f3 = server.submit("dddd", prompt, seed=1)
    assert f3.result(timeout=10)[0] == 4.0
    server.close()
    assert any("codes" in kw for _, kw in pipe.single_calls)
    assert r1[0] == 2.0 and r2[0] == 3.0


def test_distinct_prompts_do_not_share_a_batch():
    pipe = StubPipeline()
    server = TTSServer(pipe, max_batch=4, max_wait_ms=100)
    p1, p2 = object(), object()
    futs = [server.submit("aa", p1, seed=1), server.submit("bb", p1, seed=1),
            server.submit("cc", p2, seed=1)]
    for f in futs:
        f.result(timeout=10)
    server.close()
    # p1 pair batches; p2 runs alone
    assert len(pipe.batch_calls) == 1 and len(pipe.single_calls) == 1


def test_worker_survives_request_errors():
    pipe = StubPipeline()
    server = TTSServer(pipe, max_batch=1, max_wait_ms=1)
    prompt = object()
    bad = server.submit("boom", prompt)
    ok = server.submit("fine", prompt)
    assert ok.result(timeout=10)[0] == 4.0
    try:
        bad.result(timeout=10)
        raise AssertionError("expected the submit error to surface")
    except RuntimeError as e:
        assert "synthesis failed" in str(e)
    server.close()


def test_straggler_window_is_absolute():
    """A trickle of arrivals must not extend the wait past ~max_wait."""
    pipe = StubPipeline()
    server = TTSServer(pipe, max_batch=64, max_wait_ms=150)
    prompt = object()

    stop = threading.Event()

    def trickle():
        while not stop.is_set():
            server.submit("zz", prompt, seed=1)
            time.sleep(0.02)

    t0 = time.monotonic()
    first = server.submit("aa", prompt, seed=1)
    th = threading.Thread(target=trickle, daemon=True)
    th.start()
    first.result(timeout=10)
    elapsed = time.monotonic() - t0
    stop.set()
    th.join()
    server.close()
    assert elapsed < 1.5, f"first request waited {elapsed:.2f}s"
