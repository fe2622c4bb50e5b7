"""Unit tests for the serving seams (eeg2video_tpu.serving, round 5).

The serve CLI tests exercise these end to end behind a warm pipeline; here
the queue/batching/knob policies are driven in isolation with fakes — no
models, no transport, millisecond tests (VERDICT round-4 weak #8: the
monolith's defects hid where only end-to-end tests looked).
"""

import queue
from types import SimpleNamespace

import pytest

from eeg2video_tpu.serving import transport
from eeg2video_tpu.serving.runtimes import (
    _check_request_knobs,
    _knob_key,
)
from eeg2video_tpu.serving.transport import _Stats, _serve_queue


def _args(**over):
    base = dict(num_inference_steps=100, guidance_scale=12.5, height=288,
                width=512, video_length=6, sampler="ddim",
                gif_encoder="native", coalesce=False, coalesce_wait=0.0,
                max_batch=1, max_queue=256, allow_request_knobs=False)
    base.update(over)
    return SimpleNamespace(**base)


def test_knob_key_groups_on_resolved_values():
    args = _args()
    assert _knob_key(args, {}) == _knob_key(args, {"height": 288})
    assert _knob_key(args, {}) != _knob_key(args, {"height": 144})
    assert _knob_key(args, {"seed": 1}) == _knob_key(args, {"seed": 2})


def test_check_request_knobs_policy():
    args = _args()
    _check_request_knobs(args, {})  # no overrides
    _check_request_knobs(args, {"num_inference_steps": 100})  # == server's
    _check_request_knobs(args, {"guidance_scale": 3.0})  # traced, free
    with pytest.raises(ValueError, match="allow_request_knobs"):
        _check_request_knobs(args, {"num_inference_steps": 20})
    _check_request_knobs(_args(allow_request_knobs=True),
                         {"num_inference_steps": 20})


def test_stats_counters():
    s = _Stats()
    s.reply({"ok": True, "clips": 3, "latency_s": 1.5})
    s.reply({"ok": False, "error": "x"})
    s.reply({"ok": True, "pong": 1.0})  # pings don't count
    snap = s.snapshot()
    assert snap["requests"] == 2 and snap["clips"] == 3
    assert snap["errors"] == 1 and snap["mean_latency_s"] == 1.5
    assert "queued" not in snap  # plain stdin mode: no queue to report


def test_stats_reports_queue_depth_and_drain_state():
    import threading

    s = _Stats()
    s.queue = queue.Queue()
    s.queue.put(("x", None))
    s.draining = threading.Event()
    snap = s.snapshot()
    assert snap["queued"] == 1 and snap["draining"] is False
    s.draining.set()
    assert s.snapshot()["draining"] is True


class _FakeClient:
    def __init__(self):
        self.sent = []
        self.alive = True

    def send(self, resp):
        self.sent.append(resp)


def _drive_queue(monkeypatch, lines, args):
    """Run _serve_queue over pre-filled lines with _process_group faked to
    an immediate ok-reply recorder; returns (groups, client.sent)."""
    groups = []

    def fake_group(pipe, args_, group, emit):
        groups.append([req for req, _t0, _client in group])
        for req, _t0, client in group:
            emit({"ok": True, "clips": 0, "gifs": [], "latency_s": 0.0},
                 req, client)

    monkeypatch.setattr(transport, "_process_group", fake_group)
    q = queue.Queue()
    client = _FakeClient()
    _EOF = object()
    for line in lines:
        q.put((line, client))
    q.put((_EOF, client))
    rc = _serve_queue(pipe=None, args=args, q=q, _EOF=_EOF,
                      stats=_Stats())
    assert rc == 0
    return groups, client.sent


def test_serve_queue_coalesces_compatible_requests(monkeypatch):
    import json

    args = _args(coalesce=True, allow_request_knobs=True)
    groups, sent = _drive_queue(monkeypatch, [
        json.dumps({"id": "a", "indices": [0]}),
        json.dumps({"id": "b", "indices": [1]}),
        json.dumps({"id": "c", "indices": [2], "num_inference_steps": 1}),
        json.dumps({"cmd": "shutdown"}),
    ], args)
    # a+b share resolved knobs -> one group; c's override defers it
    assert [[r["id"] for r in g] for g in groups] == [["a", "b"], ["c"]]
    assert [r.get("id", "bye" if r.get("bye") else "?") for r in sent] == [
        "a", "b", "c", "bye"]


def test_serve_queue_no_coalesce_single_groups(monkeypatch):
    import json

    groups, sent = _drive_queue(monkeypatch, [
        json.dumps({"id": "a"}),
        json.dumps({"id": "b"}),
    ], _args())
    assert [[r["id"] for r in g] for g in groups] == [["a"], ["b"]]


def test_serve_queue_drains_queued_work_on_sigterm_flag(monkeypatch):
    """With the drain flag set (what the SIGTERM handler does), the
    queue loop must process everything ALREADY queued — replying to each —
    and return once the queue runs dry, without needing an _EOF marker
    (stdin never closes under a preemption)."""
    import json

    groups = []

    def fake_group(pipe, args_, group, emit):
        groups.append([req for req, _t0, _client in group])
        for req, _t0, client in group:
            emit({"ok": True, "clips": 0, "gifs": [], "latency_s": 0.0},
                 req, client)

    monkeypatch.setattr(transport, "_process_group", fake_group)
    q = queue.Queue()
    client = _FakeClient()
    for rid in ("a", "b"):
        q.put((json.dumps({"id": rid, "indices": [0]}), client))
    drain = transport._Drain()
    drain.flag.set()
    rc = _serve_queue(pipe=None, args=_args(), q=q, _EOF=object(),
                      stats=_Stats(), drain=drain)
    assert rc == 0
    assert [r["id"] for r in client.sent] == ["a", "b"]
    assert all(r["ok"] for r in client.sent)


def test_enqueue_rejects_everything_while_draining():
    """Once the drain flag is set, EVERY line — cmds included — error-
    replies shutting_down and nothing enqueues: admitting work would make
    the drain unreachable under load, and an admitted cmd could race the
    loop's final queue-empty exit check and land in a dead queue with no
    reply.  Blank keep-alive lines stay silently ignored (as the parse
    path treats them)."""
    import json

    args = _args()
    q = queue.Queue()
    client = _FakeClient()
    drain = transport._Drain()
    drain.flag.set()
    transport._enqueue(q, json.dumps({"id": "w", "indices": [0]}), client,
                       args, _Stats(), drain)
    assert q.qsize() == 0
    assert client.sent[-1]["ok"] is False
    assert "shutting_down" in client.sent[-1]["error"]
    assert client.sent[-1]["id"] == "w"
    transport._enqueue(q, json.dumps({"cmd": "shutdown"}), client, args,
                       _Stats(), drain)
    assert q.qsize() == 0  # cmds refused during a drain too
    assert "shutting_down" in client.sent[-1]["error"]
    n_sent = len(client.sent)
    transport._enqueue(q, "   \n", client, args, _Stats(), drain)
    assert q.qsize() == 0 and len(client.sent) == n_sent  # silent
    # flag clear -> work and cmds admit normally
    drain.flag.clear()
    transport._enqueue(q, json.dumps({"id": "w2"}), client, args,
                       _Stats(), drain)
    transport._enqueue(q, json.dumps({"cmd": "ping"}), client, args,
                       _Stats(), drain)
    assert q.qsize() == 2


def test_enqueue_queue_full_still_admits_cmds_with_drain_state():
    """The queue_full path keeps its cmds-always-admitted policy when the
    (clear) drain state is wired in."""
    import json

    args = _args(max_queue=1)
    q = queue.Queue()
    client = _FakeClient()
    drain = transport._Drain()
    q.put(("x", client))
    transport._enqueue(q, json.dumps({"id": "w"}), client, args,
                       _Stats(), drain)
    assert q.qsize() == 1
    assert "queue_full" in client.sent[-1]["error"]
    transport._enqueue(q, json.dumps({"cmd": "stats"}), client, args,
                       _Stats(), drain)
    assert q.qsize() == 2  # cmd admitted past backpressure


def test_install_drain_handler_restores_previous_disposition():
    """serve can run embedded (tests run main() in-process): the SIGTERM
    handler must be restorable so the host process's disposition comes
    back after the loop returns."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        pytest.skip("signal handlers only install on the main thread")
    prev = signal.getsignal(signal.SIGTERM)
    drain = transport._Drain()
    token = transport._install_drain_handler(drain)
    assert token is not None
    try:
        assert signal.getsignal(signal.SIGTERM) is not prev
    finally:
        transport._restore_handler(token)
    assert signal.getsignal(signal.SIGTERM) is prev


def test_serve_queue_protocol_errors_and_cmds(monkeypatch):
    import json

    groups, sent = _drive_queue(monkeypatch, [
        "not json",
        "[1, 2]",
        json.dumps({"cmd": "ping"}),
        json.dumps({"cmd": "nope"}),
        json.dumps({"id": "a"}),
    ], _args())
    assert [[r["id"] for r in g] for g in groups] == [["a"]]
    bad = [r for r in sent if not r.get("ok")]
    assert len(bad) == 3  # two bad-json lines + unknown cmd
    assert any("pong" in r for r in sent)
