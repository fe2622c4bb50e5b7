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
    """With the draining Event set (what the SIGTERM handler does), the
    queue loop must process everything ALREADY queued — replying to each —
    and return once the queue runs dry, without needing an _EOF marker
    (stdin never closes under a preemption)."""
    import json
    import threading

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
    draining = threading.Event()
    draining.set()
    rc = _serve_queue(pipe=None, args=_args(), q=q, _EOF=object(),
                      stats=_Stats(), draining=draining)
    assert rc == 0
    assert [r["id"] for r in client.sent] == ["a", "b"]
    assert all(r["ok"] for r in client.sent)


def test_enqueue_rejects_work_while_draining():
    """Once the drain flag is set, new work lines error-reply
    shutting_down (never enqueue — admitting work would make the drain
    unreachable under load) while cmd lines stay admitted, mirroring the
    queue_full policy."""
    import json
    import threading

    args = _args()
    q = queue.Queue()
    client = _FakeClient()
    draining = threading.Event()
    draining.set()
    transport._enqueue(q, json.dumps({"id": "w", "indices": [0]}), client,
                       args, _Stats(), draining)
    assert q.qsize() == 0
    assert client.sent[-1]["ok"] is False
    assert "shutting_down" in client.sent[-1]["error"]
    assert client.sent[-1]["id"] == "w"
    transport._enqueue(q, json.dumps({"cmd": "shutdown"}), client, args,
                       _Stats(), draining)
    assert q.qsize() == 1  # cmds always admitted
    # flag clear -> work admits normally
    draining.clear()
    transport._enqueue(q, json.dumps({"id": "w2"}), client, args,
                       _Stats(), draining)
    assert q.qsize() == 2


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
