"""Live web viewer: endpoint wiring over a fake system (no jax needed)."""

import json
import urllib.request

import numpy as np

from sdslam_tpu.viewer_server import LiveViewer


class _St:
    status = "OK"
    last_frame = None


class _Tr:
    def __init__(self):
        self.st = _St()
        self.trajectory = [np.eye(4)] * 3

        class _MS:
            kf_valid = np.array([True, True, False])
            pt_valid = np.array([True] * 5 + [False] * 3)
            pt_pos = np.zeros((8, 3))
            kf_Tcw = np.stack([np.eye(4)] * 3)
            kf_mp = np.full((3, 4), -1)
            K, P, N = 3, 8, 4

        self.ms = _MS()


class _Sys:
    def __init__(self):
        self.tracker = _Tr()
        self.localization_only = False
        self.calls = []

    def reset(self):
        self.calls.append("reset")

    def activate_localization_mode(self):
        self.calls.append("loc_on")

    def deactivate_localization_mode(self):
        self.calls.append("loc_off")

    def request_stop(self):
        self.calls.append("stop")
        self.stop_requested = True


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status


def test_viewer_server_endpoints():
    sysm = _Sys()
    v = LiveViewer(sysm)
    port = v.start(port=0)  # ephemeral
    try:
        code, ctype, body = _get(port, "/")
        assert code == 200 and "text/html" in ctype and b"sdslam_tpu" in body

        code, ctype, body = _get(port, "/status.json")
        s = json.loads(body)
        assert s["state"] == "OK" and s["keyframes"] == 2 and s["points"] == 5

        code, ctype, body = _get(port, "/frame.png")
        assert code == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        # POSTs only QUEUE menu actions (the reference's CheckMenu flag
        # pattern): nothing applies until the tracking side calls
        # apply_pending at a frame boundary
        assert _post(port, "/reset") == 200
        assert _post(port, "/localization/on") == 200
        assert _post(port, "/localization/off") == 200
        assert sysm.calls == []
        s = json.loads(_get(port, "/status.json")[2])
        assert s["pending_actions"] == 3
        applied = v.apply_pending()
        assert applied == ["reset", "localization_on", "localization_off"]
        assert sysm.calls == ["reset", "loc_on", "loc_off"]
        # AR plane menu actions (Viewer.cc:112-120): points are all at z=0
        # -> a perfect plane; add then clear
        sysm.tracker.ms.pt_pos = np.concatenate(
            [np.random.default_rng(0).uniform(-1, 1, (30, 2)),
             np.zeros((30, 1))], axis=1,
        )
        sysm.tracker.ms.pt_valid = np.ones(30, bool)
        assert _post(port, "/plane/add") == 200
        # plane detection is staged as an async device->host copy and
        # completes at a later frame boundary (advisor r3: a synchronous
        # fetch stalls the frame loop in degraded link regimes)
        for _ in range(50):
            v.apply_pending()
            if v.planes:
                break
        assert len(v.planes) == 1
        assert _post(port, "/plane/clear") == 200
        v.apply_pending()
        assert len(v.planes) == 0
        # "Stop and Save" (Viewer.cc:68-84 -> System::RequestStop): queued,
        # then applied at the frame boundary
        assert _post(port, "/stop_save") == 200
        assert "stop" not in sysm.calls
        v.apply_pending()
        assert sysm.calls[-1] == "stop" and sysm.stop_requested
        s = json.loads(_get(port, "/status.json")[2])
        assert s["stop_requested"] is True
    finally:
        v.stop()
