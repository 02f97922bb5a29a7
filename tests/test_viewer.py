"""Interactive-viewer tests (reference main.js:619-739 initEvents +
:838-857 tick; round-2 VERDICT missing #1).

Headless: drives InteractiveViewer's event machine and render loop
directly, then once more over real HTTP on a loopback socket."""

import json
import time
import urllib.request

import numpy as np
import pytest

from fspt_tpu.config import RenderConfig
from fspt_tpu.runtime.viewer import InteractiveViewer, _rotate_axis, _rotate_y


def _cfg():
    return RenderConfig(width=32, height=32, bounces=2,
                        extra_refraction_iters=1, batch_spp=1, seed=3)


@pytest.fixture(scope="module")
def viewer(small_scene):
    v = InteractiveViewer(small_scene, _cfg())
    yield v
    v.stop()


def _wait_frame(v, last_id, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        png, meta, fid = v.frame_png()
        if fid != last_id and png:
            return png, meta, fid
        time.sleep(0.05)
    raise TimeoutError("no frame produced")


def test_rotations_are_rigid():
    v = np.array([0.3, -0.5, 0.8], np.float32)
    for out in (_rotate_y(v, 0.7),
                _rotate_axis(v, [0.2, 0.9, -0.1], -1.3)):
        assert np.isclose(np.linalg.norm(out), np.linalg.norm(v), atol=1e-5)
    assert np.allclose(_rotate_y(v, 0.0), v, atol=1e-7)


def test_viewer_loop_and_events(viewer):
    v = viewer.start()
    png, meta, fid = _wait_frame(v, -1)
    assert png[:4] == b"\x89PNG"

    # camera look: direction changes, accumulation restarts
    d0 = np.asarray(v.renderer.camera.direction)
    v.handle_event({"type": "look", "dx": 40, "dy": 10})
    d1 = np.asarray(v.renderer.camera.direction)
    assert not np.allclose(d0, d1)
    assert np.isclose(np.linalg.norm(d1), 1.0, atol=1e-5)

    # while moving (a drag is a stream of events) the loop serves
    # quarter-res previews; keep the drag alive until one arrives
    got_preview = False
    deadline = time.time() + 120
    while time.time() < deadline:
        v.handle_event({"type": "look", "dx": 2, "dy": 0})
        png, meta, fid = _wait_frame(v, fid)
        if meta["preview"]:
            got_preview = True
            break
    assert got_preview
    d1 = np.asarray(v.renderer.camera.direction)

    # fly forward moves the position along the view direction
    p0 = np.asarray(v.renderer.camera.position)
    v.handle_event({"type": "fly", "w": 1, "speed": 0.1})
    p1 = np.asarray(v.renderer.camera.position)
    assert np.isclose(np.dot(p1 - p0, d1), 0.1, atol=1e-5)

    # zoom adjusts fovScale
    f0 = float(v.renderer.camera.fov_scale)
    v.handle_event({"type": "zoom", "delta": -200})
    assert float(v.renderer.camera.fov_scale) < f0

    # settle: after the debounce the loop returns to progressive frames
    # with a growing sample counter
    v.handle_event({"type": "moveend"})
    deadline = time.time() + 120
    while time.time() < deadline:
        png, meta, fid = _wait_frame(v, fid)
        if not meta["preview"] and meta["samples"] >= 2:
            break
    assert not meta["preview"] and meta["samples"] >= 2

    # tonemap-only sliders must NOT restart accumulation
    s0 = meta["samples"]
    v.handle_event({"type": "slider", "name": "exposure", "value": 2.0})
    assert v.renderer.post.exposure == 2.0
    png, meta, fid = _wait_frame(v, fid)
    assert meta["samples"] >= s0

    # envTheta is dirty: accumulation restarts
    v.handle_event({"type": "slider", "name": "envTheta", "value": 1.0})
    assert float(np.asarray(v.renderer.arrays.env_theta)) == 1.0


def test_viewer_http(small_scene):
    import socket
    import threading
    v = InteractiveViewer(small_scene, _cfg())
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    t = threading.Thread(target=v.serve, kwargs=dict(port=port),
                         daemon=True)
    t.start()
    try:
        deadline = time.time() + 120
        page = None
        while time.time() < deadline:
            try:
                page = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5).read()
                break
            except OSError:
                time.sleep(0.2)
        assert page and b"fspt_tpu viewer" in page
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/input",
            data=json.dumps({"type": "zoom", "delta": 100}).encode(),
            method="POST")
        assert urllib.request.urlopen(req, timeout=10).status == 204
        r = urllib.request.urlopen(f"http://127.0.0.1:{port}/frame",
                                   timeout=60)
        assert r.headers["Content-Type"] == "image/png"
        assert json.loads(r.headers["X-Meta"])["samples"] >= 0
    finally:
        v.stop()
