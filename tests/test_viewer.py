"""Live viewer endpoints: frame streaming, status, debug-mode switching."""
import json
import threading
import time
import urllib.parse
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def viewer():
    from raytracevs_tpu.api import viewer as V

    V.RESOLUTIONS = [(48, 48), (64, 64)]  # keep the res-cycle cheap in tests
    state = V.ViewerState("/root/reference/sample_scene.rtvs", 48, 48,
                          overrides={"samples_per_pixel": 1, "max_bounces": 3})
    server = V.make_server(state, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    yield state, port
    server.shutdown()
    state.loop.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        return r.status, r.read()


def _wait_for_frame(port, min_frames=1, timeout=180.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        code, body = _get(port, "/status")
        s = json.loads(body)
        if s["frames"] >= min_frames:
            return s
        time.sleep(0.5)
    raise TimeoutError("no frame rendered")


def test_viewer_serves_page_and_frames(viewer):
    state, port = viewer
    code, page = _get(port, "/")
    assert code == 200 and b"raytracevs_tpu viewer" in page

    s = _wait_for_frame(port)
    assert s["width"] == 48 and s["height"] == 48
    assert s["render_ms"] > 0

    code, png = _get(port, "/frame.png")
    assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
    from raytracevs_tpu.io.png import read_png

    import io, tempfile, os

    f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
    f.write(png)
    f.close()
    img = read_png(f.name)
    os.unlink(f.name)
    assert img.shape == (48, 48, 4)
    assert img[..., :3].any()  # not black


def test_viewer_debug_mode_switch(viewer):
    state, port = viewer
    _wait_for_frame(port)
    code, body = _get(port, "/cmd?op=debug&mode=5")  # magenta sanity fill
    assert json.loads(body)["debug_mode"] == 5
    frames_before = json.loads(_get(port, "/status")[1])["frames"]
    _wait_for_frame(port, min_frames=frames_before + 1)

    code, png = _get(port, "/frame.png")
    from raytracevs_tpu.io.png import read_png
    import tempfile, os

    f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
    f.write(png)
    f.close()
    img = read_png(f.name)
    os.unlink(f.name)
    # mode 5 = solid magenta (Composite.hlsl:223-227)
    assert (img[..., 0] > 200).mean() > 0.95
    assert (img[..., 1] < 50).mean() > 0.95
    _get(port, "/cmd?op=debug&mode=0")


def test_viewer_status_fields(viewer):
    state, port = viewer
    s = _wait_for_frame(port)
    for key in ("fps", "render_ms", "frames", "debug_mode", "photon_debug_mode",
                "backend", "rays"):
        assert key in s


def test_viewer_graph_editor_roundtrip(viewer):
    """The property-panel flow: /graph lists nodes, setprop edits through
    the undoable command stack, undo restores the original value."""
    import urllib.parse

    state, port = viewer
    _wait_for_frame(port)

    code, body = _get(port, "/graph")
    g = json.loads(body)
    assert code == 200 and g["nodes"] and g["connections"]
    # Camera FieldOfView is property-driven in the sample scene (Position
    # and LookAt arrive through sockets, which would shadow property edits
    # -- the editor contract).
    cam = next(n for n in g["nodes"] if n["type"] == "CameraNode")
    old_fov = float(cam["properties"]["FieldOfView"])
    new_fov = old_fov + 10.0

    props = urllib.parse.quote(json.dumps({"FieldOfView": new_fov}))
    _get(port, f"/cmd?op=setprop&node={cam['id']}&props={props}")
    g2 = json.loads(_get(port, "/graph")[1])
    c2 = next(n for n in g2["nodes"] if n["id"] == cam["id"])
    assert float(c2["properties"]["FieldOfView"]) == new_fov
    assert g2["can_undo"]
    # the engine scene picked the edit up (re-evaluated graph)
    assert abs(float(state.engine._scene.camera.field_of_view) - new_fov) < 1e-6

    _get(port, "/cmd?op=undo")
    g3 = json.loads(_get(port, "/graph")[1])
    c3 = next(n for n in g3["nodes"] if n["id"] == cam["id"])
    assert float(c3["properties"]["FieldOfView"]) == old_fov
    assert g3["can_redo"]
    assert abs(float(state.engine._scene.camera.field_of_view) - old_fov) < 1e-6

    # edits survive a resolution switch (the graph is the source of truth)
    _get(port, "/cmd?op=redo")
    _get(port, "/cmd?op=res&dir=1")
    g4 = json.loads(_get(port, "/graph")[1])
    c4 = next(n for n in g4["nodes"] if n["id"] == cam["id"])
    assert float(c4["properties"]["FieldOfView"]) == new_fov
    _get(port, "/cmd?op=undo")


def test_viewer_graph_structure_edits(viewer):
    """Add/delete/disconnect through the command stack, all undoable."""
    state, port = viewer
    _wait_for_frame(port)
    g0 = json.loads(_get(port, "/graph")[1])
    n0 = len(g0["nodes"])
    assert "PointLightNode" in g0["node_types"]

    _get(port, "/cmd?op=addnode&type=PointLightNode")
    g1 = json.loads(_get(port, "/graph")[1])
    assert len(g1["nodes"]) == n0 + 1
    added = next(n for n in g1["nodes"] if n["id"] not in
                 {m["id"] for m in g0["nodes"]})
    assert added["type"] == "PointLightNode"
    assert added["outputs"]  # sockets exposed for the connect UI

    _get(port, f"/cmd?op=delnode&node={added['id']}")
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == n0
    _get(port, "/cmd?op=undo")  # un-delete
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == n0 + 1
    _get(port, "/cmd?op=undo")  # un-add
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == n0

    # disconnect an existing connection, then restore it
    c = g0["connections"][0]
    nconn = len(g0["connections"])
    _get(port, f"/cmd?op=disconnect&in_node={c['in_node']}"
               f"&in_sock={urllib.parse.quote(c['in_sock'])}")
    assert len(json.loads(_get(port, "/graph")[1])["connections"]) == nconn - 1
    _get(port, "/cmd?op=undo")
    assert len(json.loads(_get(port, "/graph")[1])["connections"]) == nconn
