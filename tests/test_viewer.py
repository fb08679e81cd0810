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
    from conftest import analytic_scene_file

    state = V.ViewerState(analytic_scene_file(), 48, 48,
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


def test_viewer_canvas_endpoints(viewer):
    """The node-graph canvas contract (NodeEditorView analog): positions
    and socket types in /graph, drag-move through the command stack
    (undoable), add-at-position, multi-delete as one undo entry, and JSON
    error responses for bad requests instead of a dead render loop."""
    state, port = viewer
    _wait_for_frame(port)
    g0 = json.loads(_get(port, "/graph")[1])

    # canvas data: every node carries a position and typed sockets
    for n in g0["nodes"]:
        assert isinstance(n["x"], float) and isinstance(n["y"], float)
        for s in n["inputs"] + n["outputs"]:
            assert set(s) == {"name", "type"}
    # connections carry both endpoints for bezier drawing
    c = g0["connections"][0]
    assert {"out_node", "out_sock", "in_node", "in_sock"} <= set(c)

    # drag-move: one undo entry for a multi-node move
    a, b = g0["nodes"][0], g0["nodes"][1]
    moves = json.dumps([
        {"node": a["id"], "x": a["x"] + 50.0, "y": a["y"] - 20.0},
        {"node": b["id"], "x": b["x"] + 5.0, "y": b["y"] + 5.0},
    ])
    _get(port, f"/cmd?op=move&moves={urllib.parse.quote(moves)}")
    g1 = json.loads(_get(port, "/graph")[1])
    a1 = next(n for n in g1["nodes"] if n["id"] == a["id"])
    assert (a1["x"], a1["y"]) == (a["x"] + 50.0, a["y"] - 20.0)
    _get(port, "/cmd?op=undo")  # single undo restores BOTH nodes
    g2 = json.loads(_get(port, "/graph")[1])
    for orig in (a, b):
        n2 = next(n for n in g2["nodes"] if n["id"] == orig["id"])
        assert (n2["x"], n2["y"]) == (orig["x"], orig["y"])

    # add at a canvas position
    _get(port, "/cmd?op=addnode&type=FloatNode&x=123.5&y=-7.25")
    g3 = json.loads(_get(port, "/graph")[1])
    added = next(n for n in g3["nodes"] if n["id"] not in
                 {m["id"] for m in g0["nodes"]})
    assert (added["x"], added["y"]) == (123.5, -7.25)

    # multi-delete is one composite undo entry
    _get(port, "/cmd?op=addnode&type=FloatNode&x=0&y=0")
    g4 = json.loads(_get(port, "/graph")[1])
    new_ids = [n["id"] for n in g4["nodes"]
               if n["id"] not in {m["id"] for m in g0["nodes"]}]
    assert len(new_ids) == 2
    _get(port, f"/cmd?op=delnodes&nodes={','.join(new_ids)}")
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == len(g0["nodes"])
    _get(port, "/cmd?op=undo")
    assert (len(json.loads(_get(port, "/graph")[1])["nodes"])
            == len(g0["nodes"]) + 2)
    _get(port, "/cmd?op=undo")
    _get(port, "/cmd?op=undo")
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == len(g0["nodes"])


def test_viewer_cmd_error_responses(viewer):
    """Bad commands come back as JSON errors; the render loop stays alive
    (ADVICE round-2: /cmd must not crash or freeze the viewer)."""
    state, port = viewer
    _wait_for_frame(port)

    out = json.loads(_get(port, "/cmd?op=delnode&node=not-a-uuid")[1])
    assert "bad node id" in out["error"]
    out = json.loads(_get(port, "/cmd?op=addnode&type=NopeNode")[1])
    assert "unknown node type" in out["error"]
    g = json.loads(_get(port, "/graph")[1])
    cam = next(n for n in g["nodes"] if n["type"] == "CameraNode")
    out = json.loads(_get(
        port, f"/cmd?op=setprop&node={cam['id']}&props=%5B1%2C2%5D")[1])
    assert "props must be a JSON object" in out["error"]
    # incompatible sockets: server-side sockets_compatible guard
    scene_n = next(n for n in g["nodes"] if n["type"] == "SceneNode")
    cam_out = next(n for n in g["nodes"] if n["type"] == "CameraNode")
    obj_in = next(s for s in scene_n["inputs"] if s["type"] == "OBJECT")
    out = json.loads(_get(
        port, f"/cmd?op=connect&out_node={cam_out['id']}"
              f"&out_sock={urllib.parse.quote(cam_out['outputs'][0]['name'])}"
              f"&in_node={scene_n['id']}"
              f"&in_sock={urllib.parse.quote(obj_in['name'])}")[1])
    assert out.get("error")
    # the loop still renders after all that
    before = json.loads(_get(port, "/status")[1])["frames"]
    _wait_for_frame(port, min_frames=before + 1)


def test_viewer_copy_paste(viewer):
    """Copy a selection + intra-selection wiring, paste as one undo entry
    (HandleCopy/HandlePaste analogs)."""
    state, port = viewer
    _wait_for_frame(port)
    g0 = json.loads(_get(port, "/graph")[1])
    n0 = len(g0["nodes"])
    c = g0["connections"][0]
    ids = f"{c['out_node']},{c['in_node']}"

    out = json.loads(_get(port, f"/cmd?op=copy&nodes={ids}")[1])
    assert out["copied"] == 2
    _get(port, "/cmd?op=paste")
    g1 = json.loads(_get(port, "/graph")[1])
    assert len(g1["nodes"]) == n0 + 2
    # the pasted pair carries the intra-selection connection
    new_ids = {n["id"] for n in g1["nodes"]} - {n["id"] for n in g0["nodes"]}
    pasted_conns = [cc for cc in g1["connections"]
                    if cc["out_node"] in new_ids and cc["in_node"] in new_ids]
    assert len(pasted_conns) == 1
    # pasted nodes are offset from the originals
    orig = next(n for n in g0["nodes"] if n["id"] == c["out_node"])
    copy_n = next(n for n in g1["nodes"]
                  if n["id"] in new_ids and n["type"] == orig["type"])
    assert (copy_n["x"], copy_n["y"]) == (orig["x"] + 30.0, orig["y"] + 30.0)

    _get(port, "/cmd?op=undo")  # one undo removes the whole paste
    assert len(json.loads(_get(port, "/graph")[1])["nodes"]) == n0


def test_viewer_screenshot(viewer, tmp_path, monkeypatch):
    """op=screenshot writes the current frame PNG to the settings
    screenshot folder (SettingsService.cs screenshot_folder analog)."""
    import os

    state, port = viewer
    _wait_for_frame(port)
    monkeypatch.setenv("HOME", str(tmp_path))
    out = json.loads(_get(port, "/cmd?op=screenshot")[1])
    path = out["screenshot"]
    assert os.path.exists(path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
