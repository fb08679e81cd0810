"""Live interactive viewer: browser-based render window.

The headless-environment equivalent of the reference's WPF render window
(Views/RenderWindow.xaml.cs:117-519): a continuously-rendering loop with
FPS / render-ms status (the RenderCompleted event, :64-66), runtime
photon-debug cycling (the P-key handler, :628), the composite DebugMode
selector (Composite.hlsl:184-371) and resolution switching
(MainWindow.xaml.cs:24-25, 1280x720 / 1920x1080).

Instead of a WriteableBitmap blit the frame travels as PNG over a local
HTTP socket to a browser page; keystrokes come back over the same socket.

Usage:
    python -m raytracevs_tpu.api.viewer scene.rtvs [--port 8173] [--cpu]

Keys (in the browser):
    p        cycle photon debug mode (0-12)
    0-9      composite debug mode (0 = off)
    r        reset temporal history
    [ / ]    cycle resolution presets
    u / y    undo / redo property edits

The side panel is the property-editor analog (NodeEditorView property
panel + PropertyCommands): it lists the scene's node graph, lets you edit
any node's .rtvs-shaped properties as JSON while the scene renders, and
applies them through the undoable command stack (scene/commands.py);
"save .rtvs" writes the edited graph back with save_graph.
"""
from __future__ import annotations

import argparse
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

RESOLUTIONS = [(640, 360), (1280, 720), (1920, 1080)]

_PAGE = """<!DOCTYPE html>
<html><head><title>raytracevs_tpu viewer</title><style>
body { background:#111; color:#ddd; font:13px monospace; margin:0;
       display:flex; flex-direction:column; height:100vh; }
#bar { padding:6px 10px; background:#1c1c1c; }
#main { display:flex; flex:1; min-height:0; }
#view { display:block; margin:0 auto; image-rendering:pixelated;
        max-width:100%; max-height:100%; object-fit:contain; }
#vwrap { flex:1; overflow:hidden; text-align:center; }
#panel { width:340px; background:#181818; overflow-y:auto; padding:8px;
         border-left:1px solid #333; }
#panel h4 { margin:8px 0 4px; color:#8cf; }
.node { cursor:pointer; padding:2px 4px; border-radius:3px; }
.node:hover { background:#262626; }
.node.sel { background:#234; }
textarea { width:100%; height:150px; background:#0d0d0d; color:#cfc;
           font:12px monospace; border:1px solid #333; }
button { background:#333; color:#ddd; border:1px solid #555;
         border-radius:3px; margin:2px; cursor:pointer; }
kbd { background:#333; padding:1px 5px; border-radius:3px; }
</style></head><body>
<div id="bar">connecting…</div>
<div id="main">
  <div id="vwrap"><img id="view" alt="render"></div>
  <div id="panel">
    <div>
      <button onclick="cmd('op=undo')">undo</button>
      <button onclick="cmd('op=redo')">redo</button>
      <button onclick="cmd('op=save')">save .rtvs</button>
      <button onclick="loadGraph()">refresh</button>
    </div>
    <div>
      <select id="ntype"></select>
      <button onclick="addNode()">add node</button>
    </div>
    <h4>nodes</h4><div id="nodes"></div>
    <h4 id="seltitle"></h4>
    <textarea id="props" style="display:none" spellcheck="false"></textarea>
    <button id="apply" style="display:none" onclick="applyProps()">apply</button>
    <button id="delnode" style="display:none" onclick="delNode()">delete node</button>
    <h4>connect</h4>
    <div>
      <select id="c_out_n" onchange="fillSocks()"></select>
      <select id="c_out_s"></select> →<br>
      <select id="c_in_n" onchange="fillSocks()"></select>
      <select id="c_in_s"></select>
      <button onclick="connectSock()">connect</button>
    </div>
    <h4>connections</h4><div id="conns" style="color:#888"></div>
  </div>
</div>
<div id="bar2" style="padding:6px 10px">
<kbd>p</kbd> photon debug &nbsp; <kbd>0-9</kbd> debug view &nbsp;
<kbd>r</kbd> reset history &nbsp; <kbd>[</kbd>/<kbd>]</kbd> resolution</div>
<script>
const img = document.getElementById('view');
const bar = document.getElementById('bar');
let busy = false, selId = null, graph = null;
async function tick() {
  if (!busy) {
    busy = true;
    try {
      const r = await fetch('/frame.png?t=' + Date.now());
      if (r.ok) {
        const blob = await r.blob();
        const url = URL.createObjectURL(blob);
        img.onload = () => URL.revokeObjectURL(url);
        img.src = url;
      }
      const s = await (await fetch('/status')).json();
      bar.textContent =
        `${s.width}x${s.height}  |  ${s.fps.toFixed(1)} FPS  |  ` +
        `${s.render_ms.toFixed(1)} ms/frame  |  frame ${s.frames}  |  ` +
        `backend ${s.backend}  |  debug ${s.debug_mode}  |  ` +
        `photon ${s.photon_debug_mode}`;
    } catch (e) { bar.textContent = 'disconnected: ' + e; }
    busy = false;
  }
  setTimeout(tick, 100);
}
tick();
async function cmd(q) { await fetch('/cmd?' + q); loadGraph(); }
async function loadGraph() {
  graph = await (await fetch('/graph')).json();
  const list = document.getElementById('nodes');
  list.innerHTML = '';
  for (const n of graph.nodes) {
    const d = document.createElement('div');
    d.className = 'node' + (n.id === selId ? ' sel' : '');
    d.textContent = `${n.title}  (${n.type})`;
    d.onclick = () => selectNode(n.id);
    list.appendChild(d);
  }
  document.getElementById('conns').innerHTML =
    graph.connections.map(c =>
      `<span style="cursor:pointer" title="disconnect" onclick=` +
      `"cmd('op=disconnect&in_node=${c.in_node}&in_sock=` +
      `${encodeURIComponent(c.in_sock)}')">✕</span> ${c.from} → ${c.to}`
    ).join('<br>');
  const tsel = document.getElementById('ntype');
  if (!tsel.options.length)
    for (const t of graph.node_types)
      tsel.add(new Option(t, t));
  for (const [nid, sid] of [['c_out_n', null], ['c_in_n', null]]) {
    const sel = document.getElementById(nid);
    const cur = sel.value;
    sel.innerHTML = '';
    for (const n of graph.nodes) sel.add(new Option(n.title, n.id));
    if (cur) sel.value = cur;
  }
  fillSocks();
  if (selId) showProps();
}
function fillSocks() {
  const on = graph.nodes.find(n => n.id === document.getElementById('c_out_n').value);
  const inn = graph.nodes.find(n => n.id === document.getElementById('c_in_n').value);
  const os = document.getElementById('c_out_s'), is = document.getElementById('c_in_s');
  os.innerHTML = ''; is.innerHTML = '';
  if (on) for (const s of on.outputs) os.add(new Option(s, s));
  if (inn) for (const s of inn.inputs) is.add(new Option(s, s));
}
function addNode() {
  cmd('op=addnode&type=' + document.getElementById('ntype').value);
}
function delNode() {
  if (selId) { cmd('op=delnode&node=' + selId); selId = null;
    document.getElementById('props').style.display = 'none';
    document.getElementById('apply').style.display = 'none';
    document.getElementById('delnode').style.display = 'none';
    document.getElementById('seltitle').textContent = ''; }
}
function connectSock() {
  cmd('op=connect&out_node=' + document.getElementById('c_out_n').value +
      '&out_sock=' + encodeURIComponent(document.getElementById('c_out_s').value) +
      '&in_node=' + document.getElementById('c_in_n').value +
      '&in_sock=' + encodeURIComponent(document.getElementById('c_in_s').value));
}
function selectNode(id) { selId = id; loadGraph(); showProps(); }
function showProps() {
  const n = graph.nodes.find(n => n.id === selId);
  if (!n) return;
  document.getElementById('seltitle').textContent = 'edit: ' + n.title;
  const ta = document.getElementById('props');
  ta.style.display = 'block';
  ta.value = JSON.stringify(n.properties, null, 1);
  document.getElementById('apply').style.display = 'inline';
  document.getElementById('delnode').style.display = 'inline';
}
async function applyProps() {
  const ta = document.getElementById('props');
  try { JSON.parse(ta.value); } catch (e) { alert('bad JSON: ' + e); return; }
  await cmd('op=setprop&node=' + selId +
            '&props=' + encodeURIComponent(ta.value));
}
document.addEventListener('keydown', (e) => {
  if (e.target.tagName === 'TEXTAREA') return;  // typing in the editor
  let q = null;
  if (e.key === 'p' || e.key === 'P') q = 'op=photon';
  else if (e.key >= '0' && e.key <= '9') q = 'op=debug&mode=' + e.key;
  else if (e.key === 'r' || e.key === 'R') q = 'op=reset';
  else if (e.key === '[') q = 'op=res&dir=-1';
  else if (e.key === ']') q = 'op=res&dir=1';
  else if (e.key === 'u' || e.key === 'U') q = 'op=undo';
  else if (e.key === 'y' || e.key === 'Y') q = 'op=redo';
  if (q) cmd(q);
});
loadGraph();
</script></body></html>"""


class ViewerState:
    """Shared state between the render loop and the HTTP handlers."""

    def __init__(self, scene_path: str, width: int, height: int,
                 overrides=None, backend: str = "auto"):
        self.scene_path = scene_path
        self.overrides = dict(overrides or {})
        self.backend = backend
        self.lock = threading.Lock()
        # Serializes key-command handling: ThreadingHTTPServer runs each
        # request on its own thread, and cmd() stops/reloads/starts the
        # engine — two concurrent keystrokes must not interleave that.
        # Separate from self.lock (frame buffer): cmd holds cmd_lock while
        # loop.stop() joins the worker, whose on_frame takes self.lock.
        self.cmd_lock = threading.Lock()
        self.frame_png: bytes = b""
        self.render_ms = 0.0
        self.fps = 0.0
        self.frames = 0
        self.debug_mode = 0
        self.photon_debug_mode = int(self.overrides.get("photon_debug_mode", 0))
        self._last_frame_t = None
        self.engine = None
        self.loop = None
        self.graph = None
        from ..scene.commands import CommandManager

        self.cmds = CommandManager()
        self._start_engine(width, height)

    def _push_scene(self) -> None:
        """Evaluate the in-memory graph and hand the result to the engine."""
        from ..scene.evaluator import evaluate_scene

        ov = dict(self.overrides)
        ov["photon_debug_mode"] = self.photon_debug_mode
        if self.photon_debug_mode > 0:
            ov["enable_caustics"] = True
        self.engine.update_scene(evaluate_scene(self.graph), **ov)

    # -- engine lifecycle ---------------------------------------------------
    def _start_engine(self, width: int, height: int) -> None:
        from ..io.png import encode_png
        from ..runtime.engine import Engine
        from ..runtime.render_loop import RenderLoop

        if self.loop is not None:
            self.loop.stop()
        self.engine = Engine(width, height, backend=self.backend)
        if self.graph is None:
            # Load the node graph ONCE; every later rebuild (key commands,
            # property edits, undo/redo) re-evaluates the in-memory graph so
            # edits survive photon toggles and resolution switches.
            self.graph = self.engine.load_rtvs_graph(self.scene_path)
        self._push_scene()

        def on_frame(frame: np.ndarray, ms: float) -> None:
            # runs on the render worker; debug views render here too so the
            # engine is only ever touched from one thread
            if self.debug_mode > 0:
                frame = self.engine.render_debug_view(self.debug_mode)
            png = encode_png(frame, compress_level=1)
            now = time.perf_counter()
            with self.lock:
                self.frame_png = png
                self.render_ms = ms
                self.frames += 1
                if self._last_frame_t is not None:
                    dt = now - self._last_frame_t
                    if dt > 0:
                        self.fps = 0.8 * self.fps + 0.2 / dt if self.fps else 1.0 / dt
                self._last_frame_t = now

        self.loop = RenderLoop(self.engine, on_frame=on_frame)
        self.loop.continuous = True  # temporal accumulation keeps refining
        self.loop.start()
        self.loop.request_frame()

    # -- commands (the key handlers) ----------------------------------------
    def cmd(self, op: str, args: dict) -> dict:
        with self.cmd_lock:
            return self._cmd(op, args)

    def _rebuild(self) -> None:
        # The engine is single-threaded: pause the worker around the scene
        # rebuild, exactly like the reference rebuilds pipeline state on
        # the UI thread.
        self.loop.stop()
        self._push_scene()
        self.loop.start()
        self.loop.request_frame()

    def _cmd(self, op: str, args: dict) -> dict:
        if op == "photon":
            # P-key cycle (RenderWindow.xaml.cs:628): advance mode 0-12.
            self.photon_debug_mode = (self.photon_debug_mode + 1) % 13
            self._rebuild()
        elif op == "setprop":
            # Property-panel edit: .rtvs-shaped properties, undoable
            # (PropertyCommands + CommandManager, like the editor).
            from ..scene.commands import ApplyPropertiesCommand

            node_id = uuid.UUID(args.get("node", [""])[0])
            props = json.loads(args.get("props", ["{}"])[0])
            node = next(n for n in self.graph.nodes if n.id == node_id)
            self.cmds.execute(ApplyPropertiesCommand(node, props))
            self._rebuild()
        elif op == "addnode":
            from ..models import NODE_TYPES
            from ..scene.commands import AddNodeCommand

            cls = NODE_TYPES[args.get("type", [""])[0]]
            self.cmds.execute(AddNodeCommand(self.graph, cls()))
            self._rebuild()
        elif op == "delnode":
            from ..scene.commands import RemoveNodeCommand

            node_id = uuid.UUID(args.get("node", [""])[0])
            node = next(n for n in self.graph.nodes if n.id == node_id)
            self.cmds.execute(RemoveNodeCommand(self.graph, node))
            self._rebuild()
        elif op == "connect":
            from ..scene.commands import ConnectCommand

            out_n = next(n for n in self.graph.nodes
                         if n.id == uuid.UUID(args.get("out_node", [""])[0]))
            in_n = next(n for n in self.graph.nodes
                        if n.id == uuid.UUID(args.get("in_node", [""])[0]))
            out_s = out_n.find_output(args.get("out_sock", [""])[0])
            in_s = in_n.find_input(args.get("in_sock", [""])[0])
            self.cmds.execute(ConnectCommand(self.graph, out_s, in_s))
            self._rebuild()
        elif op == "disconnect":
            from ..scene.commands import DisconnectCommand

            in_n = next(n for n in self.graph.nodes
                        if n.id == uuid.UUID(args.get("in_node", [""])[0]))
            in_s = in_n.find_input(args.get("in_sock", [""])[0])
            conn = self.graph.connection_into(in_s)
            if conn is not None:
                self.cmds.execute(DisconnectCommand(self.graph, conn))
                self._rebuild()
        elif op == "undo":
            if self.cmds.undo():
                self._rebuild()
        elif op == "redo":
            if self.cmds.redo():
                self._rebuild()
        elif op == "save":
            from ..scene.rtvs import save_graph

            save_graph(self.graph, self.scene_path)
        elif op == "debug":
            self.debug_mode = max(0, min(10, int(args.get("mode", ["0"])[0])))
            self.loop.request_frame()
        elif op == "reset":
            # temporal-history reset (the scene-change analog)
            self.engine._denoise_state = None
            self.engine._checksum = None
            self.loop.request_frame()
        elif op == "res":
            d = int(args.get("dir", ["1"])[0])
            cur = (self.engine.width, self.engine.height)
            idx = RESOLUTIONS.index(cur) if cur in RESOLUTIONS else 0
            w, h = RESOLUTIONS[(idx + d) % len(RESOLUTIONS)]
            self._start_engine(w, h)
        return self.status()

    def graph_json(self) -> dict:
        """Node-graph snapshot for the editor panel (.rtvs property shapes)."""
        from ..scene.rtvs import _serialize_properties

        with self.cmd_lock:
            return {
                "nodes": [
                    {
                        "id": str(n.id),
                        "type": n.type_name,
                        "title": n.title,
                        "properties": _serialize_properties(n),
                        "inputs": [s.name for s in n.input_sockets],
                        "outputs": [s.name for s in n.output_sockets],
                    }
                    for n in self.graph.nodes
                ],
                "connections": [
                    {
                        "from": f"{c.output_node.title}.{c.output_socket.name}",
                        "to": f"{c.input_node.title}.{c.input_socket.name}",
                        "in_node": str(c.input_node.id),
                        "in_sock": c.input_socket.name,
                    }
                    for c in self.graph.connections
                ],
                "node_types": sorted(self._node_types()),
                "can_undo": self.cmds.can_undo,
                "can_redo": self.cmds.can_redo,
            }

    @staticmethod
    def _node_types():
        from ..models import NODE_TYPES

        return list(NODE_TYPES.keys())

    def status(self) -> dict:
        with self.lock:
            return {
                "width": self.engine.width,
                "height": self.engine.height,
                "fps": self.fps,
                "render_ms": self.render_ms,
                "frames": self.frames,
                "debug_mode": self.debug_mode,
                "photon_debug_mode": self.photon_debug_mode,
                "backend": self.engine.backend,
                "rays": self.engine.last_rays,
            }


def make_server(state: ViewerState, port: int = 8173) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            try:
                if url.path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif url.path == "/frame.png":
                    with state.lock:
                        png = state.frame_png
                    if not png:
                        self._send(503, "text/plain", b"no frame yet")
                    else:
                        self._send(200, "image/png", png)
                elif url.path == "/status":
                    self._send(200, "application/json",
                               json.dumps(state.status()).encode())
                elif url.path == "/graph":
                    self._send(200, "application/json",
                               json.dumps(state.graph_json()).encode())
                elif url.path == "/cmd":
                    q = parse_qs(url.query)
                    op = q.get("op", [""])[0]
                    out = state.cmd(op, q)
                    self._send(200, "application/json", json.dumps(out).encode())
                else:
                    self._send(404, "text/plain", b"not found")
            except BrokenPipeError:
                pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Live render viewer (browser-based).")
    p.add_argument("scene", help="path to the .rtvs scene file")
    p.add_argument("--port", type=int, default=8173)
    p.add_argument("-W", "--width", type=int, default=1280)
    p.add_argument("-H", "--height", type=int, default=720)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--caustics", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    overrides = {}
    if args.spp is not None:
        overrides["samples_per_pixel"] = args.spp
    if args.bounces is not None:
        overrides["max_bounces"] = args.bounces
    if args.caustics:
        overrides["enable_caustics"] = True

    state = ViewerState(args.scene, args.width, args.height, overrides)
    server = make_server(state, args.port)
    print(f"viewer: http://127.0.0.1:{args.port}/  (ctrl-c to quit)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        state.loop.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
