"""TPU sweep: tiered leaf loops x leaf size on the wine glass.

Each config needs a fresh process (RTVS_MK_LEAF_SIZE / RTVS_MK_LEAF_TIERS
are read at import). Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_leaf_tiers.py
"""
import os
import subprocess
import sys

CHILD = r"""
import time
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
import jax.numpy as jnp
from conftest import wine_glass_scene
from raytracevs_tpu.runtime.engine import Engine, _pick_backend
from raytracevs_tpu.ops.render import render_rows

scene, ms_svc = wine_glass_scene()
engine = Engine(1920, 1088, mesh_service=ms_svc, device_mesh=None)
engine.update_scene(scene)
backend = _pick_backend(engine._flat, engine._cfg)
flat, cfg = engine._flat, engine._cfg

def run(scene, start):
    def step(carry, i):
        s_i = scene._replace(frame_index=i.astype(jnp.uint32))
        out = render_rows(s_i, cfg, jnp.int32(0), cfg.height, backend=backend)
        return carry, (jnp.sum(out.color), out.rays)
    _, (cks, rays) = jax.lax.scan(step, 0, start + jnp.arange(4))
    return jnp.sum(cks), jnp.sum(rays)

f = jax.jit(run)
cks, rays = f(flat, jnp.int32(0))
float(np.asarray(cks))
ts = []
for r in range(4):
    t0 = time.perf_counter()
    cks, rays = f(flat, jnp.int32(4 * (r + 1)))
    float(np.asarray(cks))
    ts.append(time.perf_counter() - t0)
best = min(ts) / 4
rpf = float(np.asarray(rays)) / 4
print(f"RESULT {best*1000:.1f} ms {rpf/best/1e6:.1f} Mrays/s", flush=True)
"""


def main():
    configs = [
        ("leaf24 flat", {"RTVS_MK_LEAF_SIZE": "24", "RTVS_MK_LEAF_TIERS": ""}),
        ("leaf24 tiers", {"RTVS_MK_LEAF_SIZE": "24", "RTVS_MK_LEAF_TIERS": "1"}),
        ("leaf32 tiers", {"RTVS_MK_LEAF_SIZE": "32", "RTVS_MK_LEAF_TIERS": "1"}),
        ("leaf48 tiers", {"RTVS_MK_LEAF_SIZE": "48", "RTVS_MK_LEAF_TIERS": "1"}),
    ]
    for name, env in configs:
        e = dict(os.environ)
        e.update(env)
        e["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        p = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True, timeout=2400)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name}: {line[0][7:] if line else 'FAILED'}", flush=True)
        if not line:
            print(p.stderr[-600:], flush=True)


if __name__ == "__main__":
    main()
