"""Quality gates for the REBLUR fidelity features (VERDICT r3 #4).

Orbit sequence (2 deg/frame, analytic sample scene, 1080p fast config,
denoiser ON) measured against per-frame spp16 denoiser-off references:
  ssim_mean/min   lag/ghosting shows up as depressed SSIM vs the
                  converged reference while the camera moves
  firefly_px      pixels whose luminance exceeds 4x the 3x3 neighbor max
                  of the reference (outliers the clamp should kill)
  frame_ms        fast-config cost (floor-free, batch scan)

Driver loops feature combos in subprocesses (the gates bind at import):
  RTVS_ANTI_FIREFLY / RTVS_GUIDED_BLUR in {00, 10, 01, 11}.
"""
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FRAMES = 16
ORBIT_DEG = 2.0
W, H = 1920, 1088


def child():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.runtime.engine import Engine, _render_pipeline, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config
    from raytracevs_tpu.utils.ssim import ssim

    scene_path = os.path.join(os.path.dirname(__file__), "..",
                              "tests") and "/root/reference/sample_scene.rtvs"
    # analytic subset: drop FBX (keeps the probe about the denoiser)
    import json as _json
    doc = _json.load(open(scene_path))
    doc["Nodes"] = [n for n in doc["Nodes"] if "FBX" not in n.get("Type", "")]
    tmp = "/tmp/rtvs_probe_analytic.rtvs"
    open(tmp, "w").write(_json.dumps(doc))

    eng = Engine(W, H)
    eng.load_rtvs(tmp, samples_per_pixel=1, max_bounces=5,
                  enable_denoiser=True)
    ref_eng = Engine(W, H)
    ref_eng.load_rtvs(tmp, samples_per_pixel=16, max_bounces=5,
                      enable_denoiser=False)

    base_look = np.asarray(eng._scene.camera.look_at, float).copy()
    base_rel = np.asarray(eng._scene.camera.position, float) - base_look

    def set_orbit(e, frame):
        ang = math.radians(ORBIT_DEG * frame)
        c, s = math.cos(ang), math.sin(ang)
        sc = e._scene
        sc.camera.position = base_look + np.array(
            [base_rel[0] * c + base_rel[2] * s, base_rel[1],
             -base_rel[0] * s + base_rel[2] * c])
        if e is eng:
            e.update_scene(sc, samples_per_pixel=1, max_bounces=5,
                           enable_denoiser=True)
        else:
            e.update_scene(sc, samples_per_pixel=16, max_bounces=5,
                           enable_denoiser=False)

    ssims = []
    firefly = []
    for f in range(FRAMES):
        set_orbit(eng, f)
        img = eng.render()[..., :3].astype(np.float32)
        set_orbit(ref_eng, f)
        ref = ref_eng.render()[..., :3].astype(np.float32)
        if f >= 2:  # skip history warmup
            ssims.append(ssim(img, ref))
            # fireflies: luminance above 4x the reference's local 3x3 max
            lum = img.mean(-1)
            rlum = ref.mean(-1)
            rmax = np.maximum.reduce([
                np.roll(np.roll(rlum, dy, 0), dx, 1)
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
            firefly.append(int((lum > 4.0 * rmax + 8.0).sum()))

    # cost: batched fast-config timing (floor-free)
    flat = eng._flat
    cfg = make_config(eng._scene, W, H, samples_per_pixel=1, max_bounces=5,
                      enable_denoiser=True)
    backend = _pick_backend(flat, cfg)
    from raytracevs_tpu.post import denoise as dmod
    st0 = dmod.init_state_auto(H, W, backend)

    def run(sc, st, start):
        def step(carry, i):
            s_i = sc._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, rays, _g, new_st, _d = _render_pipeline(
                s_i, cfg, backend, carry, False)
            return new_st, jnp.sum(rgba.astype(jnp.uint32))

        st, cks = jax.lax.scan(step, st, start + jnp.arange(8))
        return jnp.sum(cks), st

    fjit = jax.jit(run)
    cks, st = fjit(flat, st0, jnp.int32(0))
    float(np.asarray(cks))
    g = jax.jit(lambda s: s + 1.0)
    float(np.asarray(g(jnp.float32(0))))
    fl = min(_floor(g) for _ in range(3))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        cks, st = fjit(flat, st, jnp.int32((r + 1) * 8))
        float(np.asarray(cks))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    if fl < 0.5 * best:
        best -= fl
    print(json.dumps({
        "firefly_gate": os.environ.get("RTVS_ANTI_FIREFLY", "1"),
        "guided_gate": os.environ.get("RTVS_GUIDED_BLUR", "1"),
        "ssim_mean": round(float(np.mean(ssims)), 4),
        "ssim_min": round(float(np.min(ssims)), 4),
        "firefly_px_mean": round(float(np.mean(firefly)), 1),
        "fast_frame_ms": round(best / 8 * 1e3, 2),
    }), flush=True)


def _floor(g):
    import numpy as np
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(np.asarray(g(jnp.float32(0))))
    return time.perf_counter() - t0


def main():
    for ff, gb in (("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")):
        env = dict(os.environ)
        env["RTVS_PROBE_CHILD"] = "1"
        env["RTVS_ANTI_FIREFLY"] = ff
        env["RTVS_GUIDED_BLUR"] = gb
        print(f"RUN firefly={ff} guided={gb}", flush=True)
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=2400)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else
              f"FAILED rc={r.returncode}\n{r.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    if os.environ.get("RTVS_PROBE_CHILD"):
        child()
    else:
        main()
