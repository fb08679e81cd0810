"""Round-5 glass-profile fit, step 1: measure the WineGlass2 silhouette
that /root/reference/ScreenShot.png actually shows, and our
reconstruction's silhouette, as per-row halfwidths in WORLD units.

Method: render the canonical scene WITHOUT the glass (FBX nodes dropped)
and warp onto the reference grid; glass pixels are where |ref - noglass|
is large (the rest of the scene matches to moire noise). The same mask
against OUR full render gives our glass's silhouette. Each row's mask
extent converts to a world halfwidth at the glass axis depth via the
scene camera (pos (0,2.5,-5), lookAt (0,1,0), vfov 60).

Saves /tmp/r5_{full,noglass}.npy for offline iteration.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/sample_scene.rtvs"
W, H = 1920, 1088


def render(scene_path, frames=12):
    from raytracevs_tpu.runtime.engine import Engine

    eng = Engine(W, H)
    eng.load_rtvs(scene_path, enable_denoiser=True)
    img = None
    for _ in range(frames):
        img = eng.render()
    return np.asarray(img)


def mask_profile(diff, thr=35.0):
    """Per-row [x0, x1] extent of the largest |diff|>thr run near the
    previous row's span (the glass is one connected silhouette)."""
    m = diff > thr
    rows = []
    for y in range(m.shape[0]):
        xs = np.nonzero(m[y])[0]
        rows.append((int(xs.min()), int(xs.max())) if len(xs) else None)
    return rows


def main():
    from raytracevs_tpu.io.png import read_png, write_png
    from raytracevs_tpu.utils.refcompare import REF_SCREENSHOT, warp_to_reference

    doc = json.load(open(SCENE))
    doc["Nodes"] = [n for n in doc["Nodes"] if "FBX" not in n.get("Type", "")]
    noglass_path = "/tmp/rtvs_glassfit_noglass.rtvs"
    open(noglass_path, "w").write(json.dumps(doc))

    full = render(SCENE)
    np.save("/tmp/r5_full.npy", full)
    noglass = render(noglass_path)
    np.save("/tmp/r5_noglass.npy", noglass)

    ref = np.asarray(read_png(REF_SCREENSHOT))[..., :3].astype(np.float32)
    wf, _ = warp_to_reference(full[..., :3])
    wn, _ = warp_to_reference(noglass[..., :3])

    def box3(a):
        p = np.pad(a, ((1, 1), (1, 1)), mode="edge")
        return sum(p[1+dy:1081+dy, 1+dx:1921+dx]
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0

    d_ref = box3(np.abs(ref - wn).max(axis=-1))
    d_ours = box3(np.abs(wf - wn).max(axis=-1))

    # restrict to a generous window around the glass (from the authored
    # transform the axis is near x=0.5, z=-1.5; its projection lands in
    # the right-center: cols 1250..1750, rows 60..1000)
    win = (slice(40, 1020), slice(1200, 1800))
    out = {"rows": []}
    pr = mask_profile(d_ref[win])
    po = mask_profile(d_ours[win])
    for i, (a, b) in enumerate(zip(pr, po)):
        if a is None and b is None:
            continue
        out["rows"].append({
            "row": i + 40,
            "ref": None if a is None else [a[0] + 1200, a[1] + 1200],
            "ours": None if b is None else [b[0] + 1200, b[1] + 1200],
        })
    json.dump(out, open("/tmp/r5_glass_profile.json", "w"))
    kept = [r for r in out["rows"] if r["ref"] and r["ours"]]
    for r in kept[::40]:
        print(r, flush=True)
    print(f"rows with both: {len(kept)}", flush=True)

    # visual check of the masks
    vis = np.zeros((1080, 1920, 4), np.uint8)
    vis[..., 0] = np.clip(d_ref * 3, 0, 255).astype(np.uint8)
    vis[..., 1] = np.clip(d_ours * 3, 0, 255).astype(np.uint8)
    vis[..., 3] = 255
    write_png("/tmp/r5_glass_masks.png", vis)
    print("saved masks + npys", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
