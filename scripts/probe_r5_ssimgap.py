"""Round-5 SSIM-vs-DXR discrepancy analysis (VERDICT r4 missing #3 /
next #2): attribute the 0.8795 ssim_vs_dxr (worst 4x4 region 0.3958)
between the WineGlass2 reconstruction geometry, the denoiser, and
spp/convergence — and produce the side-by-side crops for docs/PARITY.md.

Variants rendered (one TPU process; canonical sample_scene.rtvs, 1080p):
  full     denoiser ON, 12 frames (the bench's ssim_vs_dxr config)
  hq       denoiser OFF, scene-carried spp (converged path tracing,
           no denoiser error) — isolates denoiser vs convergence
  noglass  denoiser ON, FBX nodes dropped — regions whose score does NOT
           change are glass-free; regions that collapse are glass-bearing

Outputs: region maps per variant + crops of the 3 worst full-variant
cells (render vs reference) into docs/img/.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/sample_scene.rtvs"
W, H = 1920, 1088


def render_variant(scene_path, frames, denoiser, spp=None, bounces=None):
    from raytracevs_tpu.runtime.engine import Engine

    eng = Engine(W, H)
    kw = {}
    if spp is not None:
        kw.update(samples_per_pixel=spp, max_bounces=bounces)
    eng.load_rtvs(scene_path, enable_denoiser=denoiser, **kw)
    img = None
    for _ in range(frames):
        img = eng.render()
    return np.asarray(img)


def main():
    from raytracevs_tpu.io.png import read_png, write_png
    from raytracevs_tpu.utils.refcompare import (REF_SCREENSHOT,
                                                 compare_to_reference,
                                                 warp_to_reference)

    os.makedirs("/root/repo/docs/img", exist_ok=True)
    out = {}

    # analytic-subset scene file (FBX nodes dropped)
    doc = json.load(open(SCENE))
    doc["Nodes"] = [n for n in doc["Nodes"] if "FBX" not in n.get("Type", "")]
    noglass_path = "/tmp/rtvs_ssimgap_noglass.rtvs"
    open(noglass_path, "w").write(json.dumps(doc))

    imgs = {}
    for name, (path, frames, den, spp, b) in {
        "full": (SCENE, 12, True, None, None),
        "hq": (SCENE, 1, False, None, None),
        "noglass": (noglass_path, 12, True, None, None),
    }.items():
        t0 = time.time()
        imgs[name] = render_variant(path, frames, den, spp, b)
        cmp_res = compare_to_reference(imgs[name])
        out[name] = {"ssim": cmp_res["ssim"], "regions": cmp_res["regions"],
                     "mae": cmp_res["mean_abs_err"],
                     "render_s": round(time.time() - t0, 1)}
        print(name, json.dumps(out[name]), flush=True)

    # our-denoiser-vs-our-path-tracer (removes the reference from the
    # equation entirely: where do WE change the image?)
    from raytracevs_tpu.utils.ssim import ssim
    out["full_vs_hq_ssim"] = round(ssim(imgs["full"][..., :3],
                                        imgs["hq"][..., :3]), 4)

    # crops of the 3 worst full-variant cells, render vs reference
    ref = read_png(REF_SCREENSHOT)
    warped, cols = warp_to_reference(imgs["full"][..., :3])
    rh, rw = ref.shape[:2]
    cells = sorted(out["full"]["regions"].items(), key=lambda kv: kv[1])[:3]
    for cname, score in cells:
        i, j = int(cname[1]), int(cname[3])
        rs = slice(i * rh // 4, (i + 1) * rh // 4)
        cs = slice(j * rw // 4, (j + 1) * rw // 4)
        crop_r = np.clip(warped[rs, cs], 0, 255).astype(np.uint8)
        crop_ref = np.asarray(ref)[rs, cs, :3].astype(np.uint8)
        pad = np.full((crop_r.shape[0], 8, 3), 255, np.uint8)
        side = np.concatenate([crop_r, pad, crop_ref], axis=1)
        rgba = np.concatenate(
            [side, np.full(side.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        write_png(f"/root/repo/docs/img/ssimgap_{cname}.png", rgba)
        print(f"wrote ssimgap_{cname}.png (ssim {score})", flush=True)

    # full-frame side-by-side for the doc
    side = np.concatenate(
        [np.clip(warped, 0, 255).astype(np.uint8)[::2, ::2],
         np.asarray(ref)[::2, ::2, :3].astype(np.uint8)], axis=1)
    rgba = np.concatenate(
        [side, np.full(side.shape[:2] + (1,), 255, np.uint8)], axis=-1)
    write_png("/root/repo/docs/img/ssimgap_full.png", rgba)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
