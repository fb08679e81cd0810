"""Round-5 glass fit, step 3: score the axis-corrected warped glass AND
measure the irreducible moire floor (self-SSIM between two independent
runs of OUR renderer with decorrelated sampling — the bound any
pixel-SSIM against the reference can reach in aliasing-heavy regions)."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/sample_scene.rtvs"
W, H = 1920, 1088


def render(frames=12, frame0=0):
    from raytracevs_tpu.runtime.engine import Engine

    eng = Engine(W, H)
    eng.load_rtvs(SCENE, enable_denoiser=True)
    eng._frame_index = frame0  # decorrelate the sample stream
    img = None
    for _ in range(frames):
        img = eng.render()
    return np.asarray(img)


def region_map(a, b):
    from raytracevs_tpu.utils.ssim import ssim

    h, w = a.shape[:2]
    cells = {}
    for i in range(4):
        for j in range(4):
            rs = slice(i * h // 4, (i + 1) * h // 4)
            cs = slice(j * w // 4, (j + 1) * w // 4)
            cells[f"r{i}c{j}"] = round(ssim(a[rs, cs], b[rs, cs]), 4)
    return cells


def main():
    from raytracevs_tpu.io.png import read_png, write_png
    from raytracevs_tpu.utils.refcompare import (REF_SCREENSHOT,
                                                 compare_to_reference,
                                                 warp_to_reference)

    img = render()
    np.save("/tmp/r5_full_v3.npy", img)
    cmp_res = compare_to_reference(img)
    print("v3 " + json.dumps(cmp_res), flush=True)

    # moire floor: an independent run whose per-frame sample stream is
    # shifted far out of phase; same engine, same scene, same camera
    img2 = render(frame0=4096)
    floor = region_map(img[..., :3].astype(np.float32),
                       img2[..., :3].astype(np.float32))
    print("selfssim " + json.dumps(floor), flush=True)

    ref = np.asarray(read_png(REF_SCREENSHOT))[..., :3]
    warped, _ = warp_to_reference(img[..., :3])
    crop_o = np.clip(warped[40:1040, 880:1400], 0, 255).astype(np.uint8)
    crop_r = ref[40:1040, 880:1400].astype(np.uint8)
    pad = np.full((crop_o.shape[0], 6, 3), 255, np.uint8)
    side = np.concatenate([crop_o, pad, crop_r], axis=1)
    rgba = np.concatenate(
        [side, np.full(side.shape[:2] + (1,), 255, np.uint8)], -1)
    write_png("/tmp/glass_v3_compare.png", rgba)
    print("saved /tmp/glass_v3_compare.png", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
