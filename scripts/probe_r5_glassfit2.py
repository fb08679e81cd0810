"""Round-5 glass-profile fit, step 2: render the canonical scene with
the profile-warped WineGlass2 reconstruction and score it against the
reference screenshot (region map + side-by-side crop)."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SCENE = "/root/reference/sample_scene.rtvs"
W, H = 1920, 1088


def main():
    from raytracevs_tpu.io.png import read_png, write_png
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.utils.refcompare import (REF_SCREENSHOT,
                                                 compare_to_reference,
                                                 warp_to_reference)

    eng = Engine(W, H)
    eng.load_rtvs(SCENE, enable_denoiser=True)
    img = None
    for _ in range(12):
        img = eng.render()
    img = np.asarray(img)
    np.save("/tmp/r5_full_v2.npy", img)
    cmp_res = compare_to_reference(img)
    print(json.dumps(cmp_res), flush=True)

    ref = np.asarray(read_png(REF_SCREENSHOT))[..., :3]
    warped, _ = warp_to_reference(img[..., :3])
    crop_o = np.clip(warped[40:1040, 880:1400], 0, 255).astype(np.uint8)
    crop_r = ref[40:1040, 880:1400].astype(np.uint8)
    pad = np.full((crop_o.shape[0], 6, 3), 255, np.uint8)
    side = np.concatenate([crop_o, pad, crop_r], axis=1)
    rgba = np.concatenate(
        [side, np.full(side.shape[:2] + (1,), 255, np.uint8)], -1)
    write_png("/tmp/glass_v2_compare.png", rgba)
    print("saved /tmp/glass_v2_compare.png", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
