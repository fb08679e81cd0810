"""Round-5 REBLUR quality gate (VERDICT r4 #3): orbit-sequence A/B of
the denoiser fidelity features, RECORDED — both the round-4 pair
(anti-firefly, guided blur) that shipped ungated and the round-5 set
(AREA_3X3 hitdist reconstruction, responsive accumulation, specular
prepass blur, specular virtual-motion reprojection).

Reuses probe_reblur_quality's child (orbit 2 deg/frame, analytic sample
scene, 1080p fast config, per-frame spp16 denoiser-off references;
ssim_mean/min = lag/ghosting gauge, firefly_px, fast_frame_ms cost).
Combos (gates bind at import => one subprocess per combo):
  legacy   everything off
  r4       anti-firefly + guided blur
  r5-novm  + hitdist recon + responsive + prepass (virtual motion OFF)
  r5-full  + virtual motion
"""
import os
import subprocess
import sys

CHILD = os.path.join(os.path.dirname(__file__), "probe_reblur_quality.py")

COMBOS = {
    "legacy": dict(RTVS_ANTI_FIREFLY="0", RTVS_GUIDED_BLUR="0",
                   RTVS_HITDIST_RECON="0", RTVS_RESPONSIVE_ACCUM="0",
                   RTVS_SPEC_PREPASS="0", RTVS_SPEC_VIRTUAL="0"),
    "r4": dict(RTVS_ANTI_FIREFLY="1", RTVS_GUIDED_BLUR="1",
               RTVS_HITDIST_RECON="0", RTVS_RESPONSIVE_ACCUM="0",
               RTVS_SPEC_PREPASS="0", RTVS_SPEC_VIRTUAL="0"),
    "r5-novm": dict(RTVS_ANTI_FIREFLY="1", RTVS_GUIDED_BLUR="1",
                    RTVS_HITDIST_RECON="1", RTVS_RESPONSIVE_ACCUM="1",
                    RTVS_SPEC_PREPASS="1", RTVS_SPEC_VIRTUAL="0"),
    "r5-full": dict(RTVS_ANTI_FIREFLY="1", RTVS_GUIDED_BLUR="1",
                    RTVS_HITDIST_RECON="1", RTVS_RESPONSIVE_ACCUM="1",
                    RTVS_SPEC_PREPASS="1", RTVS_SPEC_VIRTUAL="1"),
}


def main():
    for name, gates in COMBOS.items():
        env = dict(os.environ)
        env["RTVS_PROBE_CHILD"] = "1"
        env.update(gates)
        print(f"RUN {name}", flush=True)
        r = subprocess.run([sys.executable, CHILD], env=env,
                           capture_output=True, text=True, timeout=3000)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print((name + " " + out[-1]) if out else
              f"{name} FAILED rc={r.returncode}\n{r.stderr[-1500:]}",
              flush=True)


if __name__ == "__main__":
    main()
