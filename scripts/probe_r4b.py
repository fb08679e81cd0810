"""Round-4 follow-up probe: two-phase regrouping on the TRUE canonical scene.

probe_r4_combo's bisect showed the canonical scene (spp1 b5 1080p,
163.6 ms) is ~88% glass-child subtrees (gspawn off -> 18.9 ms) and ~96%
mesh walks (all mesh walks off -> 7.1 ms): deep DFS iterations run at low
lane occupancy, dragging whole tiles through packet walks. That is exactly
the "secondary unions dominate" regime the opt-in two-phase backend
("pallas2", RTVS_TWOPHASE=1) was kept for — it was falsified on the
STANDALONE wine-glass scene where the glass fills the screen.

Runs probe_r4_combo.py in child mode with extra env:
  1. baseline monolithic pallas
  2. RTVS_TWOPHASE=1           (phase A -> coherence sort -> phase B)
  3. RTVS_TWOPHASE=1 + tpsort  (phase B without regrouping: isolates the
                                compaction-vs-sort contributions)
"""
import os
import subprocess
import sys

COMBO = os.path.join(os.path.dirname(__file__), "probe_r4_combo.py")

CONFIGS = [
    {},
    {"RTVS_TWOPHASE": "1"},
    {"RTVS_TWOPHASE": "1", "RTVS_MK_DISABLE": "tpsort"},
]


def main():
    for cfg in CONFIGS:
        env = dict(os.environ)
        env.update(cfg)
        env["RTVS_PROBE_CHILD"] = "1"
        print("RUN", cfg, flush=True)
        r = subprocess.run([sys.executable, COMBO], env=env,
                           capture_output=True, text=True, timeout=1500)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else f"FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    main()
