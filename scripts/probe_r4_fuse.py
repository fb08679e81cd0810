"""A/B the fused dual-light shadow walk on the TRUE canonical scene
(spp1 b5 1080p denoiser-off, probe_r4_combo child): fuse ON (default)
vs RTVS_MK_SHADOW_FUSE=0 (one mesh walk per dominant light)."""
import os
import subprocess
import sys

COMBO = os.path.join(os.path.dirname(__file__), "probe_r4_combo.py")

CONFIGS = [
    {},                              # fused (new default)
    {"RTVS_MK_SHADOW_FUSE": "0"},    # previous: sequential walks
]


def main():
    for cfg in CONFIGS:
        env = dict(os.environ)
        env.update(cfg)
        env["RTVS_PROBE_CHILD"] = "1"
        print("RUN", cfg, flush=True)
        r = subprocess.run([sys.executable, COMBO], env=env,
                           capture_output=True, text=True, timeout=1800)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else f"FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    main()
