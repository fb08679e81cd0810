"""TPU probe: dense-packed node table (64 B/node) — perf neutrality at
known sizes + the new ~1M-tri capacity ceiling of the HBM-streamed backend.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_packed_nodes.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_hbm_mesh import bench, build  # noqa: E402


def main():
    from raytracevs_tpu.ops.pallas.megakernel import mesh_table_bytes

    cases = [
        ("233k", 342, 342, False),   # round-3 interim: 28.1 ms opaque
        ("233k", 342, 342, True),    # round-3 interim: 76.0 ms glass
        ("1M", 708, 708, False),     # new capacity (nodes would be ~61 MB
        ("1M", 708, 708, True),      # at 512 B/node — impossible before)
    ]
    for label, rings, segs, glass in cases:
        flat, cfg = build(rings, segs, glass)
        nt = int(flat.mesh.mk_num_tris)
        nn = int(flat.mesh.mk_num_nodes)
        from raytracevs_tpu.ops.pallas.megakernel import node_table_bytes

        mb = mesh_table_bytes(nn, nt) / 2**20
        node_mb = node_table_bytes(nn) / 2**20
        tag = (f"{label} {'glass' if glass else 'opaque'} tris={nt} "
               f"nodes={nn} tables={mb:.1f}MB nodes={node_mb:.2f}MB")
        backends = ["pallas_hbm"]
        if mb <= 12.5:
            backends.insert(0, "pallas")
        for b in backends:
            try:
                ms_f, mrays, comp = bench(flat, cfg, b)
                print(f"{tag} [{b}]: {ms_f:.1f} ms/frame, {mrays:.1f} Mrays/s "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"{tag} [{b}]: FAILED {type(e).__name__}: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
