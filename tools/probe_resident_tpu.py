"""Probe: plane-resident WCSPH at 1M on hardware vs the per-step path."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    import bench
    for skin in (0.05, 0.1, 0.2):
        r = bench.bench_dense_wcsph_resident(n3=100, steps=10, windows=3,
                                             skin=skin)
        print(f"resident skin={skin}: {r['ms_per_step']:.1f} ms/step, "
              f"{r['psteps_per_sec']/1e6:.2f}M psteps/s, "
              f"rebuilds {r['rebuilds']}/{r['total_steps']} steps, "
              f"overflow {r['max_overflow']}", flush=True)
    r = bench.bench_dense_wcsph(n3=100, steps=10)
    print(f"per-step: {r['ms_per_step']:.1f} ms/step, "
          f"{r['psteps_per_sec']/1e6:.2f}M psteps/s", flush=True)

main()
