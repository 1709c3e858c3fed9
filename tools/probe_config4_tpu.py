"""Config-4 probe: 1M PCISPH unrolled grad + tiled sky-lit render."""
import time

import numpy as np


def main():
    import bench

    out = bench.bench_pcisph_materials_grad_1m(frames=2)
    print(out, flush=True)


if __name__ == "__main__":
    main()
