#!/usr/bin/env python
"""Offline warp4 metadata generator — wire-compatible CLI replica of the
reference's kernels/generate_meta.py (walks ./graphs/*.indptr, writes
w12_nz64_warp_4/<graph>.warp4).

The TPU kernels do not need these files (scheduling metadata is built at
graph load, maxk_tpu.ops.tiling); this tool exists so benchmark setups that
expect .warp4 dumps keep working.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from maxk_tpu.data.loaders import available_graphs, load_csr_binary
from maxk_tpu.data.warp4 import generate_warp4, save_warp4, META_DIRNAME


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", default="./graphs/",
                    help="dir with <name>.indptr/.indices binaries")
    ap.add_argument("--out", default=".",
                    help=f"parent dir for {META_DIRNAME}/")
    args = ap.parse_args()

    names = available_graphs(args.graphs)
    print(f"generating metadata, save to {Path(args.out) / META_DIRNAME}")
    for i, name in enumerate(names, 1):
        csr = load_csr_binary(args.graphs, name)
        save_warp4(generate_warp4(csr), args.out, name)
        print(f"{i} {name} finish")


if __name__ == "__main__":
    main()
