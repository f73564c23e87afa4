#!/usr/bin/env python
"""Generate and pack the ARUCO_MIP_25h7 regeneration into the package data
dir (ops/aruco/data/aruco_mip_25h7.npz) so importers load the table instead
of re-running the ~4 s stochastic generation per process.

The table is produced by dictionary._generate_mip_style per the published
generation criteria (see ops/aruco/dictionary.py module docstring). If the
exact published upstream table becomes available, pack it with the same
layout and drop it in — decode semantics are table-independent."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from orb_slam2_aruco_tpu.ops.aruco import dictionary


def main():
    d = dictionary._generate_mip_style("ARUCO_MIP_25h7", 5, 100, 7, seed=25)
    out = os.path.join(
        os.path.dirname(dictionary.__file__), "data", "aruco_mip_25h7.npz"
    )
    packed = np.packbits(d.codes, axis=1)
    np.savez_compressed(
        out, grid=5, num_ids=d.num_ids, max_correction=d.max_correction,
        packed=packed,
    )
    print(f"{out}: {d.num_ids} ids, max_correction={d.max_correction}")


if __name__ == "__main__":
    main()
