"""Regenerate ops/aruco/data/*.npz from OpenCV's public cv2.aruco data.

The true ARUCO_MIP_36h12 bit table ships with OpenCV (public data, same
dictionary the reference's vendored aruco lib uses for samsung7 footage —
reference Thirdparty/aruco/dictionary.h:53-140). Codes are extracted by
RENDERING each marker and reading its cells (robust to bytesList packing).
"""

import os

import numpy as np
import cv2.aruco as ar

OUT = os.path.join(os.path.dirname(__file__), "..", "orb_slam2_aruco_tpu",
                   "ops", "aruco", "data")


def extract(dict_id, n, grid):
    d = ar.getPredefinedDictionary(dict_id)
    codes = np.zeros((n, grid * grid), np.uint8)
    for i in range(n):
        img = ar.generateImageMarker(d, i, 8 * (grid + 2))
        inner = img[8:-8, 8:-8]
        cells = inner.reshape(grid, 8, grid, 8).mean(axis=(1, 3)) > 127
        codes[i] = cells.reshape(-1).astype(np.uint8)
    return codes, int(d.maxCorrectionBits)


def main():
    mip, mc = extract(ar.DICT_ARUCO_MIP_36H12, 250, 6)
    assert len({c.tobytes() for c in mip}) == 250
    np.savez_compressed(
        os.path.join(OUT, "aruco_mip_36h12.npz"),
        packed=np.packbits(mip, axis=1), grid=6, num_ids=250,
        max_correction=mc,
    )
    print("wrote aruco_mip_36h12.npz  maxCorrection =", mc)


if __name__ == "__main__":
    main()
