"""Fused Pallas TPU kernel: whole-image connected components + blob bboxes.

Replaces the XLA label-propagation loop in ops/aruco/detector.py
(connected_components + the sort/searchsorted blob-area stage) for the ArUco
quad-proposal stage (reference Thirdparty/aruco markerdetector pipeline,
SURVEY.md §2.2). The XLA formulation dispatches ~400 small kernels per frame
(8-neighbor min passes, lax.cummax doubling sweeps, full-image sorts) — at
~15 us per kernel launch that is ~7-11 ms/frame, the single largest cost on
the tracking hot path. This kernel keeps the entire (padded) label field in
VMEM (~0.5 MB at 272x512 int32) and runs everything as ONE fused program:

  per round:  `prop_steps` 8-neighbor min/max propagation steps (diagonal
              connectivity) + segmented min/max doubling scans along rows
              and columns (a label crosses any straight foreground run in
              one round)

Propagated fields (all share the blob connectivity):
  lab  = min  (y*Wp + x)  -> the blob label; lab // Wp   = blob min_y
  lab2 = min  (x*Hp + y)  -> lab2 // Hp                  = blob min_x
  labM = max  (y*Wp + x)  -> labM // Wp                  = blob max_y
  labM2= max  (x*Hp + y)  -> labM2 // Hp                 = blob max_x

At convergence every blob pixel knows its blob's label and bounding box, so
blob ranking (bbox area) and the min/max-size gates need NO sort and NO
segment-sum: roots are pixels with lab == own index, scored by bbox area.

Convex-ish blobs (marker quads and their border rings) converge in <= 3
rounds: each round lets the label turn one corner, and the forward+backward
scans cover a rectangular ring's 4 corners in 2 rounds.

Mosaic notes: all masks/flags are int32 (0/1) — i1 vectors cannot be
relayouted through concatenate ("Invalid vector register cast"); shifts are
static-slice + concatenate of a constant edge block, which lowers on both
the sublane and lane axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted(v, dy, dx, fill):
    """v shifted so output[y, x] = v[y+dy, x+dx] (static |dy|,|dx| <= 1)."""
    H, W = v.shape
    if dy == 1:
        v = jnp.concatenate([v[1:, :], jnp.full((1, W), fill, v.dtype)], 0)
    elif dy == -1:
        v = jnp.concatenate([jnp.full((1, W), fill, v.dtype), v[:-1, :]], 0)
    if dx == 1:
        v = jnp.concatenate([v[:, 1:], jnp.full((H, 1), fill, v.dtype)], 1)
    elif dx == -1:
        v = jnp.concatenate([jnp.full((H, 1), fill, v.dtype), v[:, :-1]], 1)
    return v


def _seg_scan_axis(vals, f0, axis, size, reverse, combine_max):
    """Segmented doubling scan along `axis` over multiple value fields.

    vals: list of [H, W] int32 fields; f0: [H, W] int32 (1 = segment start
    for this direction). Min-propagates fields where combine_max[i] is
    False, max-propagates otherwise. Returns updated vals."""
    f = f0
    d = 1
    while d < size:
        if axis == 1:
            sl_cur = (slice(None), slice(d, None))
            sl_prev = (slice(None), slice(None, -d))
            sl_keep = (slice(None), slice(None, d))
        else:
            sl_cur = (slice(d, None), slice(None))
            sl_prev = (slice(None, -d), slice(None))
            sl_keep = (slice(None, d), slice(None))
        if reverse:
            sl_cur, sl_prev = sl_prev, sl_cur
            sl_keep = (
                (slice(None), slice(-d, None))
                if axis == 1
                else (slice(-d, None), slice(None))
            )
        fl_cur = f[sl_cur]
        fl_prev = f[sl_prev]
        start = fl_cur > 0
        new_vals = []
        for v, is_max in zip(vals, combine_max):
            v_c = v[sl_cur]
            v_p = v[sl_prev]
            comb = jnp.maximum(v_c, v_p) if is_max else jnp.minimum(v_c, v_p)
            new_vals.append(jnp.where(start, v_c, comb))
        new_f = jnp.maximum(fl_cur, fl_prev)

        def stitch(old, new):
            keep = old[sl_keep]
            if axis == 1:
                parts = [keep, new] if not reverse else [new, keep]
                return jnp.concatenate(parts, axis=1)
            parts = [keep, new] if not reverse else [new, keep]
            return jnp.concatenate(parts, axis=0)

        vals = [stitch(v, nv) for v, nv in zip(vals, new_vals)]
        f = stitch(f, new_f)
        d *= 2
    return vals


def _cc_fused_kernel(fg_ref, lab_ref, bw_ref, bh_ref, *, Hp, Wp, rounds,
                     prop_steps):
    fg_i = fg_ref[:, :]                              # int32 0/1
    fg = fg_i > 0
    y = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    big = jnp.int32(Hp * Wp)
    lab = jnp.where(fg, y * Wp + x, big)        # min -> label + min_y
    lab2 = jnp.where(fg, x * Hp + y, big)       # min -> min_x
    labm = jnp.where(fg, y * Wp + x, -1)        # max -> max_y
    labm2 = jnp.where(fg, x * Hp + y, -1)       # max -> max_x
    is_max = (False, False, True, True)

    # segment-start flags per direction (int32; binary never changes)
    nfg = 1 - fg_i
    f_r = jnp.maximum(nfg, _shifted(nfg, 0, -1, jnp.int32(1)))   # fwd x
    f_rr = jnp.maximum(nfg, _shifted(nfg, 0, 1, jnp.int32(1)))   # bwd x
    f_c = jnp.maximum(nfg, _shifted(nfg, -1, 0, jnp.int32(1)))   # fwd y
    f_cr = jnp.maximum(nfg, _shifted(nfg, 1, 0, jnp.int32(1)))   # bwd y

    def prop8(vals):
        out = []
        for v, mx in zip(vals, is_max):
            best = v
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    s = _shifted(v, dy, dx, jnp.int32(-1 if mx else big))
                    best = jnp.maximum(best, s) if mx else jnp.minimum(best, s)
            out.append(jnp.where(fg, best, v))
        return out

    vals = [lab, lab2, labm, labm2]
    for _ in range(rounds):
        for _ in range(prop_steps):
            vals = prop8(vals)
        vals = _seg_scan_axis(vals, f_r, 1, Wp, False, is_max)
        vals = _seg_scan_axis(vals, f_rr, 1, Wp, True, is_max)
        vals = _seg_scan_axis(vals, f_c, 0, Hp, False, is_max)
        vals = _seg_scan_axis(vals, f_cr, 0, Hp, True, is_max)

    lab, lab2, labm, labm2 = vals
    min_y = lab // Wp
    max_y = labm // Wp
    min_x = lab2 // Hp
    max_x = labm2 // Hp
    lab_ref[:, :] = jnp.where(fg, lab, big)
    bw_ref[:, :] = jnp.where(fg, max_x - min_x + 1, 0)
    bh_ref[:, :] = jnp.where(fg, max_y - min_y + 1, 0)


def cc_fused(binary, rounds: int = 3, prop_steps: int = 2,
             interpret: bool = False):
    """Connected components + per-pixel blob bbox, one fused TPU kernel.

    binary: [H, W] bool. Returns (labels [H, W] int32 with background =
    Hp*Wp computed over the PADDED geometry, bbox_w [H, W] int32,
    bbox_h [H, W] int32, Wp) — label VALUES are padded flat indices
    (y*Wp + x), so callers must use Wp (returned) for coordinate decode.
    """
    H, W = binary.shape
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    fg = jnp.zeros((Hp, Wp), jnp.int32).at[:H, :W].set(binary.astype(jnp.int32))
    kern = functools.partial(
        _cc_fused_kernel, Hp=Hp, Wp=Wp, rounds=rounds, prop_steps=prop_steps
    )
    kwargs = {}
    if not interpret:
        # the doubling scans keep several full-image temporaries live; the
        # default 16 MB scoped-vmem cap is too tight for 4 int32 fields
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    lab, bw, bh = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(fg)
    return lab[:H, :W], bw[:H, :W], bh[:H, :W], Wp
