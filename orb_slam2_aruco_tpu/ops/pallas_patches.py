"""Pallas TPU kernel: batched fixed-size patch extraction.

Replaces the vmapped-dynamic_slice patch gather in ops/orb.extract_patches
on TPU. XLA lowers a batch of dynamic slices to a windowed gather whose HBM
access pattern costs ~1.4 ms/frame at 1000 keypoints x 8 levels (measured,
tools/prof_orb_split.py); here the whole pyramid level sits in VMEM and the
per-keypoint [32, 32] loads are VMEM-to-VMEM copies driven by
scalar-prefetched coordinates — the classic TPU recipe for gather-shaped
work (see the fused CC kernel in pallas_cc_fused.py for the same pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(coords_ref, img_ref, out_ref, *, n, patch, interpret):
    roll = jnp.roll if interpret else pltpu.roll

    def body(i, carry):
        y = coords_ref[i, 0]
        x = coords_ref[i, 1]
        # Mosaic needs slice starts provably aligned (8 on sublanes, 128 on
        # lanes) and tile-aligned operand shapes: load an aligned [40, 256]
        # superset window and roll the residues away
        y_al = (y // 8) * 8
        x_al = (x // 128) * 128
        win = img_ref[pl.ds(y_al, patch + 8), pl.ds(x_al, 256)]
        # pltpu.roll takes NON-NEGATIVE shifts; a left-roll by d is a
        # right-roll by size - d (d = 0 -> full-cycle roll = identity)
        win = roll(win, ((patch + 8) - (y - y_al)) % (patch + 8), 0)
        win = roll(win, (256 - (x - x_al)) % 256, 1)
        out_ref[i, :, :] = win[:patch, :128]
        return carry

    jax.lax.fori_loop(0, n, body, 0)


def extract_patches_pallas(img, y0, x0, patch: int = 32,
                           interpret: bool = False):
    """img [H, W] float32; y0/x0 [N] int32 top-left corners (already clipped
    to [0, H-patch] / [0, W-patch]) -> [N, patch, patch] float32."""
    H, W = img.shape
    n = y0.shape[0]
    Hp = -(-H // 8) * 8 + 8      # +8/+256: aligned superset windows (kernel)
    Wp = -(-W // 128) * 128 + 256
    pad = jnp.zeros((Hp, Wp), jnp.float32).at[:H, :W].set(img)
    coords = jnp.stack([y0, x0], axis=1).astype(jnp.int32)
    kern = functools.partial(_patch_kernel, n=n, patch=patch,
                             interpret=interpret)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((Hp, Wp), lambda g, c: (0, 0))],
            out_specs=pl.BlockSpec((n, patch, 128),
                                   lambda g, c: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, patch, 128), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(coords, pad)
    return out[:, :, :patch]
