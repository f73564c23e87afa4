"""Fused Pallas TPU kernel: FAST-9/16 corner score map + 3x3 NMS.

Replaces ops/fast._fast_scores + nms3x3 + the high-threshold bonus for one
pyramid level (reference ORBextractor::ComputeKeyPointsOctTree FAST stage,
src/ORBextractor.cc:765-853). The XLA version materializes [16, H, W]
shifted stacks and doubling masks — ~3 ms/frame across the 8-level pyramid.
This kernel streams the 16 circle neighbors one at a time and packs the
bright/dark tests into BITS of a single int32 map per (threshold, polarity):

    bits[y, x] = sum_i (I[p+c_i] - I[p] > t) << i

The FAST "contiguous arc of >= 9" test then collapses to bit arithmetic on
one array: with b = bits | (bits << 16) (duplicated ring),
arc9 = (b & (b>>1) & ... & (b>>8)) != 0 — eight shift-ANDs instead of a
doubling cascade over 16 separate mask arrays.

Score semantics match ops/fast exactly: sum of max(|d| - t_low, 0) over the
circle for the passing polarity, +BONUS when the high-threshold arc passes,
3-pixel border zeroed, 3x3 strict NMS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_aruco_tpu.ops.fast import _CIRCLE

BONUS = 1e6


def _shifted(v, dy, dx, fill):
    """output[y, x] = v[y+dy, x+dx], static shifts, edges filled."""
    H, W = v.shape
    if dy > 0:
        v = jnp.concatenate([v[dy:, :], jnp.full((dy, W), fill, v.dtype)], 0)
    elif dy < 0:
        v = jnp.concatenate([jnp.full((-dy, W), fill, v.dtype), v[:dy, :]], 0)
    if dx > 0:
        v = jnp.concatenate([v[:, dx:], jnp.full((H, dx), fill, v.dtype)], 1)
    elif dx < 0:
        v = jnp.concatenate([jnp.full((H, -dx), fill, v.dtype), v[:, :dx]], 1)
    return v


def _fast_kernel(img_ref, out_ref, *, Hp, Wp, H, W, t_hi, t_lo):
    img = img_ref[:, :]
    zero32 = jnp.zeros((Hp, Wp), jnp.int32)
    bits_lb = zero32
    bits_ld = zero32
    bits_hb = zero32
    bits_hd = zero32
    sb = jnp.zeros((Hp, Wp), jnp.float32)
    sd = jnp.zeros((Hp, Wp), jnp.float32)
    for i, (dy, dx) in enumerate(_CIRCLE):
        sh = _shifted(img, int(dy), int(dx), jnp.float32(0))
        d = sh - img
        one = jnp.int32(1 << i)
        bits_lb = bits_lb | jnp.where(d > t_lo, one, 0)
        bits_ld = bits_ld | jnp.where(-d > t_lo, one, 0)
        bits_hb = bits_hb | jnp.where(d > t_hi, one, 0)
        bits_hd = bits_hd | jnp.where(-d > t_hi, one, 0)
        sb = sb + jnp.maximum(d - t_lo, 0.0)
        sd = sd + jnp.maximum(-d - t_lo, 0.0)

    def arc9(bits):
        b = bits | (bits << 16)
        acc = b
        for s in range(1, 9):
            acc = acc & (b >> s)
        # int32 >> is arithmetic: bit 31 sign-extends, so only windows that
        # end within bit 31 (start <= 23) are trustworthy — and starts 0..15
        # already cover every cyclic arc
        return (acc & jnp.int32(0x00FFFF)) != 0

    is_b_lo = arc9(bits_lb)
    is_d_lo = arc9(bits_ld)
    is_hi = arc9(bits_hb) | arc9(bits_hd)
    score = jnp.where(is_b_lo, sb, 0.0) + jnp.where(is_d_lo, sd, 0.0)
    # 3-pixel circle border + padding cut
    yy = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    border = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    score = jnp.where((is_b_lo | is_d_lo) & border, score, 0.0)
    # 3x3 strict NMS
    m = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shifted(score, dy, dx, jnp.float32(-1.0)))
    score = jnp.where(score >= m, score, 0.0)
    # high-threshold corners outrank all low-threshold-only corners
    score = jnp.where((score > 0.0) & is_hi, score + BONUS, score)
    out_ref[:, :] = score


def fast_score_nms(img, threshold_high: float, threshold_low: float,
                   interpret: bool = False):
    """Combined FAST score map (NMS'd, high-threshold bonus applied) for one
    pyramid level — drop-in for the _fast_scores/nms3x3/bonus stage of
    ops/fast.detect_level. img [H, W] float32."""
    H, W = img.shape
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    pad = jnp.zeros((Hp, Wp), jnp.float32).at[:H, :W].set(img)
    kern = functools.partial(_fast_kernel, Hp=Hp, Wp=Wp, H=H, W=W,
                             t_hi=float(threshold_high),
                             t_lo=float(threshold_low))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(pad)
    return out[:H, :W]
