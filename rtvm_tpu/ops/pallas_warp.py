"""Pallas TPU kernel: fused two-pass perspective warp.

Same math as ops/warp.warp_two_pass (exact bilinear via per-row-block 5-tap
selection matmuls — see that docstring), but everything lives in VMEM:

- the whole (bf16) frame is VMEM-resident across the output-column grid;
- the 0/1 tap-selection matrices are generated on the fly per row block and
  never touch HBM (the XLA version materializes ~200 MB of selection tensors +
  shifted data copies per frame — measured ~2 ms/frame of pure HBM traffic);
- the pass-1 intermediate lives in a VMEM scratch.

Grid: one program per 128-column block of the output. Per program:
  pass 1 resamples every frame row at this block's output columns (row blocks
  of RB=16, tap base = floor(block-min position), exact per-(row, col) hat
  weights); transpose in VMEM; pass 2 resamples the intermediate's columns to
  output rows. Output layout is [C, Wc, Hc] (x-major) — the caller transposes
  once (or consumes x-major directly).

Positions are the exact rational maps (reference cv2.warpPerspective semantics,
main.py:871, INTER_LINEAR + zero border); validity regime is the caller's
two_pass_regime_ok, identical to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = 5
RB = 16
JBLK = 128  # output-column block per grid program
PADL = 8  # left/top zero margin inside the padded frame: keeps the tap BASE
# s0 = floor(min position) inside the selection matrix at content borders
# (positions are offset by +PADL; without the margin s0 = -1 kills all taps
# and border pixels lose their partial zero-blend)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hat_combine(taps_out, t_pos):
    """taps_out [TAPS, C, RB, N], exact positions t_pos [RB, N] relative to the
    tap window -> [C, RB, N]."""
    acc = jnp.zeros(taps_out.shape[1:], jnp.float32)
    for t in range(TAPS):
        a = jnp.maximum(0.0, 1.0 - jnp.abs(t_pos - t))
        acc = acc + a[None] * taps_out[t]
    return acc


def _resample_block(src, p, kw):
    """src [C, RB, KW+TAPS-1+] bf16 rows, positions p [RB, N] -> [C, RB, N] f32.

    Tap base from the block-min (floor), one MXU matmul over TAPS x-shifted
    copies against a 0/1 selection matrix built in VMEM, exact hat weights."""
    c = src.shape[0]
    n = p.shape[1]
    s0 = jnp.floor(jnp.min(p, axis=0))  # [N]
    s0 = jnp.clip(s0, -float(TAPS), float(kw))
    xs = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 0).astype(jnp.float32)
    sel = (xs == s0[None, :]).astype(jnp.bfloat16)  # [KW, N]
    g = jnp.concatenate([src[:, :, t : t + kw] for t in range(TAPS)], axis=0)
    # [TAPS*C, RB, KW] -> [TAPS*C*RB, KW]
    g2 = g.reshape(TAPS * c * RB, kw)
    taps_out = jnp.dot(g2, sel, preferred_element_type=jnp.float32)
    taps_out = taps_out.reshape(TAPS, c, RB, n)
    return _hat_combine(taps_out, p - s0[None, :])


def _warp_kernel(hg_ref, frame_ref, out_ref, t_ref, tt_ref):
    """hg_ref [2, 9] f32 (H flat, G=H^-1 flat) in SMEM; frame_ref [C, HFP, WFP]
    bf16 in VMEM; out_ref [C, JBLK, HC] f32; t/tt scratches."""
    c, hfp, wfp = frame_ref.shape
    hc = out_ref.shape[2]
    kw1 = wfp - TAPS - 3  # pass-1 matmul K extent (taps need lookahead)
    j0 = (pl.program_id(0) * JBLK).astype(jnp.float32)

    h01, h02 = hg_ref[0, 1], hg_ref[0, 2]
    h00, h21, h22, h20 = hg_ref[0, 0], hg_ref[0, 7], hg_ref[0, 8], hg_ref[0, 6]
    g10, g11, g12 = hg_ref[1, 3], hg_ref[1, 4], hg_ref[1, 5]
    g20, g21, g22 = hg_ref[1, 6], hg_ref[1, 7], hg_ref[1, 8]

    # ---- pass 1: frame rows -> this block's output columns ----
    def body1(b, _):
        # positions recomputed per block (Mosaic has no dynamic_slice on values)
        y = (b * RB).astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (RB, JBLK), 0
        ).astype(jnp.float32)
        X = j0 + jax.lax.broadcasted_iota(jnp.int32, (RB, JBLK), 1).astype(jnp.float32)
        den1 = h20 * X - h00
        den1 = jnp.where(jnp.abs(den1) < 1e-9, 1e-9, den1)
        p = ((h01 * y + h02) - X * (h21 * y + h22)) / den1 + PADL  # [RB, JBLK]
        src = frame_ref[:, pl.ds(b * RB, RB), :]
        acc = _resample_block(src, p, kw1)
        t_ref[:, pl.ds(b * RB, RB), :] = acc
        return 0

    jax.lax.fori_loop(0, hfp // RB, body1, 0)

    # ---- transpose the intermediate in VMEM ----
    khp = tt_ref.shape[2]  # padded source extent for pass 2
    tt_ref[:, :, :] = jnp.zeros(tt_ref.shape, tt_ref.dtype)
    tt_ref[:, :, PADL : PADL + hfp] = jnp.swapaxes(t_ref[:, :, :], 1, 2).astype(jnp.bfloat16)

    # ---- pass 2: intermediate columns -> output rows ----
    kw2 = khp - TAPS - 3

    def body2(b, _):
        X2 = j0 + (b * RB).astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (RB, hc), 0
        ).astype(jnp.float32)
        Y = jax.lax.broadcasted_iota(jnp.int32, (RB, hc), 1).astype(jnp.float32)
        den2 = g20 * X2 + g21 * Y + g22
        den2 = jnp.where(jnp.abs(den2) < 1e-9, 1e-9, den2)
        p = (g10 * X2 + g11 * Y + g12) / den2 + PADL  # [RB, HC]
        src = tt_ref[:, pl.ds(b * RB, RB), :]
        acc = _resample_block(src, p, kw2)
        out_ref[:, pl.ds(b * RB, RB), :] = acc
        return 0

    jax.lax.fori_loop(0, JBLK // RB, body2, 0)


def warp_two_pass_pallas(
    stack: jnp.ndarray, H: jnp.ndarray, out_h: int, out_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Warp a channel-major [C, Hf, Wf] stack by H (frame -> output coords) onto
    [C, out_h, out_w]; numerically matches ops.warp.warp_two_pass within bf16.
    Valid in the regime checked by warp.pallas_regime_ok (the XLA two-pass
    regime PLUS a row/column shear bound: the kernel uses per-row-BLOCK tap
    bases with no per-row anchor, so positions may spread at most ~3px across
    an RB-row block)."""
    c, hf, wf = stack.shape
    hfp = _round_up(hf, RB)
    wfp = _round_up(wf + TAPS + 3 + PADL, 128)
    wcp = _round_up(out_w, JBLK)
    hcp = _round_up(out_h, 128)
    khp = _round_up(hfp + TAPS + 3 + PADL, 128)

    frame = jnp.pad(
        stack, ((0, 0), (0, hfp - hf), (PADL, wfp - wf - PADL))
    ).astype(jnp.bfloat16)
    G = jnp.linalg.inv(H)
    hg = jnp.stack([H.reshape(9), G.reshape(9)]).astype(jnp.float32)

    out_t = pl.pallas_call(
        _warp_kernel,
        grid=(wcp // JBLK,),
        in_specs=[
            pl.BlockSpec((2, 9), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, hfp, wfp), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, JBLK, hcp), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, wcp, hcp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, hfp, JBLK), jnp.float32),
            pltpu.VMEM((c, JBLK, khp), jnp.bfloat16),
        ],
        interpret=interpret,
    )(hg, frame)
    return jnp.swapaxes(out_t, 1, 2)[:, :out_h, :out_w]  # [C, Hc, Wc]
