"""Fused Pallas TPU kernels for the training inner loop.

Round-4 profiling (scripts/profile_step.py, COVERAGE.md) showed the fused
growth step is HBM-bound, not FLOP-bound: ``evaluate_candidates`` spends
~5.5 ms/step streaming a ~710 MB [C,n,2,A,H] einsum intermediate through
HBM, and each EM iteration (~0.57 ms) re-reads its [K,2C,S,H] ``t`` tensor
four times plus a f32 pair-mask copy.  These kernels keep every
intermediate VMEM-resident:

* ``em_estep_pallas`` — one E+M step for all mtry candidates: the
  loop-invariant matched-pair mask streams in once per iteration as int8
  (4x less HBM than the f32 pre-cast the jnp tier uses), the
  ``t[(e,c),(s,h)]`` tensor is produced by ONE [2C,H]x[H,Sc*H] MXU matmul
  per sample chunk and consumed in VMEM.

* ``evaluate_candidates_pallas`` — per-candidate OOB accuracy + in-bag
  -2logLik: the [H,H] penalty matrices, the [2*A*C, nb*H] grouped
  contraction U, and the per-candidate allele-pair score grids all live in
  VMEM; only the [C] accuracy/loss vectors reach HBM.  The two big
  contractions factor through the shared one-hot allele grouping so the
  final [.,A] matmul has no per-candidate (c-diagonal) structure.

These kernels serve the FUSED training mode only (models/train_fused.py),
which already owns its trajectory (JAX PRNG candidate draws — see
docs/DEVIATIONS.md #4); the host/parity paths keep the pure-jnp
implementations in models/em.py bit-for-bit.  Reference equivalents: the
EM loops in src/LibHLA.cpp:1104-1255 and the candidate evaluation in
src/LibHLA.cpp:1920-1979.

Layout requirements: H a multiple of 128 (lane tile), L = 128 (MAXNUM_SNP),
n_alleles <= 128.  Accumulation order is fixed by the kernel (sequential
over samples / chunks), identical for any classifier-batch sharding — the
K axis rides an outer vmap/grid dimension that never changes per-k math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG_MIN_RARE_FREQ

BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Mosaic's pallas dot lowering supports only DEFAULT (1-pass bf16) and
# HIGHEST (6-pass) precision, so the bf16-split passes are written out by
# hand: 2 passes when one operand is EXACT in bf16 ({0,1} masks, one-hot
# groupings), 3 otherwise — the same ~17-bit-mantissa fidelity as XLA's
# Precision.HIGH that the jnp paths use, at 1/3-1/2 the MXU cost of
# HIGHEST.  Every product here is nonnegative, so there is no
# cancellation to amplify the split residuals.

def _split_bf16(A):
    hi = A.astype(jnp.bfloat16)
    lo = (A - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_exact_rhs(A, B16):
    """A [m,k] f32 @ B16 [k,n] bf16-exact -> f32, 2 MXU passes."""
    hi, lo = _split_bf16(A)
    return (jnp.dot(hi, B16, preferred_element_type=jnp.float32)
            + jnp.dot(lo, B16, preferred_element_type=jnp.float32))


def _dot_f32x3(A, B):
    """A @ B with both operands split hi/lo (lo*lo dropped): 3 MXU
    passes, ~Precision.HIGH fidelity."""
    ah, al = _split_bf16(A)
    bh, bl = _split_bf16(B)
    return (jnp.dot(ah, bh, preferred_element_type=jnp.float32)
            + (jnp.dot(ah, bl, preferred_element_type=jnp.float32)
               + jnp.dot(al, bh, preferred_element_type=jnp.float32)))


# ---------------------------------------------------------------------------
# EM E-step
# ---------------------------------------------------------------------------

def _em_kernel(maskT_ref, fboth_ref, m3_ref, b_ref, tn_ref,
               dfa_out, dfb_out, dll_out, *, sc, cp, h):
    """One sample-chunk of the E+M step for all candidates.

    maskT [Sc*H, H] int8 (matched-pair mask rows (s,h)); fboth [2Cp, H]
    (rows (e, c): e=0 -> fA, e=1 -> fB); m3 [Sc, Cp, 8] genotype-selection
    masks (lanes 0..2 = m00/m01/m11 — candidate axis on sublanes, so the
    per-sample [Cp,1] selectors are plain slices and the block's trailing
    dims satisfy Mosaic's (8,128)-or-full tiling rule); b [Sc, 1]
    bootstrap counts; tn [1,1] total_n.
    Outputs accumulate over the chunk grid: dfA/dfB [Cp, H], dll [Cp, 1].
    """
    i = pl.program_id(0)
    F = fboth_ref[:]                                   # [2Cp, H]
    fa = F[:cp]
    fb = F[cp:]
    fa2 = jnp.concatenate([fa, fa], axis=0)            # [2Cp, H]
    fb2 = jnp.concatenate([fb, fb], axis=0)
    mask_bf = maskT_ref[:].astype(jnp.bfloat16)        # [Sc*H, H], exact
    # t[(e,c),(s,h)] = sum_j f_e[c,j] * mask[s,h,j] — one split MXU pass
    T = _dot_exact_rhs(F, mask_bf.T)                   # [2Cp, Sc*H]

    accA = jnp.zeros((2 * cp, h), jnp.float32)
    accB = jnp.zeros((2 * cp, h), jnp.float32)
    dll = jnp.zeros((cp, 1), jnp.float32)
    for s in range(sc):
        Te = T[:, s * h:(s + 1) * h]                   # [2Cp, H]
        sA = jnp.sum(Te * fa2, axis=1, keepdims=True)  # [2Cp,1] = s_{0,e}
        sB = jnp.sum(Te * fb2, axis=1, keepdims=True)  # s_{1,e}
        mt = m3_ref[s]                                 # [Cp, 8]
        m00 = mt[:, 0:1]
        m01 = mt[:, 1:2]
        m11 = mt[:, 2:3]
        # psum = m00*s00 + m01*s01 + m01*s10 + m11*s11 (same expansion as
        # em._em_estep_chunk)
        psum = (m00 * sA[:cp] + m01 * sA[cp:] + m01 * sB[:cp]
                + m11 * sB[cp:])                        # [Cp, 1]
        ps = jnp.maximum(psum, 1e-37)
        Bs = b_ref[s, 0]
        wgt = Bs / ps
        w00 = wgt * m00
        w01 = wgt * m01
        w11 = wgt * m11
        accA = accA + Te * jnp.concatenate([w00, w01], axis=0)
        accB = accB + Te * jnp.concatenate([w01, w11], axis=0)
        dll = dll + Bs * jnp.log(ps)

    inv_tn = 1.0 / tn_ref[0, 0]
    dfa = fa * (accA[:cp] + accA[cp:]) * inv_tn
    dfb = fb * (accB[:cp] + accB[cp:]) * inv_tn

    @pl.when(i == 0)
    def _():
        dfa_out[:] = dfa
        dfb_out[:] = dfb
        dll_out[:] = dll

    @pl.when(i != 0)
    def _():
        dfa_out[:] += dfa
        dfb_out[:] += dfb
        dll_out[:] += dll


def em_chunk_size(H: int) -> int:
    """Sample-chunk size for the int8-mask EM kernel: targets ~4 MB for
    the streamed block, floored at 8 for sublane alignment.  In the floor
    regime (H >= 384) the per-grid-step VMEM is ~3*8*H^2 bytes (int8
    block + its bf16 copy) — EM_INT8_MAX_H caps the tier where that plus
    the T transient approaches the 16 MB ceiling."""
    sc = (4 * 1024 * 1024) // (H * H * 4)
    return int(max(8, min(64, (sc // 8) * 8)))


#: largest H the int8-mask EM kernel accepts: at the sc=8 chunk floor the
#: streamed block plus its in-kernel bf16 copy is 3*8*H^2 bytes (~9.8 MB
#: at 640; ~14.2 MB at 768, over the ceiling with the T transient).
#: Larger H falls through to the packed-mask kernel tier (<= 1024) or
#: the jnp tiers (em._make_estep).
EM_INT8_MAX_H = 640


def _em_kernel_packed(packed_ref, fboth_ref, m3_ref, b_ref, tn_ref,
                      dfa_out, dfb_out, dll_out, *, sc, cp, h):
    """Packed-mask variant of _em_kernel for cohort scale: the pair mask
    streams as a bitfield (uint8 [Sc*H, H/8], 8x less HBM than int8) and
    is unpacked in VMEM by shift/and into the PERMUTED column order
    p = b*(H/8) + k <-> j = 8k + b; the caller permutes fboth's H axis to
    match (em_permute_cols), which only reorders the exact lane summation.
    """
    i = pl.program_id(0)
    # caller stacks fboth = [original 2Cp rows | permuted 2Cp rows]: the
    # df updates and s-sums use the ORIGINAL h order (T's h axis is the
    # mask ROW index, untouched by the column permutation); the T matmul
    # uses the permuted rows to match the unpacked column order
    fa = fboth_ref[:cp]
    fb = fboth_ref[cp:2 * cp]
    Fp = fboth_ref[2 * cp:]                            # [2Cp, H] permuted
    fa2 = jnp.concatenate([fa, fa], axis=0)
    fb2 = jnp.concatenate([fb, fb], axis=0)

    accA = jnp.zeros((2 * cp, h), jnp.float32)
    accB = jnp.zeros((2 * cp, h), jnp.float32)
    dll = jnp.zeros((cp, 1), jnp.float32)
    for s in range(sc):
        p32 = packed_ref[pl.ds(s * h, h), :].astype(jnp.int32)  # [H, H/8]
        unp = jnp.concatenate(
            [((p32 >> b) & 1).astype(jnp.bfloat16) for b in range(8)],
            axis=1)                                    # [H, H] exact bf16
        Te = _dot_exact_rhs(Fp, unp.T)                 # [2Cp, H]
        sA = jnp.sum(Te * fa2, axis=1, keepdims=True)
        sB = jnp.sum(Te * fb2, axis=1, keepdims=True)
        mt = m3_ref[s]
        m00 = mt[:, 0:1]
        m01 = mt[:, 1:2]
        m11 = mt[:, 2:3]
        psum = (m00 * sA[:cp] + m01 * sA[cp:] + m01 * sB[:cp]
                + m11 * sB[cp:])
        ps = jnp.maximum(psum, 1e-37)
        Bs = b_ref[s, 0]
        wgt = Bs / ps
        w00 = wgt * m00
        w01 = wgt * m01
        w11 = wgt * m11
        accA = accA + Te * jnp.concatenate([w00, w01], axis=0)
        accB = accB + Te * jnp.concatenate([w01, w11], axis=0)
        dll = dll + Bs * jnp.log(ps)

    inv_tn = 1.0 / tn_ref[0, 0]
    dfa = fa * (accA[:cp] + accA[cp:]) * inv_tn
    dfb = fb * (accB[:cp] + accB[cp:]) * inv_tn

    @pl.when(i == 0)
    def _():
        dfa_out[:] = dfa
        dfb_out[:] = dfb
        dll_out[:] = dll

    @pl.when(i != 0)
    def _():
        dfa_out[:] += dfa
        dfb_out[:] += dfb
        dll_out[:] += dll


@functools.partial(jax.jit, static_argnames=("interpret",))
def em_estep_pallas(fA, fB, maskT, m3, B2, total_n, interpret=False):
    """One E+M step from a pre-packed mask; drop-in for the per-iteration
    body of em._em_estep_masked (fused f32 mode only).

    fA/fB [Cp, H] (candidate-padded: pad rows DUPLICATE candidate 0 so
    psum stays positive); maskT [S_pad*H, H] int8; m3 [S_pad, Cp, 8] f32;
    B2 [S_pad, 1] f32 (0 in padded rows); total_n scalar.
    Returns (dfA [Cp,H], dfB [Cp,H], dll [Cp,1]).
    """
    cp, H = fA.shape
    S = B2.shape[0]
    sc = em_chunk_size(H)
    assert S % sc == 0 and maskT.shape == (S * H, H), (S, sc, maskT.shape)
    grid = (S // sc,)
    fboth = jnp.concatenate([fA, fB], axis=0)
    tn = jnp.full((1, 1), total_n, jnp.float32)
    kern = functools.partial(_em_kernel, sc=sc, cp=cp, h=H)
    dfa, dfb, dll = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sc * H, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, cp, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((cp, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, H), jnp.float32),
            jax.ShapeDtypeStruct((cp, H), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * H * (2 * cp * H + 8 * cp),
            bytes_accessed=S * H * H + 2 * cp * H * 4 + 3 * cp * S * 4,
            transcendentals=S * cp,
        ),
        interpret=interpret,
    )(maskT, fboth, m3, B2, tn)
    return dfa, dfb, dll


def em_unpack_perm(H: int) -> np.ndarray:
    """Column permutation produced by the kernel's shift/and unpack of the
    _pack_mask bitfield: unpacked column p = b*(H/8) + k holds original
    column j = 8k + b."""
    p = np.arange(H)
    b, k = p // (H // 8), p % (H // 8)
    return (8 * k + b).astype(np.int32)


#: sample-chunk for the packed kernel (per-sample unpack keeps VMEM flat,
#: so the chunk only needs sublane alignment for the [Sc,1] blocks)
EM_PACKED_CHUNK = 8
#: largest H the packed kernel accepts (the [H, H] bf16 per-sample unpack
#: plus the T matmul transient must fit VMEM with the packed block)
EM_PACKED_MAX_H = 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def em_estep_pallas_packed(fA, fB, packedT, m3, B2, total_n,
                           interpret=False):
    """Packed-mask E+M step: drop-in for em._em_estep_packed's iteration
    body.  fA/fB [Cp, H] candidate-padded (ORIGINAL h order); packedT
    [S_pad*H, H//8] uint8 (_pack_mask layout, rows (s,h)); m3/B2 as in
    em_estep_pallas.  Returns (dfA, dfB [Cp,H], dll [Cp,1])."""
    cp, H = fA.shape
    S = B2.shape[0]
    sc = EM_PACKED_CHUNK
    assert S % sc == 0 and packedT.shape == (S * H, H // 8)
    perm = jnp.asarray(em_unpack_perm(H))
    fboth = jnp.concatenate([fA, fB], axis=0)
    fboth = jnp.concatenate([fboth, fboth[:, perm]], axis=0)  # [4Cp, H]
    tn = jnp.full((1, 1), total_n, jnp.float32)
    kern = functools.partial(_em_kernel_packed, sc=sc, cp=cp, h=H)
    dfa, dfb, dll = pl.pallas_call(
        kern,
        grid=(S // sc,),
        in_specs=[
            pl.BlockSpec((sc * H, H // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * cp, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, cp, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((cp, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, H), jnp.float32),
            jax.ShapeDtypeStruct((cp, H), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * H * (2 * cp * H + 8 * cp),
            bytes_accessed=S * H * (H // 8) + 4 * cp * H * 4
            + S * cp * 8 * 4,
            transcendentals=S * cp,
        ),
        interpret=interpret,
    )(packedT, fboth, m3, B2, tn)
    return dfa, dfb, dll


def em_prepare_packed_pallas(packed, m, B, C, H):
    """Kernel-layout conversion for the packed tier: packed [S,H,H//8]
    uint8 -> [S_pad*H, H//8]; m/B as in em_prepare_pallas."""
    S = packed.shape[0]
    sc = EM_PACKED_CHUNK
    S_pad = _round_up(S, sc)
    cp = _round_up(C, 8)
    if S_pad != S:
        packed = jnp.pad(packed, ((0, S_pad - S), (0, 0), (0, 0)))
    packedT = packed.reshape(S_pad * H, H // 8)
    m3 = jnp.swapaxes(m, 0, 1)
    if cp != C:
        m3 = jnp.concatenate(
            [m3, jnp.broadcast_to(m3[:, :1], (S, cp - C, 3))], axis=1)
    m3 = jnp.pad(m3, ((0, S_pad - S), (0, 0), (0, 5)))
    B2 = jnp.pad(B.astype(jnp.float32), (0, S_pad - S))[:, None]
    return packedT, m3, B2, cp


def em_prepare_pallas(mask, m, B, C):
    """Host-side (traced, once per growth step) conversion of the jnp-tier
    EM inputs to the kernel layouts: mask [S,H,H] bool -> maskT int8
    [S_pad*H, H]; m [C,S,3] -> m3 [S_pad, Cp, 8] (lanes 0..2; pad
    candidates DUPLICATE candidate 0 — zero-padding would produce inf EM
    weights); B [S] -> [S_pad, 1].  Returns (maskT, m3, B2, Cp)."""
    S, H, _ = mask.shape
    sc = em_chunk_size(H)
    S_pad = _round_up(S, sc)
    cp = _round_up(C, 8)
    maskT = mask.astype(jnp.int8)
    if S_pad != S:
        maskT = jnp.pad(maskT, ((0, S_pad - S), (0, 0), (0, 0)))
    maskT = maskT.reshape(S_pad * H, H)
    m3 = jnp.swapaxes(m, 0, 1)                       # [S, C, 3]
    if cp != C:
        m3 = jnp.concatenate(
            [m3, jnp.broadcast_to(m3[:, :1], (S, cp - C, 3))], axis=1)
    m3 = jnp.pad(m3, ((0, S_pad - S), (0, 0), (0, 5)))
    B2 = jnp.pad(B.astype(jnp.float32), (0, S_pad - S))[:, None]
    return maskT, m3, B2, cp


def em_pad_candidates(fA, fB, cp):
    """Pad the candidate axis to ``cp`` rows by duplicating candidate 0
    (finite, valid EM math; the extra rows are sliced away)."""
    C = fA.shape[0]
    if C == cp:
        return fA, fB
    rep = jnp.broadcast_to(fA[:1], (cp - C, fA.shape[1]))
    repb = jnp.broadcast_to(fB[:1], (cp - C, fB.shape[1]))
    return (jnp.concatenate([fA, rep], axis=0),
            jnp.concatenate([fB, repb], axis=0))


# ---------------------------------------------------------------------------
# candidate evaluation (OOB accuracy + in-bag -2logLik)
# ---------------------------------------------------------------------------

def _eval_kernel(bits_ref, geno_ref, fab_ref, ohl_ref, oht_ref, valid_ref,
                 pdq_ref, a1_ref, a2_ref, oob_ref, b_ref,
                 acc_out, ll_out,
                 mf2_s,
                 *, nb, ap, cp, h):
    """One nb-sample block of candidate evaluation for one classifier.

    Score grid rows are laid out (a, c) = a*Cp + c so every per-candidate
    reduction is a stride-Cp slice chain (Cp is sublane-aligned) and the
    final allele-grouping matmul shares one one-hot operand across all
    candidates — no c-diagonal batched matmuls.
    """
    i = pl.program_id(0)
    apcp = ap * cp
    fa = fab_ref[:cp]                                   # [Cp, H]
    fb = fab_ref[cp:]

    @pl.when(i == 0)
    def _():
        # per-classifier constants, persistent scratch across the grid:
        # Mf2[(b,a,c), j] = f_b[c,j] * [allele_j == a]
        for a in range(ap):
            oh = ohl_ref[a:a + 1, :]                    # [1, H]
            mf2_s[a * cp:(a + 1) * cp, :] = fa * oh
            mf2_s[apcp + a * cp:apcp + (a + 1) * cp, :] = fb * oh

    # --- distances for the block (ops/scoring.py decomposition) ----------
    hb = bits_ref[:]                                    # [H, L]
    hb16 = hb.astype(jnp.bfloat16)
    hb2 = hb + hb
    invalid = 1.0 - valid_ref[:]                        # [H, 1]
    M = BIG * invalid + BIG * invalid.T                 # [H, H]
    g = geno_ref[:].astype(jnp.int32)                   # [nb, L]
    is1 = (g == 1)
    u = ((g == 0).astype(jnp.float32) - is1.astype(jnp.float32)
         - (g == 2).astype(jnp.float32))
    m1 = is1.astype(jnp.float32)
    alpha = (is1.astype(jnp.float32)
             + 2.0 * (g == 2).astype(jnp.float32)).sum(axis=1,
                                                       keepdims=True)
    v = jnp.dot(hb, u.T, preferred_element_type=jnp.float32)    # [H, nb]
    v2 = jnp.dot(u, hb.T, preferred_element_type=jnp.float32) + alpha

    # hoisted index patterns for the per-sample reductions
    row_a = jax.lax.broadcasted_iota(jnp.int32, (apcp, 128), 0) // cp
    lane = jax.lax.broadcasted_iota(jnp.int32, (apcp, 128), 1)
    diag2 = jnp.where(row_a == lane, 1.0, 2.0)          # [ApCp, 128]
    flatv = row_a * 128 + lane
    oht16 = oht_ref[:].astype(jnp.bfloat16)

    acc = jnp.zeros((cp, 1), jnp.float32)
    ll = jnp.zeros((cp, 1), jnp.float32)
    # fully per-sample pipeline: [H,H] penalties, the [2ApCp,H] grouped
    # contraction U and the [ApCp,H] pd/frequency fold all stay transient
    # in VMEM — block depth nb never scales any buffer
    for s in range(nb):
        hm = (hb2 * m1[s, :][None, :]).astype(jnp.bfloat16)
        cross = jnp.dot(hm, hb16.T,
                        preferred_element_type=jnp.float32)  # [H, H]
        D = v[:, s:s + 1] + v2[s:s + 1, :] + cross + M
        dmin = jnp.min(D)
        # invalid rows/cols carry +BIG and underflow to exactly 0 here
        pen = jnp.exp(LOG_MIN_RARE_FREQ * (D - dmin))   # [H, H]

        U = _dot_f32x3(mf2_s[:], pen)                   # [2ApCp, H]
        U0 = U[:apcp]
        U1 = U[apcp:]
        pdt = pdq_ref[s]                                # [Cp, 8]
        pd0 = jnp.concatenate([pdt[:, 0:1]] * ap, axis=0)   # [ApCp, 1]
        pd1 = jnp.concatenate([pdt[:, 1:2]] * ap, axis=0)
        pd2 = jnp.concatenate([pdt[:, 2:3]] * ap, axis=0)
        V0 = pd0 * U0 + pd1 * U1
        V1 = pd1 * U0 + pd2 * U1
        # W[(a,c)] = fa[c] * V0[(a,c)] + fb[c] * V1[(a,c)] — per-a slices
        # of fab, no A-expanded frequency scratch (VMEM: the expansion
        # scratch pushed H=640 past the 16 MB ceiling)
        W = jnp.concatenate(
            [fa * V0[a * cp:(a + 1) * cp] + fb * V1[a * cp:(a + 1) * cp]
             for a in range(ap)], axis=0)               # [ApCp, H]
        # S[(a,c), B] — the one-hot grouping shared across c (exact {0,1}
        # in bf16 -> 2 split passes)
        slab = _dot_exact_rhs(W, oht16)                 # [ApCp, 128]
        # total[c] = sum over (a, B)
        tot = slab[:cp, :]
        for a in range(1, ap):
            tot = tot + slab[a * cp:(a + 1) * cp, :]
        total = jnp.sum(tot, axis=1, keepdims=True)     # [Cp, 1]
        # true-pair score S[c, a1, a2]
        a1 = a1_ref[s, 0]
        a2 = a2_ref[s, 0]
        sel = jnp.where((row_a == a1) & (lane == a2), 1.0, 0.0)
        pick = slab * sel
        tqs = pick[:cp, :]
        for a in range(1, ap):
            tqs = tqs + pick[a * cp:(a + 1) * cp, :]
        tq = jnp.sum(tqs, axis=1, keepdims=True)        # [Cp, 1]
        mult = jnp.where(a1 == a2, 1.0, 2.0)
        # best guess: first row-major max of the unordered grid
        Q = slab * diag2
        mx = Q[:cp, :]
        for a in range(1, ap):
            mx = jnp.maximum(mx, Q[a * cp:(a + 1) * cp, :])
        mxc = jnp.max(mx, axis=1, keepdims=True)        # [Cp, 1]
        mxb = jnp.concatenate([mxc] * ap, axis=0)       # [ApCp, 1]
        cand = jnp.where(Q >= mxb, flatv, jnp.int32(1 << 30))
        mm = cand[:cp, :]
        for a in range(1, ap):
            mm = jnp.minimum(mm, cand[a * cp:(a + 1) * cp, :])
        midx = jnp.min(mm, axis=1, keepdims=True)       # [Cp, 1]
        bi = midx // 128
        bj = midx % 128
        g1 = jnp.minimum(bi, bj)
        g2 = jnp.maximum(bi, bj)
        # CHLATypeList::Compare (src/LibHLA.cpp:911-924)
        m1c = (g1 == a1) | (g1 == a2)
        t1u = jnp.where(m1c & (g1 == a1), -1, a1)
        t2u = jnp.where(m1c & (g1 != a1) & (g1 == a2), -1, a2)
        m2c = (g2 == t1u) | (g2 == t2u)
        cnt = m1c.astype(jnp.float32) + m2c.astype(jnp.float32)
        gate = oob_ref[s, 0] * jnp.where(total > 0, 1.0, 0.0)
        acc = acc + cnt * gate
        post = tq * mult / jnp.maximum(total, 1e-37)
        ll = ll - 2.0 * b_ref[s, 0] * jnp.log(jnp.maximum(post, 1e-37))

    @pl.when(i == 0)
    def _():
        acc_out[:] = acc
        ll_out[:] = ll

    @pl.when(i != 0)
    def _():
        acc_out[:] += acc
        ll_out[:] += ll


def eval_block_size(H: int) -> int:
    """Sample-block depth: the per-sample pipeline keeps every big buffer
    transient, so the block never scales VMEM — 8 satisfies Mosaic's
    sublane tiling for every small input block."""
    return 8


@functools.partial(jax.jit, static_argnames=("n_alleles", "interpret"))
def evaluate_candidates_pallas(bits, allele, fA, fB, g_cand, geno_sel,
                               true_a1, true_a2, is_oob, B, n_alleles,
                               interpret=False):
    """Pallas drop-in for em.evaluate_candidates (fused f32 mode).

    Same contract: bits [H,L]; allele [H]; fA/fB [C,H] post-erase
    frequencies; g_cand [C, Neval]; geno_sel [Neval, L]; true_a1/a2,
    is_oob, B [Neval].  Returns (acc_count [C] int32, loglik [C] f32).
    """
    C, H = fA.shape
    Neval, L = geno_sel.shape
    A = n_alleles
    nb = eval_block_size(H)
    cp = _round_up(C, 8)
    N_pad = _round_up(Neval, nb)

    fA_p, fB_p = em_pad_candidates(fA, fB, cp)
    fab = jnp.concatenate([fA_p, fB_p], axis=0)          # [2Cp, H]
    ok = (fA > 0) | (fB > 0)
    base_ok = jnp.any(ok, axis=0)                        # [H]
    valid = base_ok.astype(jnp.float32)[:, None]         # [H, 1]
    # one-hot allele grouping, both orientations (alleles beyond A never
    # occur; padded haplotype slots carry freq 0 and vanish in Mf2)
    aa = jnp.arange(A, dtype=jnp.int32)
    ohl = (allele[None, :] == aa[:, None]).astype(jnp.float32)   # [A, H]
    oht = (allele[:, None]
           == jnp.arange(128, dtype=jnp.int32)[None, :]).astype(
               jnp.float32)                               # [H, 128]

    # per-(sample, candidate) new-SNP penalties pd_m = q^delta(g, m),
    # m = b1+b2 in {0,1,2} (the jnp path's `delta` select, em.py)
    gT = g_cand.T                                         # [Neval, C]
    d0 = jnp.select([gT == 0, gT == 1, gT == 2],
                    [jnp.zeros_like(gT), jnp.ones_like(gT),
                     jnp.full_like(gT, 2)], jnp.zeros_like(gT))
    d1 = jnp.select([gT == 0, gT == 1, gT == 2],
                    [jnp.ones_like(gT), jnp.zeros_like(gT),
                     jnp.ones_like(gT)], jnp.zeros_like(gT))
    d2 = jnp.select([gT == 0, gT == 1, gT == 2],
                    [jnp.full_like(gT, 2), jnp.ones_like(gT),
                     jnp.zeros_like(gT)], jnp.zeros_like(gT))
    pdq = jnp.exp(LOG_MIN_RARE_FREQ
                  * jnp.stack([d0, d1, d2], axis=-1).astype(jnp.float32))
    pdq = jnp.pad(pdq, ((0, N_pad - Neval), (0, cp - C), (0, 5)))
    # candidate-padded rows duplicate candidate 0 (valid math, discarded)
    if cp != C:
        pdq = pdq.at[:, C:, :].set(pdq[:, :1, :])

    pad_n = N_pad - Neval
    geno_p = jnp.pad(geno_sel.astype(jnp.int8), ((0, pad_n), (0, 0)),
                     constant_values=3)
    a1_p = jnp.pad(true_a1.astype(jnp.int32), (0, pad_n))[:, None]
    a2_p = jnp.pad(true_a2.astype(jnp.int32), (0, pad_n))[:, None]
    oob_p = jnp.pad(is_oob.astype(jnp.float32), (0, pad_n))[:, None]
    b_p = jnp.pad(B.astype(jnp.float32), (0, pad_n))[:, None]

    ap = A
    apcp = ap * cp
    grid = (N_pad // nb,)
    kern = functools.partial(_eval_kernel, nb=nb, ap=ap, cp=cp, h=H)
    acc, ll = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cp, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ap, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, cp, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * apcp, H), jnp.float32),   # Mf2
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N_pad * (H * L + H * H * L
                               + 2 * apcp * H * H + apcp * H * 128),
            bytes_accessed=N_pad * (L + cp * 8 * 4)
            + (H * L + 2 * cp * H + H * 128) * 4,
            transcendentals=N_pad * H * H,
        ),
        interpret=interpret,
    )(bits.astype(jnp.float32), geno_p, fab, ohl, oht, valid, pdq,
      a1_p, a2_p, oob_p, b_p)
    return acc[:C, 0].astype(jnp.int32), ll[:C, 0]


#: largest H the eval kernel accepts.  VMEM bound: the persistent Mf2
#: scratch [2*A*Cp, H] f32 plus the per-sample pen/U/W transients reach
#: ~15.2 MB of the 16 MB ceiling at A=14, Cp=32, H=640 (H=768 would need
#: ~18 MB).  640 is the dominant freeze-resume capacity of the
#: exact-at-scale cohort run, where this kernel measures 1.55 s vs the
#: jnp eval's 2.06 s per step at N=102,400 (scripts/
#: profile_eval_cohort.py, COVERAGE.md round 5).  Env override for
#: profiling experiments.
EVAL_MAX_H = int(os.environ.get("HIBAG_TPU_EVAL_MAX_H", "640"))


def eval_shapes_supported(H: int, L: int, A: int) -> bool:
    """Kernel layout preconditions (callers fall back to the jnp path)."""
    return (H % 128 == 0) and (L == 128) and (A <= 128) and (H <= EVAL_MAX_H)
