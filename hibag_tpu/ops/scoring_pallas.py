"""Fused Pallas TPU kernel for posterior scoring.

Computes, per sample n against one classifier's haplotype list,

    S_n = Wᵀ · exp(λ·(D_n − dmin_n)) · W,   D_n = α_n + v_n⊕v_n + 2·(H∘m_n)Hᵀ

in one kernel invocation per sample block: the [H,H] distance/penalty matrix
lives only in VMEM scratch (never HBM), the cross term and the two
allele-grouping contractions all run on the MXU, and the per-sample
min-distance shift keeps f32 exact. This is the TPU replacement for the
reference's AVX-512 popcount scoring loops (src/LibHLA_ext_avx512*.cpp) and
the HBM-bandwidth fix for the jnp reference path in ops/scoring.py (which
materializes [N,H,H] penalties).

Layout requirements: H and A padded to multiples of 128 (MXU tile), L = 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LOG_MIN_RARE_FREQ

NB = 8          # samples per grid step
BIG = 1e9


def _kernel(hb_ref, w_ref, valid_ref, alpha_ref, u_ref, m1_ref,
            s_out, dmin_out, total_out, hm_s, d_s, t_s):
    hb = hb_ref[:]                       # [H, L]
    w = w_ref[:]                         # [H, A]
    invalid = 1.0 - valid_ref[:]         # [H, 1]
    # v[h, s] = sum_l hb[h,l] * u[s,l]
    v = jnp.dot(hb, u_ref[:].T, preferred_element_type=jnp.float32)  # [H, NB]

    for s in range(NB):
        hm_s[:] = hb * m1_ref[s, :][None, :]
        d_s[:] = 2.0 * jnp.dot(hm_s[:], hb.T,
                               preferred_element_type=jnp.float32)
        D = (alpha_ref[s, 0] + v[:, s:s + 1] + v[:, s][None, :] + d_s[:]
             + BIG * invalid + BIG * invalid.T)
        dmin = jnp.min(D)
        pen = jnp.exp(LOG_MIN_RARE_FREQ * (D - dmin))
        # value-carrying contractions need full f32 MXU passes (bf16 default
        # would put ~0.3% error on posteriors)
        t_s[:] = jnp.dot(pen, w, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)          # [H, A]
        S = jnp.dot(w.T, t_s[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)               # [A, A]
        s_out[s] = S
        dmin_out[pl.ds(s, 1), :] = dmin.reshape(1, 1)
        total_out[pl.ds(s, 1), :] = jnp.sum(S).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def posterior_scores_pallas(hap_bits, W, valid, alpha, u, m1,
                            interpret=False):
    """S [N, A, A], dmin [N], total [N] for one classifier.

    hap_bits [H, L] f32 {0,1}; W [H, A] f32 = freq ⊙ one-hot(allele);
    valid [H] f32 (1 = real haplotype slot); alpha [N]; u [N, L]; m1 [N, L]
    (geno_coefficients output). H, A multiples of 128; N multiple of NB.
    """
    H, L = hap_bits.shape
    A = W.shape[1]
    N = alpha.shape[0]
    assert H % 128 == 0 and A % 128 == 0 and N % NB == 0, (H, A, N)

    grid = (N // NB,)
    S, dmin, total = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, A, A), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, A, A), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, L), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
            pltpu.VMEM((H, A), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * (H * L + H * H * L + 2 * H * H * A),
            bytes_accessed=N * (A * A + 2 * L) * 4 + (H * L + H * A) * 4,
            transcendentals=N * H * H,
        ),
        interpret=interpret,
    )(hap_bits, W, valid[:, None], alpha[:, None], u, m1)
    return S, dmin[:, 0], total[:, 0]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel_ens(hb_ref, w_ref, valid_ref, alpha_ref, u_ref, m1_ref,
                s_out, dmin_out, total_out, hm_s, d_s, t_s):
    hb = hb_ref[0]                        # [H, L]
    w = w_ref[0]                          # [H, A]
    invalid = 1.0 - valid_ref[0]          # [H, 1]
    v = jnp.dot(hb, u_ref[0].T, preferred_element_type=jnp.float32)

    for s in range(NB):
        hm_s[:] = hb * m1_ref[0, s, :][None, :]
        d_s[:] = 2.0 * jnp.dot(hm_s[:], hb.T,
                               preferred_element_type=jnp.float32)
        D = (alpha_ref[0, s, 0] + v[:, s:s + 1] + v[:, s][None, :] + d_s[:]
             + BIG * invalid + BIG * invalid.T)
        dmin = jnp.min(D)
        pen = jnp.exp(LOG_MIN_RARE_FREQ * (D - dmin))
        t_s[:] = jnp.dot(pen, w, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        S = jnp.dot(w.T, t_s[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        s_out[0, s] = S
        dmin_out[0, pl.ds(s, 1), :] = dmin.reshape(1, 1)
        total_out[0, pl.ds(s, 1), :] = jnp.sum(S).reshape(1, 1)


def _kernel_ens_acc(hb_ref, w_ref, valid_ref, g_ref,
                    wgt_ref, ens_out, dmin_out, total_out, hm_s, pen2_s,
                    u3_s, *, nb, majority=False, cb=1):
    """Accumulating ensemble kernel: grid (N//nb, C) with classifiers on the
    FAST axis, so the ensemble block stays resident in VMEM while every
    classifier's weighted unordered posterior is added into it.

    All nb samples' distance matrices are produced by ONE [nb·H, L]x[L, H]
    bf16 matmul (exact: inputs are {0,1} bits and the f32 accumulator sees
    integer sums <= 2L). The per-sample allele contraction Wᵀ·pen_s·W
    exploits the SYMMETRY of pen_s: each sample's penalty block is stored
    column-wise into one [H, nb·H] buffer (a free layout change), so the
    whole block's left contraction is ONE [Ap, H]x[H, nb·H] matmul and,
    after a cheap [Ap, H]-block regrouping, the right contraction is ONE
    [nb·Ap, H]x[H, Ac] matmul — no per-sample matmul tail, and 8x fewer
    value-carrying FLOPs than a pen@W formulation (only the Ap value rows
    are ever computed). This is the TPU stand-in for the reference's
    AVX512 popcount+gather loops
    (src/LibHLA_ext_avx512vpopcnt.cpp:96-210)."""
    c = pl.program_id(1)
    H = hb_ref.shape[1]
    Ac = w_ref.shape[2]
    Ap = ens_out.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (Ap, Ac), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Ap, Ac), 1)
    offdiag = jnp.where(ii == jj, 1.0, 2.0)

    # genotype-code decomposition is PER CLASSIFIER (codes are gathered to
    # each classifier's SNPs), so everything below sits in the ci loop;
    # scratch buffers are reused across the cb classifiers of this step —
    # blocking classifiers into one grid step amortizes the per-step fixed
    # cost (DMA waits, pipeline bookkeeping), which dominates at the small
    # per-classifier FLOP counts of typical models
    for ci in range(cb):
        hb = hb_ref[ci]                             # [H, L]
        w = w_ref[ci]                               # [H, Ac]
        invalid = 1.0 - valid_ref[ci]               # [H, 1]
        hb16 = hb.astype(jnp.bfloat16)
        # sample-invariant work hoisted out of the s loop (the loop is a
        # Python unroll, so these are single traced values): the invalid-
        # slot mask collapses two adds per sample into one, and the 2x on
        # the cross term bakes into the bf16 left operand ({0,2} exact) so
        # the per-sample scalar multiply disappears
        M = BIG * invalid + BIG * invalid.T         # [H, H]
        hb2 = hb + hb                               # [H, L] {0,2}

        # in-kernel geno decomposition from the int8 block: 1 byte/SNP of
        # HBM traffic instead of 9 (f32 u + f32 m1 + alpha); widened to
        # i32 in VMEM — Mosaic has no 8-bit vector compare on this target
        g = g_ref[ci].astype(jnp.int32)             # [nb, L]
        is1 = (g == 1)
        u = ((g == 0).astype(jnp.float32) - is1.astype(jnp.float32)
             - (g == 2).astype(jnp.float32))        # [nb, L]
        m1 = is1.astype(jnp.float32)
        alpha = (is1.astype(jnp.float32)
                 + 2.0 * (g == 2).astype(jnp.float32)).sum(
                     axis=1, keepdims=True)         # [nb, 1]
        # v in BOTH orientations via two cheap matmuls: a column slice of
        # v and a row slice of v2 are layout-natural, avoiding a
        # per-sample cross-lane transpose of v[:, s]; alpha pre-adds into
        # the row orientation (exact: both integer-valued)
        v = jnp.dot(hb, u.T, preferred_element_type=jnp.float32)   # [H, nb]
        v2 = jnp.dot(u, hb.T,
                     preferred_element_type=jnp.float32) + alpha   # [nb, H]

        # cross-distances (pre-doubled) for all nb samples in ONE MXU pass
        # (bf16 exact: {0,2}x{0,1} products, integer sums <= 2L in f32)
        for s in range(nb):
            hm_s[pl.ds(s * H, H), :] = (hb2 * m1[s, :][None, :]).astype(
                jnp.bfloat16)
        cross = jnp.dot(hm_s[:], hb16.T,
                        preferred_element_type=jnp.float32)   # [nb*H, H]

        for s in range(nb):
            D = (v[:, s:s + 1] + v2[s:s + 1, :]
                 + cross[s * H:(s + 1) * H, :] + M)
            dmin = jnp.min(D)
            # pen_s is symmetric, so storing the block at a column offset
            # IS the transposed layout the left contraction wants
            pen2_s[:, pl.ds(s * H, H)] = jnp.exp(
                LOG_MIN_RARE_FREQ * (D - dmin))
            dmin_out[ci, pl.ds(s, 1), :] = dmin.reshape(1, 1)

        # left contraction for ALL samples at once: [Ap, H] x [H, nb*H]
        wT = w.T[:Ap, :]                                  # [Ap, H]
        U2 = jnp.dot(wT, pen2_s[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # [Ap, nb*H]
        # regroup [Ap, nb*H] -> [nb*Ap, H] (nb tiny block copies), then
        # the right contraction is one matmul whose output rows are
        # already in the [nb, Ap, Ac] ensemble-block layout
        for s in range(nb):
            u3_s[pl.ds(s * Ap, Ap), :] = U2[:, s * H:(s + 1) * H]
        S_all = jnp.dot(u3_s[:], w, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [nb*Ap, Ac]
        # Writeback stays per-sample 2D: Mosaic SIGABRTs on an in-kernel
        # [nb*Ap, Ac] -> [nb, Ap, Ac] reshape + 3D broadcast, and the loop
        # body here is pure VPU elementwise on Ap x Ac tiles.
        for s in range(nb):
            S = S_all[s * Ap:(s + 1) * Ap, :]             # [Ap, Ac]
            # S's Ap x Ac block holds every value-carrying entry (alleles
            # map into the first A <= Ap rows / A <= Ac cols), so its sum
            # IS the full normalizer
            total = jnp.sum(S)
            if majority:
                # per-classifier best guess, one vote (reference
                # vote_method=2, src/LibHLA.cpp:2466-2476): first
                # row-major max — the same tie order as the scan engine's
                # argmax and the reference's strict-< triangular scan —
                # marked at both mirrors of the unordered pair
                Q = S * offdiag
                mx = jnp.max(Q)
                flat = ii * Ac + jj
                cand = jnp.where(Q >= mx, flat, jnp.int32(1 << 30))
                midx = jnp.min(cand)
                bi = midx // Ac
                bj = midx % Ac
                hit = (((ii == bi) & (jj == bj))
                       | ((ii == bj) & (jj == bi))).astype(jnp.float32)
                contrib = hit * jnp.where(wgt_ref[ci, s, 0] > 0, 1.0, 0.0)
            else:
                contrib = S * offdiag * (wgt_ref[ci, s, 0]
                                         / jnp.maximum(total, 1e-30))

            if ci == 0:
                @pl.when(c == 0)
                def _():
                    ens_out[s] = contrib

                @pl.when(c != 0)
                def _():
                    ens_out[s] += contrib
            else:
                ens_out[s] += contrib

            total_out[ci, pl.ds(s, 1), :] = total.reshape(1, 1)


#: largest padded haplotype count the accumulating kernel accepts: at the
#: minimum block depth (nb=8) the [H, nb*H] f32 penalty scratch is
#: 4*8*H^2 bytes — 8 MB at H=512, past the ~16 MB VMEM with the other
#: buffers beyond that. Callers route larger models to the scan engine.
ENS_KERNEL_MAX_H = 512


def ens_kernel_supported(Hp: int) -> bool:
    """Whether the accumulating ensemble kernel fits VMEM for this padded
    haplotype count (predict() falls back to the scan engine otherwise)."""
    return Hp <= ENS_KERNEL_MAX_H


def pick_nb(H: int) -> int:
    """Sample-block width: as deep as VMEM allows for the [nb*H, H] penalty
    scratch (~2 MB apiece for the three big buffers at nb*H = 4096),
    rounded down to a multiple of 8 (lane alignment)."""
    return max(NB, min(64, 4096 // max(H, 1) // 8 * 8))


@functools.partial(jax.jit, static_argnames=("a_rows", "nb", "interpret",
                                             "majority", "cb"))
def ensemble_accumulate_pallas(hap_bits, W, valid, g, wgt,
                               a_rows, nb=None, interpret=False,
                               majority=False, cb=None):
    """Weighted ensemble posterior in ONE kernel launch.

    hap_bits [C,H,L]; W [C,H,Ac]; valid [C,H,1]; g [C,N,L] int8 genotype
    codes gathered to each classifier's SNPs; wgt [C,N,1] per-classifier
    per-sample weights. a_rows: padded allele-row count (multiple of 8).

    Returns (ens [N, a_rows, Ac] = sum_c wgt*Q_c/total_c in the symmetric
    unordered convention — or the one-hot best-guess vote sum when
    `majority` — dmin [C,N], total [C,N]).
    """
    C, H, L = hap_bits.shape
    Ac = W.shape[2]
    N = g.shape[1]
    if nb is None:
        nb = pick_nb(H)
    if cb is None:
        # classifier-block: per-grid-step fixed cost dominates at typical
        # classifier sizes (measured on v5e, 100-cls model, 8192 samples:
        # 439 ms at cb=1 vs 330 ms at cb=10 incl. the dispatch round trip
        # — device time roughly halves), so fold several classifiers into
        # one grid step. Scratch is reused across them; VMEM grows only by
        # the cb input blocks.
        # ...but cap cb so the cb-scaled input blocks (hb f32, W f32,
        # valid f32, g int8, wgt f32) stay within a conservative VMEM
        # budget — large-H/L models that compile fine at cb=1 must not
        # start exhausting Mosaic VMEM just because C grew
        per_cls = 4 * (H * L + H * Ac + H + nb) + nb * L
        cap = max(1, min(16, int(6 * 1024 * 1024) // max(per_cls, 1)))
        cb = next(d for d in range(min(cap, C), 0, -1) if C % d == 0)
    # H=64 runs at half-lane MXU utilization but half the FLOPs of a
    # 128-padded layout — a net win for the (majority) small classifiers
    assert H % 64 == 0 and Ac % 128 == 0 and N % nb == 0 and C % cb == 0, \
        (H, Ac, N, nb, C, cb)

    grid = (N // nb, C // cb)
    ens, dmin, total = pl.pallas_call(
        functools.partial(_kernel_ens_acc, nb=nb, majority=majority, cb=cb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cb, H, L), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, Ac), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, 1), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, nb, L), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, nb, 1), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, a_rows, Ac), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, nb, 1), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, nb, 1), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, a_rows, Ac), jnp.float32),
            jax.ShapeDtypeStruct((C, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb * H, L), jnp.bfloat16),
            pltpu.VMEM((H, nb * H), jnp.float32),
            pltpu.VMEM((nb * a_rows, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * N * (2 * H * L + H * H * L + a_rows * H * H
                               + a_rows * H * Ac),
            bytes_accessed=(N * a_rows * Ac * 4 + C * N * L
                            + (N // nb) * C * (H * L + H * Ac) * 4),
            transcendentals=C * N * H * H,
        ),
        interpret=interpret,
    )(hap_bits, W, valid, g, wgt)
    return ens, dmin[..., 0], total[..., 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ensemble_scores_pallas(hap_bits, W, valid, alpha, u, m1,
                           interpret=False):
    """Whole-ensemble posterior scores in ONE kernel launch.

    hap_bits [C, H, L]; W [C, H, A]; valid [C, H, 1]; alpha [C, N, 1];
    u/m1 [C, N, L] (per-classifier gathered genotype coefficients).
    Grid is (C, N//NB): the classifier axis rides the grid instead of a
    host-side scan, amortizing launch overhead across the ensemble.

    Returns S [C, N, A, A], dmin [C, N], total [C, N].
    """
    C, H, L = hap_bits.shape
    A = W.shape[2]
    N = alpha.shape[1]
    assert H % 128 == 0 and A % 128 == 0 and N % NB == 0, (H, A, N)

    grid = (C, N // NB)
    S, dmin, total = pl.pallas_call(
        _kernel_ens,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, L), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, A), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 1), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, L), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, L), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NB, A, A), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 1), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 1), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, N, A, A), jnp.float32),
            jax.ShapeDtypeStruct((C, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, L), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
            pltpu.VMEM((H, A), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * N * (H * L + H * H * L + 2 * H * H * A),
            bytes_accessed=C * (N * (A * A + 2 * L) + H * L + H * A) * 4,
            transcendentals=C * N * H * H,
        ),
        interpret=interpret,
    )(hap_bits, W, valid, alpha, u, m1)
    return S, dmin[..., 0], total[..., 0]


def classifier_posteriors(hap_bits, hap_freq, hap_allele, geno_codes,
                          n_alleles, interpret=False):
    """Drop-in equivalent of ops.scoring.posterior_scores built on the
    fused kernel: handles padding to kernel layout requirements."""
    from .scoring import geno_coefficients

    H, L = hap_bits.shape
    N = geno_codes.shape[0]
    Hp = _round_up(H, 128)
    Ap = _round_up(n_alleles, 128)
    Np = _round_up(N, NB)

    hb = jnp.zeros((Hp, L), jnp.float32).at[:H].set(hap_bits.astype(jnp.float32))
    W = jnp.zeros((Hp, Ap), jnp.float32).at[:H].set(
        jax.nn.one_hot(hap_allele, Ap, dtype=jnp.float32)
        * hap_freq[:, None].astype(jnp.float32))
    valid = jnp.zeros((Hp,), jnp.float32).at[:H].set(
        (hap_freq > 0).astype(jnp.float32))
    g = jnp.full((Np, L), 3, jnp.int8).at[:N].set(geno_codes.astype(jnp.int8))
    alpha, u, m1 = geno_coefficients(g, jnp.float32)
    S, dmin, total = posterior_scores_pallas(hb, W, valid, alpha, u, m1,
                                             interpret=interpret)
    return {"S": S[:N, :n_alleles, :n_alleles], "dmin": dmin[:N],
            "total": total[:N]}
