"""Fused Pallas training-step kernels (interpret mode on CPU).

The kernels (ops/train_step_pallas.py) are the TPU fast path for the fused
trainer's EM iteration and candidate evaluation; these tests pin them to
the pure-jnp reference implementations in models/em.py at f32 tolerance
(accuracy counts exactly) and check the engine plumbing end-to-end.
"""

import numpy as np
import pytest

from tests.test_fused import _synthetic


def _rand_problem(seed=0, N=24, H=128, L=128, Cm=9, A=6):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (H, L)).astype(np.float32)
    freq = rng.random(H).astype(np.float32)
    freq[40:] = 0
    freq /= freq.sum()
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno_sel = rng.integers(0, 4, (N, L)).astype(np.int8)
    a12 = np.sort(rng.integers(0, A, (2, N)), 0).astype(np.int32)
    B = rng.multinomial(N, np.ones(N) / N).astype(np.float32)
    g_cand = rng.integers(0, 4, (Cm, N)).astype(np.int8)
    fA = (np.abs(rng.normal(0, .1, (Cm, H))) * (freq > 0)).astype(np.float32)
    fB = (np.abs(rng.normal(0, .1, (Cm, H))) * (freq > 0)).astype(np.float32)
    return bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A


def test_em_estep_kernel_matches_jnp():
    import jax.numpy as jnp
    from hibag_tpu.models.em import (_em_estep_masked, _geno_sel_masks,
                                     match_pairs)
    from hibag_tpu.ops.train_step_pallas import (
        em_estep_pallas, em_pad_candidates, em_prepare_pallas)

    # N=80 pads to S=128 = 2 chunks of em_chunk_size(128)=64, so the
    # grid's i != 0 accumulation branch is exercised, not just the i == 0
    # initialization
    bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A = \
        _rand_problem(N=80)
    Cm = fA.shape[0]
    valid = freq > 0
    mask = match_pairs(jnp.asarray(bits), jnp.asarray(valid),
                       jnp.asarray(allele), jnp.asarray(geno_sel),
                       jnp.asarray(a12[0]), jnp.asarray(a12[1]))
    m = _geno_sel_masks(jnp.asarray(g_cand), jnp.float32)
    fA, fB, Bj = jnp.asarray(fA), jnp.asarray(fB), jnp.asarray(B)

    ref = _em_estep_masked(fA, fB, mask, Bj, m, 24.0)
    maskT, m3, B2, cp = em_prepare_pallas(mask, m, Bj, Cm)
    fa_p, fb_p = em_pad_candidates(fA, fB, cp)
    dfa, dfb, dll = em_estep_pallas(fa_p, fb_p, maskT, m3, B2, 24.0,
                                    interpret=True)
    # the kernel's split matmul is bf16x2 (~17-bit mantissa): tolerances
    # cover the split residual, far inside the EM convergence reltol
    np.testing.assert_allclose(dfa[:Cm], ref[0], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(dfb[:Cm], ref[1], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(dll[:Cm, 0], ref[2], rtol=1e-4)


def test_em_estep_packed_kernel_matches_jnp():
    import jax.numpy as jnp
    from hibag_tpu.models.em import (_em_estep_masked, _geno_sel_masks,
                                     match_pairs, match_pairs_packed)
    from hibag_tpu.ops.train_step_pallas import (
        em_estep_pallas_packed, em_pad_candidates, em_prepare_packed_pallas)

    bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A = \
        _rand_problem(seed=4)
    Cm, H = fA.shape
    valid = freq > 0
    common = (jnp.asarray(bits), jnp.asarray(valid), jnp.asarray(allele),
              jnp.asarray(geno_sel), jnp.asarray(a12[0]),
              jnp.asarray(a12[1]))
    mask = match_pairs(*common)
    packed = match_pairs_packed(*common)
    m = _geno_sel_masks(jnp.asarray(g_cand), jnp.float32)
    fA, fB, Bj = jnp.asarray(fA), jnp.asarray(fB), jnp.asarray(B)

    ref = _em_estep_masked(fA, fB, mask, Bj, m, 24.0)
    packedT, m3, B2, cp = em_prepare_packed_pallas(packed, m, Bj, Cm, H)
    fa_p, fb_p = em_pad_candidates(fA, fB, cp)
    dfa, dfb, dll = em_estep_pallas_packed(fa_p, fb_p, packedT, m3, B2,
                                           24.0, interpret=True)
    np.testing.assert_allclose(dfa[:Cm], ref[0], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(dfb[:Cm], ref[1], rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(dll[:Cm, 0], ref[2], rtol=1e-4)


def test_eval_kernel_matches_jnp():
    import jax.numpy as jnp
    from hibag_tpu.models.em import evaluate_candidates
    from hibag_tpu.ops.train_step_pallas import evaluate_candidates_pallas

    rng = np.random.default_rng(1)
    bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A = \
        _rand_problem(seed=1)
    # emulate post-erase frequencies: per-candidate dropped rows
    fA = np.where(rng.random(fA.shape) < 0.3, 0, fA).astype(np.float32)
    fB = np.where(rng.random(fB.shape) < 0.3, 0, fB).astype(np.float32)
    is_oob = B == 0
    args = tuple(map(jnp.asarray, (bits, allele)))
    rest = tuple(map(jnp.asarray, (fA, fB, g_cand, geno_sel, a12[0],
                                   a12[1], is_oob, B)))
    acc_r, ll_r = evaluate_candidates(args[0], args[1], jnp.asarray(10),
                                      *rest, A)
    acc_p, ll_p = evaluate_candidates_pallas(args[0], args[1], *rest, A,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_p), np.asarray(acc_r))
    # samples whose true-pair posterior is ~0 hit the 1e-37 clamp; the two
    # formulations underflow f32 denormals at different points, so those
    # log terms can shift by O(0.1) absolute — everything else is at eps
    np.testing.assert_allclose(ll_p, ll_r, rtol=1e-4)


def test_eval_kernel_h640():
    """H=640 — the cohort freeze-resume capacity the kernel gained in
    round 5 (EVAL_MAX_H; the VMEM fit is asserted by the TPU profiler,
    this pins the math at the new geometry: 5 lane tiles, padded
    candidate slices)."""
    import jax.numpy as jnp
    from hibag_tpu.models.em import evaluate_candidates
    from hibag_tpu.ops.train_step_pallas import (eval_shapes_supported,
                                                 evaluate_candidates_pallas)

    assert eval_shapes_supported(640, 128, 14)
    assert not eval_shapes_supported(768, 128, 14)
    bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A = \
        _rand_problem(seed=7, N=16, H=640, Cm=9, A=6)
    is_oob = B == 0
    args = tuple(map(jnp.asarray, (bits, allele)))
    rest = tuple(map(jnp.asarray, (fA, fB, g_cand, geno_sel, a12[0],
                                   a12[1], is_oob, B)))
    acc_r, ll_r = evaluate_candidates(args[0], args[1], jnp.asarray(10),
                                      *rest, A)
    acc_p, ll_p = evaluate_candidates_pallas(args[0], args[1], *rest, A,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_p), np.asarray(acc_r))
    np.testing.assert_allclose(ll_p, ll_r, rtol=1e-4)


def test_resolve_engine_regions():
    """Auto engine: jnp off-TPU and at small N, pallas_eval from N>=512
    on TPU, and ALWAYS jnp when the classifier axis is mesh-sharded
    (pallas_call has no GSPMD partitioning rule — auto must not put one
    inside a partitioned segment)."""
    from hibag_tpu.models.train_fused import resolve_engine

    assert resolve_engine("auto", backend="cpu", n_samples=4096) == "jnp"
    assert resolve_engine("auto", backend="tpu", n_samples=60) == "jnp"
    assert resolve_engine("auto", backend="tpu",
                          n_samples=2048) == "pallas_eval"
    assert resolve_engine("auto", backend="tpu", n_samples=2048,
                          sharded=True) == "jnp"
    # explicit choices are honored everywhere (shard_map'd callers)
    assert resolve_engine("pallas_em", backend="tpu",
                          sharded=True) == "pallas_em"


def test_em_engine_dispatch_in_driver():
    """em_all_candidates(engine='pallas_interpret') runs the kernel tier
    and converges to the jnp result at f32 tolerance."""
    import jax.numpy as jnp
    from hibag_tpu.models.em import em_all_candidates

    bits, freq, allele, geno_sel, a12, B, g_cand, fA, fB, A = \
        _rand_problem(seed=2, Cm=5)
    valid = freq > 0
    afreq = np.full(5, 0.4, np.float32)
    common = (jnp.asarray(freq), jnp.asarray(valid), jnp.asarray(bits),
              jnp.asarray(allele), jnp.asarray(geno_sel),
              jnp.asarray(a12[0]), jnp.asarray(a12[1]), jnp.asarray(B),
              jnp.asarray(g_cand), jnp.asarray(afreq), 24.0)
    fA_r, fB_r, ll_r, it_r = em_all_candidates(*common)
    fA_p, fB_p, ll_p, it_p = em_all_candidates(
        *common, engine="pallas_interpret")
    np.testing.assert_allclose(fA_p, fA_r, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(fB_p, fB_r, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(ll_p, ll_r, rtol=1e-5)


@pytest.mark.slow
def test_fused_train_pallas_engine_end_to_end():
    """Whole fused growth under engine='pallas_interpret' (H=128 so both
    kernels engage): deterministic, and statistically equivalent to the
    jnp engine (same synthetic taggable locus, OOB accuracy preserved)."""
    from hibag_tpu.models.train_fused import train_fused_batch

    ctx = _synthetic(seed=3)
    kw = dict(K=2, seed=11, mtry=7, hcap=128, max_steps=12)
    pal = train_fused_batch(ctx, engine="pallas_interpret", **kw)
    pal2 = train_fused_batch(ctx, engine="pallas_interpret", **kw)
    jnp_ = train_fused_batch(ctx, engine="jnp", **kw)
    for a, b in zip(pal, pal2):  # determinism within the engine
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_array_equal(a.hap_freq, b.hap_freq)
    for a, b in zip(pal, jnp_):
        assert a.n_snp >= 1 and a.n_haplo >= 2
        np.testing.assert_allclose(a.hap_freq.sum(), 1.0, atol=1e-2)
        # engines may diverge at exact ties; quality must not degrade
        assert a.oob_accuracy >= b.oob_accuracy - 0.25
