"""Sample-chunked EM/eval paths: padding samples with zero weight must not
change results, and the multi-chunk scan must equal the single-chunk path."""

import jax.numpy as jnp
import numpy as np
import pytest

from hibag_tpu.constants import GENO_MISSING
from hibag_tpu.models.em import (em_all_candidates, evaluate_candidates,
                                 match_pairs)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    S, H, L, C, A, ns = 60, 40, 128, 6, 8, 12
    bits = np.zeros((H, L), np.float32)
    bits[:, :ns] = rng.integers(0, 2, (H, ns))
    freq = rng.random(H).astype(np.float32)
    freq[-5:] = 0
    freq[freq > 0] /= freq[freq > 0].sum()
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno = np.full((S, L), GENO_MISSING, np.int8)
    geno[:, :ns] = rng.integers(0, 3, (S, ns))
    a1 = rng.integers(0, A, S).astype(np.int32)
    a2 = rng.integers(0, A, S).astype(np.int32)
    a1, a2 = np.minimum(a1, a2), np.maximum(a1, a2)
    # force allele coverage so every sample has matching blocks
    a1[:A] = np.arange(A); a2[:A] = np.arange(A)
    B = rng.multinomial(S, np.ones(S) / S).astype(np.float32)
    g_cand = rng.integers(0, 3, (C, S)).astype(np.int8)
    afreq = rng.uniform(0.2, 0.8, C).astype(np.float32)
    return bits, freq, allele, geno, a1, a2, B, g_cand, afreq


def test_em_segmented_matches_monolithic(problem):
    """Host-chained EM segments (2 iterations per dispatch) are BITWISE
    identical to the single-dispatch while_loop — the state trajectory is
    the same, only dispatch boundaries differ."""
    from hibag_tpu.models.em import em_all_candidates_segmented
    bits, freq, allele, geno, a1, a2, B, g_cand, afreq = problem
    args = (jnp.asarray(freq), jnp.asarray(freq > 0), jnp.asarray(bits),
            jnp.asarray(allele), jnp.asarray(geno), jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(B), jnp.asarray(g_cand),
            jnp.asarray(afreq), float(len(B)))
    fA, fB, ll, it = em_all_candidates(*args)
    sA, sB, sll, sit = em_all_candidates_segmented(*args, iter_seg=2)
    assert int(it) > 4, "fixture must need several segments"
    np.testing.assert_array_equal(np.asarray(fA), np.asarray(sA))
    np.testing.assert_array_equal(np.asarray(fB), np.asarray(sB))
    np.testing.assert_array_equal(np.asarray(ll), np.asarray(sll))
    assert int(it) == int(sit)


def test_grow_classifier_em_seg_identical(problem):
    """grow_classifier(em_iter_seg=...) produces the identical classifier."""
    from hibag_tpu.models.train import TrainingContext, grow_classifier
    from hibag_tpu.utils.rng import RRng
    rng = np.random.default_rng(3)
    n, p, A = 48, 64, 5
    templates = rng.integers(0, 2, (A, p))
    x1 = rng.integers(0, A, n)
    x2 = rng.integers(0, A, n)
    x1, x2 = np.minimum(x1, x2), np.maximum(x1, x2)
    geno = (templates[x1] + templates[x2]).astype(np.int8)
    ctx = TrainingContext(
        geno=geno, a1=x1.astype(np.int32), a2=x2.astype(np.int32),
        n_alleles=A,
        snp_id=np.array([f"rs{i}" for i in range(p)], dtype=object),
        snp_position=np.arange(p) * 1000,
        snp_allele=np.array(["A/G"] * p, dtype=object),
        sample_id=np.array([f"s{i}" for i in range(n)], dtype=object))
    B = RRng(7).bootstrap_counts(n)
    c1 = grow_classifier(ctx, B, RRng(9), mtry=8)
    c2 = grow_classifier(ctx, B, RRng(9), mtry=8, em_iter_seg=3)
    np.testing.assert_array_equal(c1.snp_index, c2.snp_index)
    np.testing.assert_array_equal(c1.hap_freq, c2.hap_freq)
    np.testing.assert_array_equal(c1.hap_bits, c2.hap_bits)
    assert c1.oob_accuracy == c2.oob_accuracy


def _pad(x, n, fill=0):
    pad = [(0, n - x.shape[-1] if x.ndim == 1 else 0)]
    if x.ndim == 1:
        return np.concatenate([x, np.full(n - len(x), fill, x.dtype)])
    return np.concatenate(
        [x, np.full((x.shape[0], n - x.shape[1]), fill, x.dtype)], axis=1)


def test_padded_samples_do_not_change_em(problem):
    bits, freq, allele, geno, a1, a2, B, g_cand, afreq = problem
    S = geno.shape[0]
    Sp = 512  # multi-chunk territory (chunk=256 → 2 chunks)
    fA, fB, ll, _ = em_all_candidates(
        jnp.asarray(freq), jnp.asarray(freq > 0), jnp.asarray(bits),
        jnp.asarray(allele), jnp.asarray(geno), jnp.asarray(a1),
        jnp.asarray(a2), jnp.asarray(B),
        jnp.asarray(g_cand), jnp.asarray(afreq), float(S))

    geno_p = np.full((Sp, geno.shape[1]), GENO_MISSING, np.int8)
    geno_p[:S] = geno
    a1_p = _pad(a1, Sp); a2_p = _pad(a2, Sp)
    B_p = _pad(B, Sp)                       # zero bootstrap weight
    g_cand_p = _pad(g_cand, Sp, fill=3)
    mask = match_pairs(jnp.asarray(bits), jnp.asarray(freq > 0),
                       jnp.asarray(allele), jnp.asarray(geno),
                       jnp.asarray(a1), jnp.asarray(a2))
    mask_p = match_pairs(jnp.asarray(bits), jnp.asarray(freq > 0),
                         jnp.asarray(allele), jnp.asarray(geno_p),
                         jnp.asarray(a1_p), jnp.asarray(a2_p))
    np.testing.assert_array_equal(np.asarray(mask_p[:S]), np.asarray(mask))
    fA2, fB2, ll2, _ = em_all_candidates(
        jnp.asarray(freq), jnp.asarray(freq > 0), jnp.asarray(bits),
        jnp.asarray(allele), jnp.asarray(geno_p), jnp.asarray(a1_p),
        jnp.asarray(a2_p), jnp.asarray(B_p),
        jnp.asarray(g_cand_p), jnp.asarray(afreq), float(S))
    np.testing.assert_allclose(np.asarray(fA2), np.asarray(fA), rtol=2e-5,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ll2), np.asarray(ll), rtol=2e-5)


def test_padded_samples_do_not_change_eval(problem):
    bits, freq, allele, geno, a1, a2, B, g_cand, afreq = problem
    S = geno.shape[0]
    Sp = 512
    fA, fB, _, _ = em_all_candidates(
        jnp.asarray(freq), jnp.asarray(freq > 0), jnp.asarray(bits),
        jnp.asarray(allele), jnp.asarray(geno), jnp.asarray(a1),
        jnp.asarray(a2), jnp.asarray(B),
        jnp.asarray(g_cand), jnp.asarray(afreq), float(S))
    acc1, ll1 = evaluate_candidates(
        jnp.asarray(bits), jnp.asarray(allele), jnp.asarray(12), fA, fB,
        jnp.asarray(g_cand), jnp.asarray(geno), jnp.asarray(a1),
        jnp.asarray(a2), jnp.asarray(B == 0), jnp.asarray(B), 8)

    geno_p = np.full((Sp, geno.shape[1]), GENO_MISSING, np.int8)
    geno_p[:S] = geno
    acc2, ll2 = evaluate_candidates(
        jnp.asarray(bits), jnp.asarray(allele), jnp.asarray(12), fA, fB,
        jnp.asarray(_pad(g_cand, Sp, fill=3)), jnp.asarray(geno_p),
        jnp.asarray(_pad(a1, Sp)), jnp.asarray(_pad(a2, Sp)),
        jnp.asarray(np.concatenate([B == 0, np.zeros(Sp - S, bool)])),
        jnp.asarray(_pad(B, Sp)), 8)
    np.testing.assert_array_equal(np.asarray(acc2), np.asarray(acc1))
    np.testing.assert_allclose(np.asarray(ll2), np.asarray(ll1), rtol=2e-5)


def test_packed_mask_roundtrip(problem):
    from hibag_tpu.models.em import (_pack_mask, _unpack_mask,
                                     match_pairs_packed)
    bits, freq, allele, geno, a1, a2, B, g_cand, afreq = problem
    valid = jnp.asarray(freq > 0)
    m = match_pairs(jnp.asarray(bits), valid, jnp.asarray(allele),
                    jnp.asarray(geno), jnp.asarray(a1), jnp.asarray(a2))
    rt = _unpack_mask(_pack_mask(m), jnp.bool_)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(rt))
    pk = match_pairs_packed(jnp.asarray(bits), valid, jnp.asarray(allele),
                            jnp.asarray(geno), jnp.asarray(a1),
                            jnp.asarray(a2))
    np.testing.assert_array_equal(np.asarray(_pack_mask(m)), np.asarray(pk))


def test_packed_estep_matches_masked(problem):
    from hibag_tpu.models.em import (_em_estep_masked, _em_estep_packed,
                                     _geno_sel_masks, _pack_mask)
    bits, freq, allele, geno, a1, a2, B, g_cand, afreq = problem
    valid = jnp.asarray(freq > 0)
    mask = match_pairs(jnp.asarray(bits), valid, jnp.asarray(allele),
                       jnp.asarray(geno), jnp.asarray(a1), jnp.asarray(a2))
    C, H = g_cand.shape[0], bits.shape[0]
    rng = np.random.default_rng(7)
    fA = rng.random((C, H)).astype(np.float32) * (freq > 0)
    fB = rng.random((C, H)).astype(np.float32) * (freq > 0)
    m = _geno_sel_masks(jnp.asarray(g_cand), jnp.float32)
    a = _em_estep_masked(jnp.asarray(fA), jnp.asarray(fB), mask,
                         jnp.asarray(B), m, float(len(B)))
    b = _em_estep_packed(jnp.asarray(fA), jnp.asarray(fB), _pack_mask(mask),
                         jnp.asarray(B), m, float(len(B)))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-6, atol=1e-7)
