"""Numerical parity checks.

The strongest available evidence without an R runtime: (1) the HIBAG model
schema roundtrips exactly; (2) f32 scoring with the min-distance shift
agrees with a float64 evaluation of the reference formulas (penalty table
semantics included) to tight tolerance; (3) best-guess calls are invariant
across engines and precisions.
"""

import subprocess
import sys

import numpy as np
import pytest


def _f64_reference(bits, freq, allele, geno, n_alleles):
    """Direct float64 NumPy evaluation of _PostProb2 semantics
    (reference src/LibHLA.cpp:1770-1830) using the penalty table."""
    from hibag_tpu.constants import penalty_table
    table = penalty_table()
    H = bits.shape[0]
    valid = freq > 0
    out_S = []
    for g in geno:
        # per-SNP distance contribution via the hamm_d truth table
        d = np.zeros((H, H))
        for k, gk in enumerate(g):
            if gk > 2:
                continue
            h = bits[:, k].astype(np.int64)
            s = h[:, None] + h[None, :]
            if gk == 0:
                d += s
            elif gk == 1:
                d += np.abs(s - 1)
            else:
                d += 2 - s
        pen = table[d.astype(np.int64)]
        W = np.zeros((H, n_alleles))
        W[np.arange(H), allele] = freq
        W[~valid] = 0
        S = W.T @ (pen * np.outer(valid, valid)) @ W
        out_S.append(S)
    return np.stack(out_S)


def test_f32_scoring_matches_f64_reference():
    import jax.numpy as jnp
    from hibag_tpu.constants import LOG_MIN_RARE_FREQ
    from hibag_tpu.ops.scoring import posterior_scores

    rng = np.random.default_rng(3)
    H, L, A, N, n_snp = 48, 128, 10, 12, 24
    bits = rng.integers(0, 2, (H, L)).astype(np.float32)
    bits[:, n_snp:] = 0
    freq = rng.random(H)
    freq[-6:] = 0
    freq[freq > 0] /= freq[freq > 0].sum()
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno = rng.integers(0, 4, (N, L)).astype(np.int8)
    geno[:, n_snp:] = 3

    ref_S = _f64_reference(bits[:, :n_snp].astype(np.int8), freq, allele,
                           geno[:, :n_snp], A)
    out = posterior_scores(jnp.asarray(bits),
                           jnp.asarray(freq.astype(np.float32)),
                           jnp.asarray(allele), jnp.asarray(geno), A)
    S = np.asarray(out["S"], dtype=np.float64)
    dmin = np.asarray(out["dmin"], dtype=np.float64)
    # undo the shift for absolute-scale comparison
    S_abs = S * np.exp(LOG_MIN_RARE_FREQ * dmin)[:, None, None]
    # normalized posteriors must agree tightly
    ref_p = ref_S / ref_S.sum((1, 2), keepdims=True)
    got_p = S / S.sum((1, 2), keepdims=True)
    np.testing.assert_allclose(got_p, ref_p, rtol=5e-4, atol=1e-9)
    # absolute scale agrees where representable
    big = ref_S > 1e-30
    np.testing.assert_allclose(S_abs[big], ref_S[big], rtol=5e-4)
    # identical best-guess calls over the unordered-pair (triangular) grid
    # with the reference's heterozygote doubling (ff = 2*freq when H1 != H2,
    # src/LibHLA.cpp _BestGuess_def) — this is the convention prediction and
    # the training OOB argmax both use
    iu, ju = np.triu_indices(A)
    dbl = (2.0 - np.eye(A))[iu, ju]
    np.testing.assert_array_equal((S[:, iu, ju] * dbl).argmax(1),
                                  (ref_S[:, iu, ju] * dbl).argmax(1))


def test_best_guess_heterozygote_doubling():
    """Hom-vs-het discrimination: two alleles with freqs {0.6, 0.4} at equal
    distances give hom (0,0) score 0.36 > undoubled het (0,1) 0.24, but the
    reference's 2*f1*f2 heterozygote weighting makes het win at 0.48.
    An undoubled argmax wrongly picks the hom pair (scores 1 instead of 2).
    Exercises the training-time OOB best-guess in evaluate_candidates."""
    import jax.numpy as jnp
    from hibag_tpu.models.em import evaluate_candidates

    H, L, A = 2, 8, 2
    bits = jnp.zeros((H, L), jnp.float32)      # all-equal distances
    allele = jnp.arange(2, dtype=jnp.int32)
    freq = np.array([0.6, 0.4])
    # one candidate whose erase output is just the base freqs (bit-0 side)
    fA = jnp.asarray(freq[None, :], jnp.float32)
    fB = jnp.zeros((1, H), jnp.float32)
    geno_sel = jnp.full((1, L), 3, jnp.int8)   # all missing: no distance
    g_cand = jnp.full((1, 1), 3, jnp.int8)     # candidate SNP missing too
    # true type is the het pair (0,1): correct best-guess scores 2
    acc, _ = evaluate_candidates(
        bits, allele, jnp.int32(0), fA, fB, g_cand, geno_sel,
        jnp.array([0], jnp.int32), jnp.array([1], jnp.int32),
        jnp.array([True]), jnp.zeros(1, jnp.float32), A)
    assert int(acc[0]) == 2


def test_model_schema_roundtrip_exact(model_list):
    from hibag_tpu.models.model import AttrBagModel
    m = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    obj = m.to_hibag_obj()
    m2 = AttrBagModel.from_hibag_obj(obj, locus="A")
    for c1, c2 in zip(m.classifiers, m2.classifiers):
        np.testing.assert_array_equal(c1.hap_bits, c2.hap_bits)
        # frequencies are exact f64 copies, no re-rounding
        assert np.array_equal(c1.hap_freq, c2.hap_freq)
        np.testing.assert_array_equal(c1.snp_index, c2.snp_index)


def test_prediction_deterministic(model_list, hapmap_geno):
    from hibag_tpu.models.model import AttrBagModel
    from hibag_tpu.models.predict import predict
    m = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    r1 = predict(m, hapmap_geno, with_prob=True)
    r2 = predict(m, hapmap_geno, with_prob=True)
    np.testing.assert_array_equal(r1.postprob, r2.postprob)
    np.testing.assert_array_equal(r1.allele1, r2.allele1)
