"""Training-path tests, modeled on the reference's own CI strategy
(tests/runTests.R): train a small ensemble on a split of the bundled CEU
data and assert per-locus accuracy floors on the held-out half."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hla_A(hla_types):
    from hibag_tpu.data.allele import HLATypeTable
    return HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"],
        locus="A", assembly="hg19")


@pytest.fixture(scope="module")
def flank_geno(hapmap_geno):
    from hibag_tpu.data.allele import flanking_snps
    ids = flanking_snps(hapmap_geno.snp_id, hapmap_geno.snp_position,
                        "A", flank_bp=500_000, assembly="hg19")
    sel = np.isin(hapmap_geno.snp_id.astype(str), ids.astype(str))
    return hapmap_geno.subset(snp_mask=sel)


def test_rng_matches_r():
    from hibag_tpu.utils.rng import RRng
    r = RRng(42)
    np.testing.assert_allclose(
        r.unif_rand(5),
        [0.9148060435, 0.9370754133, 0.2861395348, 0.8304476261, 0.6417455189],
        atol=1e-9)
    r = RRng(100)
    np.testing.assert_allclose(
        r.unif_rand(3), [0.30776611, 0.25767250, 0.55232243], atol=1e-7)


def test_rng_long_stream():
    """RRng matches a scalar in-place MT19937 (R's generator) far past one
    twist block. Regression: a vectorized twist over the OLD state diverges
    at draw 227 of every block (in-place MT reads already-updated words for
    indices >= N-M and the final word pairs with the updated n[0])."""
    from hibag_tpu.utils.rng import RRng
    N, M = 624, 397
    UPPER, LOWER, MATRIX = 0x80000000, 0x7FFFFFFF, 0x9908B0DF

    def scalar_stream(seed, n):
        s = seed & 0xFFFFFFFF
        for _ in range(50):
            s = (69069 * s + 1) & 0xFFFFFFFF
        mt = []
        for j in range(N + 1):
            s = (69069 * s + 1) & 0xFFFFFFFF
            mt.append(s)
        mt = mt[1:]
        mti, out = N, []
        for _ in range(n):
            if mti >= N:
                for kk in range(N - M):
                    y = (mt[kk] & UPPER) | (mt[kk + 1] & LOWER)
                    mt[kk] = mt[kk + M] ^ (y >> 1) ^ (MATRIX if y & 1 else 0)
                for kk in range(N - M, N - 1):
                    y = (mt[kk] & UPPER) | (mt[kk + 1] & LOWER)
                    mt[kk] = mt[kk + M - N] ^ (y >> 1) ^ (MATRIX if y & 1 else 0)
                y = (mt[N - 1] & UPPER) | (mt[0] & LOWER)
                mt[N - 1] = mt[M - 1] ^ (y >> 1) ^ (MATRIX if y & 1 else 0)
                mti = 0
            y = mt[mti]
            mti += 1
            y ^= y >> 11
            y ^= (y << 7) & 0x9D2C5680
            y ^= (y << 15) & 0xEFC60000
            y &= 0xFFFFFFFF
            y ^= y >> 18
            out.append(y)
        return out

    for seed in (1, 100):
        got = RRng(seed).genrand_uint32(2000)
        want = scalar_stream(seed, 2000)
        assert [int(x) for x in got] == want


def test_bootstrap_counts():
    from hibag_tpu.utils.rng import RRng
    r = RRng(7)
    B = r.bootstrap_counts(50)
    assert B.sum() == 50
    assert (B == 0).any()


def test_grow_single_classifier(hla_A, flank_geno):
    from hibag_tpu.models.train import (grow_classifier,
                                        make_training_context)
    from hibag_tpu.utils.rng import RRng
    ctx, alleles, _ = make_training_context(hla_A, flank_geno)
    assert ctx.n_samp == 60
    rng = RRng(100)
    B = rng.bootstrap_counts(ctx.n_samp)
    c = grow_classifier(ctx, B, rng, mtry=int(np.ceil(np.sqrt(ctx.n_snp))))
    assert 1 <= c.n_snp <= 128
    assert c.n_haplo >= ctx.n_alleles / 2
    np.testing.assert_allclose(c.hap_freq.sum(), 1.0, atol=1e-3)
    assert 0 <= c.oob_accuracy <= 1
    # haplotypes stay allele-grouped
    assert np.all(np.diff(c.hap_allele) >= 0)


def test_train_small_ensemble_accuracy(hla_A, flank_geno):
    """Reference CI floor: HLA-A accuracy >= 0.9 with 10 classifiers on a
    50/50 split (tests/runTests.R:13-16,59-65)."""
    from hibag_tpu.data.allele import split_alleles
    from hibag_tpu.models.predict import predict
    from hibag_tpu.models.train import train

    rng = np.random.default_rng(100)
    tr, va = split_alleles(hla_A, 0.5, rng)
    tr_geno = flank_geno.subset_by_samples(tr.sample_id)
    va_geno = flank_geno.subset_by_samples(va.sample_id)

    model = train(tr, tr_geno, n_classifiers=10, seed=100, verbose=False)
    assert model.n_classifiers == 10
    res = predict(model, va_geno)
    truth = {s: (a1, a2) for s, a1, a2 in
             zip(va.sample_id, va.allele1, va.allele2)}
    t1 = [truth[s][0] for s in res.sample_id]
    t2 = [truth[s][1] for s in res.sample_id]
    acc = res.accuracy_vs(t1, t2)
    assert acc >= 0.9, f"HLA-A held-out accuracy {acc} below reference floor"

    # model roundtrips through the HIBAG schema
    from hibag_tpu.models.model import AttrBagModel
    m2 = AttrBagModel.from_hibag_obj(model.to_hibag_obj(), locus="A")
    res2 = predict(m2, va_geno)
    assert np.array_equal(res.allele1, res2.allele1)


def test_serial_train_deterministic(hla_A, flank_geno):
    """Same seed → byte-identical model through the exact R-RNG stream."""
    from hibag_tpu.models.train import train
    m1 = train(hla_A, flank_geno, n_classifiers=2, seed=42, verbose=False,
               with_matching=False)
    m2 = train(hla_A, flank_geno, n_classifiers=2, seed=42, verbose=False,
               with_matching=False)
    for c1, c2 in zip(m1.classifiers, m2.classifiers):
        np.testing.assert_array_equal(c1.snp_index, c2.snp_index)
        np.testing.assert_array_equal(c1.bootstrap_count, c2.bootstrap_count)
        np.testing.assert_array_equal(c1.hap_bits, c2.hap_bits)
        np.testing.assert_allclose(c1.hap_freq, c2.hap_freq, rtol=1e-6)


def test_assoc_dispatch(hla_types):
    import hibag_tpu as ht
    t = ht.hlaAllele(hla_types["sample.id"], hla_types["A.1"],
                     hla_types["A.2"], locus="A")
    y = np.arange(t.n_samp) % 2
    r = ht.hlaAssocTest(t, y, model="dominant")
    assert "table" in r
    aa = ht.convert_table(t, "/root/reference/inst/extdata/v3.22.0",
                          code="P.code.merge")
    rows = ht.hlaAssocTest(aa, y)
    assert isinstance(rows, list)


def test_sampling_without_replace_bookkeeping():
    """CSamplingWithoutReplace semantics: tail selection, Remove/
    RemoveSelection/RemoveFlag (src/LibHLA.cpp:930-993)."""
    from hibag_tpu.models.train import SamplingWithoutReplace
    from hibag_tpu.utils.rng import RRng

    s = SamplingWithoutReplace(10)
    rng = RRng(1)
    s.random_select(4, rng)
    sel = s.selection()
    assert len(sel) == 4 and len(set(sel)) == 4
    assert s.total() == 10
    # selection occupies the tail of the pool
    assert s.idx[-4:] == sel

    # Remove(i) deletes the i-th selected element from the pool
    victim = sel[1]
    s.remove(1)
    assert s.total() == 9 and victim not in s.idx

    # RemoveSelection drops the whole current tail
    s2 = SamplingWithoutReplace(10)
    s2.random_select(3, RRng(2))
    tail = list(s2.selection())
    s2.remove_selection()
    assert s2.total() == 7
    assert not (set(tail) & set(s2.idx))

    # RemoveFlag drops only the -1-marked selected entries
    s3 = SamplingWithoutReplace(10)
    s3.random_select(5, RRng(3))
    s3.set_selected(0, -1)
    s3.set_selected(3, -1)
    s3.remove_flagged()
    assert s3.total() == 8 and -1 not in s3.idx

    # when m_try exceeds the pool, everything is selected with NO rng draws
    s4 = SamplingWithoutReplace(3)
    r4 = RRng(5)
    state_before = r4.mt.copy()
    s4.random_select(5, r4)
    assert sorted(s4.selection()) == [0, 1, 2]
    assert np.array_equal(r4.mt, state_before)  # stream untouched
