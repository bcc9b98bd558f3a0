"""Fused on-device trainer on a small synthetic locus."""

import numpy as np
import pytest


def _synthetic(seed=0, n=32, p=48, n_alleles=4):
    """Synthetic locus where a few SNPs tag each allele."""
    rng = np.random.default_rng(seed)
    # allele haplotype templates over p SNPs
    templates = rng.integers(0, 2, (n_alleles, p))
    a1 = rng.integers(0, n_alleles, n)
    a2 = rng.integers(0, n_alleles, n)
    a1, a2 = np.minimum(a1, a2), np.maximum(a1, a2)
    geno = templates[a1] + templates[a2]  # [n, p] 0/1/2
    # sprinkle noise + missing
    noise = rng.random((n, p)) < 0.02
    geno = np.where(noise, rng.integers(0, 3, (n, p)), geno)
    geno[rng.random((n, p)) < 0.02] = 3
    from hibag_tpu.models.train import TrainingContext
    ctx = TrainingContext(
        geno=geno.astype(np.int8), a1=a1.astype(np.int32),
        a2=a2.astype(np.int32), n_alleles=n_alleles,
        snp_id=np.array([f"rs{i}" for i in range(p)], dtype=object),
        snp_position=np.arange(p) * 1000,
        snp_allele=np.array(["A/G"] * p, dtype=object),
        sample_id=np.array([f"s{i}" for i in range(n)], dtype=object))
    return ctx


def test_decide_matches_sequential_scan():
    """The closed-form _decide reduction is equivalent to the reference's
    sequential running-max scan (src/LibHLA.cpp:2018-2069) on randomized
    cases dense with exact acc/loss ties, for both prune modes and both
    fresh (gmin=1e30) and mid-training carries."""
    import jax.numpy as jnp
    from hibag_tpu.constants import PRUNE_RELTOL_LOGLIK
    from hibag_tpu.models.train_fused import _decide

    def scan_ref(cand_ok, acc_c, loss_c, gmax_acc, gmin_loss, prune):
        max_acc, min_loss, min_i = gmax_acc, gmin_loss, -1
        kills = []
        for i in range(len(acc_c)):
            ok = bool(cand_ok[i])
            acc = int(acc_c[i])
            loss = float(loss_c[i]) if acc >= max_acc else 0.0
            upd1 = ok and acc > max_acc
            upd2 = ok and not upd1 and acc == max_acc and loss < min_loss
            if upd1 or upd2:
                min_i, min_loss = i, loss
            if upd1:
                max_acc = acc
            kills.append(prune and ok and (
                acc < gmax_acc
                or (acc == gmax_acc
                    and loss > gmin_loss * (1 + PRUNE_RELTOL_LOGLIK)
                    and min_i != i)))
        return min_i, max_acc, min_loss, kills

    rng = np.random.default_rng(0)
    for case in range(300):
        m = int(rng.integers(1, 24))
        # few distinct levels -> many exact ties
        acc = rng.integers(0, 4, m).astype(np.int32)
        loss = rng.choice([0.5, 1.0, 1.5, 2.0], m).astype(np.float32)
        ok = rng.random(m) > 0.25
        gmax = int(rng.integers(0, 4))
        gmin = float(rng.choice([1e30, 2.0, 1.0, 0.5]))
        prune = bool(rng.random() > 0.5)
        want = scan_ref(ok, acc, loss, gmax, gmin, prune)
        got = _decide(jnp.asarray(ok), jnp.asarray(acc), jnp.asarray(loss),
                      jnp.int32(gmax), jnp.float32(gmin), prune)
        assert int(got[0]) == want[0], (case, want, got)
        assert int(got[1]) == want[1], (case, want, got)
        assert float(got[2]) == pytest.approx(want[2]), (case, want, got)
        assert [bool(x) for x in np.asarray(got[3])] == want[3], case


def test_fused_grow_smoke():
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic()
    cls = train_fused_batch(ctx, K=2, seed=7, mtry=7, hcap=32, max_steps=40)
    assert len(cls) == 2
    for c in cls:
        assert 1 <= c.n_snp <= 40
        assert c.n_haplo >= 2
        np.testing.assert_allclose(c.hap_freq.sum(), 1.0, atol=1e-2)
        assert np.all(np.diff(c.hap_allele) >= 0)
        assert c.oob_accuracy > 0.5  # alleles are SNP-taggable by design
        assert len(set(c.snp_index.tolist())) == c.n_snp  # no repeats


def test_fused_predictable_accuracy():
    from hibag_tpu.models.train import _partial_model
    from hibag_tpu.models.train_fused import train_fused_batch
    from hibag_tpu.models.predict import predict
    from hibag_tpu.data.geno import SNPGenoData
    from hibag_tpu.models.predict import _pair_match

    ctx = _synthetic(seed=3)
    cls = train_fused_batch(ctx, K=4, seed=11, mtry=7, hcap=32, max_steps=40)
    alleles = [f"{i:02d}:01" for i in range(ctx.n_alleles)]

    class HlaStub:
        locus = "any"
        assembly = "hg19"

    model = _partial_model(ctx, alleles, HlaStub(), HlaStub(), cls)
    model.assembly = "hg19"
    codes = ctx.geno  # [N, P] already aligned
    res = predict(model, codes.astype(np.uint8))
    hits = [
        _pair_match(r1, r2, alleles[t1], alleles[t2]) / 2
        for r1, r2, t1, t2 in zip(res.allele1, res.allele2, ctx.a1, ctx.a2)]
    assert np.mean(hits) > 0.85


@pytest.mark.slow
def test_fused_real_data_accuracy(hla_types, hapmap_geno):
    """mode="fused" on real CEU HLA-A: held-out accuracy must clear the
    reference CI floor (tests/runTests.R) and no hcap overflow may occur."""
    import warnings
    import hibag_tpu as ht
    from hibag_tpu.data.allele import HLATypeTable, flanking_snps

    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"], locus="A")
    ids = flanking_snps(hapmap_geno.snp_id, hapmap_geno.snp_position, "A",
                        500_000, "hg19")
    fg = hapmap_geno.subset(
        snp_mask=np.isin(hapmap_geno.snp_id.astype(str), ids.astype(str)))
    tr, va = ht.split_alleles(t, 0.5, np.random.default_rng(100))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        model = ht.train_parallel(tr, fg.subset_by_samples(tr.sample_id),
                                  n_classifiers=10, seed=100, verbose=False,
                                  with_matching=False, mode="fused",
                                  hcap=128, max_steps=64)
    overflow_warns = [w for w in caught if "hcap" in str(w.message)]
    assert not overflow_warns, [str(w.message) for w in overflow_warns]
    res = ht.predict(model, fg.subset_by_samples(va.sample_id))
    cmp = ht.compare_alleles(va, res)
    assert cmp.overall["acc.haplo"] >= 0.9


def test_fused_segmented_matches_single_dispatch():
    """Chaining bounded segments must reproduce the single-dispatch growth
    exactly (same PRNG stream, same decisions)."""
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic(seed=5)
    one = train_fused_batch(ctx, K=3, seed=13, mtry=7, hcap=32, max_steps=40)
    seg = train_fused_batch(ctx, K=3, seed=13, mtry=7, hcap=32, max_steps=40,
                            seg_steps=4)
    for a, b in zip(one, seg):
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_allclose(a.hap_freq, b.hap_freq, rtol=1e-6)
        assert a.oob_accuracy == b.oob_accuracy


def test_fused_overflow_retry_matches_big_hcap():
    """on_overflow='retry' retrains overflowed classifiers at doubled hcap
    with identical RNG streams — the result must equal training directly at
    the larger capacity, with no overflow warning."""
    import warnings
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic(seed=9, n=48, p=64, n_alleles=6)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6, max_steps=30)
    assert [w for w in caught if "hcap" in str(w.message)], \
        "fixture must actually overflow hcap=6 for this test to bite"
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        small = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6,
                                  max_steps=30, on_overflow="retry")
    assert not [w for w in caught if "hcap" in str(w.message)]
    big = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=48, max_steps=30)
    for a, b in zip(small, big):
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_allclose(a.hap_freq, b.hap_freq, rtol=1e-6)


def test_fused_overflow_freeze_matches_retry():
    """on_overflow='freeze' stops overflowed classifiers at their first
    dropped haplotype (PRNG key un-advanced), re-seats them on device at
    doubled hcap and resumes — it must be BITWISE identical to
    on_overflow='retry' (from-scratch retraining at doubled hcap, itself
    validated against direct big-hcap training above), with no warning."""
    import warnings
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic(seed=9, n=48, p=64, n_alleles=6)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        frz = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6,
                                max_steps=30, on_overflow="freeze")
    assert not [w for w in caught if "hcap" in str(w.message)]
    retry = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6,
                              max_steps=30, on_overflow="retry")
    for a, b in zip(frz, retry):
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_array_equal(a.hap_freq, b.hap_freq)
        np.testing.assert_array_equal(a.hap_allele, b.hap_allele)
        np.testing.assert_array_equal(a.hap_bits, b.hap_bits)
        assert a.oob_accuracy == b.oob_accuracy
        assert a.n_haplo > 6  # the resume actually grew past the old cap


def test_fused_freeze_chunked_resume_matches_unchunked():
    """freeze_max_batch=1 resumes the frozen classifiers one dispatch at a
    time (the extreme-(N,hcap) configuration where a full-width resume
    exceeds the dispatch ceiling) — results must be bitwise identical to
    the unchunked freeze path."""
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic(seed=9, n=48, p=64, n_alleles=6)
    whole = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6,
                              max_steps=30, on_overflow="freeze")
    chunked = train_fused_batch(ctx, K=3, seed=21, mtry=8, hcap=6,
                                max_steps=30, on_overflow="freeze",
                                freeze_max_batch=1)
    for a, b in zip(whole, chunked):
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_array_equal(a.hap_freq, b.hap_freq)
        assert a.oob_accuracy == b.oob_accuracy


def test_fused_freeze_noop_without_overflow():
    """With ample hcap the freeze path must be a bitwise no-op relative to
    the plain single-run path (the per-classifier step budget and freeze
    gating cannot perturb a non-overflowing trajectory)."""
    from hibag_tpu.models.train_fused import train_fused_batch
    ctx = _synthetic(seed=5)
    plain = train_fused_batch(ctx, K=3, seed=13, mtry=7, hcap=32,
                              max_steps=40)
    frz = train_fused_batch(ctx, K=3, seed=13, mtry=7, hcap=32,
                            max_steps=40, on_overflow="freeze")
    for a, b in zip(plain, frz):
        np.testing.assert_array_equal(a.snp_index, b.snp_index)
        np.testing.assert_array_equal(a.hap_freq, b.hap_freq)
        assert a.oob_accuracy == b.oob_accuracy
