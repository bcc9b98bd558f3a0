import numpy as np
import pytest

from hibag_tpu.data.allele import HLATypeTable
from hibag_tpu.models.model import AttrBagModel
from hibag_tpu.models.predict import predict
from hibag_tpu.models.publish import (model_files, out_of_bag, pred_merge,
                                      publish)


@pytest.fixture(scope="module")
def model(model_list):
    return AttrBagModel.from_hibag_obj(model_list["A"], locus="A")


def test_publish_drops_unused_snps(model, hapmap_geno):
    pub = publish(model, platform="HapMap", anonymize=True)
    assert pub.n_snp <= model.n_snp
    assert pub.sample_id is None
    assert all(c.bootstrap_count is None for c in pub.classifiers)
    assert pub.appendix["platform"] == "HapMap"
    # reindexed model predicts identically
    r1 = predict(model, hapmap_geno)
    r2 = predict(pub, hapmap_geno)
    np.testing.assert_array_equal(r1.allele1, r2.allele1)
    np.testing.assert_array_equal(r1.allele2, r2.allele2)
    np.testing.assert_allclose(r1.prob, r2.prob, rtol=1e-5)


def test_model_files_combine(model, tmp_path):
    a = model.subset_classifiers(3)
    b = AttrBagModel(**{**model.__dict__})
    b.classifiers = model.classifiers[3:6]
    a.save(str(tmp_path / "m1.npz"))
    b.save(str(tmp_path / "m2.npz"))
    m = model_files([str(tmp_path / "m*.npz")])
    assert m.n_classifiers == 6


def test_pred_merge_identity(model, hapmap_geno):
    """Merging a prediction with itself must reproduce it."""
    r = predict(model, hapmap_geno, with_prob=True)
    m = pred_merge([r, r], ret_postprob=True)
    np.testing.assert_array_equal(m.allele1, r.allele1)
    np.testing.assert_array_equal(m.allele2, r.allele2)
    np.testing.assert_allclose(m.prob, r.prob, rtol=1e-6)
    np.testing.assert_allclose(m.dosage.sum(0), 2.0, atol=1e-6)


def test_pred_merge_disjoint_weight(model, hapmap_geno):
    r = predict(model, hapmap_geno, with_prob=True)
    # zero weight on second copy changes nothing
    m = pred_merge([r, r], weight=[1.0, 0.0])
    np.testing.assert_array_equal(m.allele1, r.allele1)


def test_out_of_bag(model, hapmap_geno, hla_types):
    truth = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"],
        locus="A")
    sub = AttrBagModel(**{**model.__dict__})
    sub.classifiers = model.classifiers[:5]
    res = out_of_bag(sub, truth, hapmap_geno)
    assert 0.5 <= res["overall"]["acc.haplo"] <= 1.0
    assert res["confusion"].shape[1] == model.n_alleles


def test_out_of_bag_bundled_fixture(hapmap_geno, hla_types):
    """The bundled OutOfBag.RData model (with bootstrap counts) evaluates
    through the OOB pipeline."""
    from hibag_tpu.data.allele import HLATypeTable
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    d = r_to_py(read_rdata("/root/reference/inst/extdata/OutOfBag.RData")["mobj"])
    m = AttrBagModel.from_hibag_obj(d)
    assert m.n_classifiers >= 10
    assert all(c.bootstrap_count is not None for c in m.classifiers)
    locus = m.locus
    truth = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types[f"{locus}.1"],
        hla_types[f"{locus}.2"], locus=locus)
    sub = AttrBagModel(**{**m.__dict__})
    sub.classifiers = m.classifiers[:5]
    res = out_of_bag(sub, truth, hapmap_geno)
    assert 0.3 <= res["overall"]["acc.haplo"] <= 1.0


def test_pred_merge_different_allele_sets(model, hapmap_geno):
    """Merging predictions from models with different allele universes maps
    probabilities into the union space (hlaPredMerge's core case)."""
    # model B: strip the last two alleles' haplotypes from each classifier
    # (as if trained on a cohort lacking them) — a smaller allele universe
    from hibag_tpu.models.model import Classifier
    keep_alleles = model.hla_alleles[:-2]
    A2 = len(keep_alleles)
    small_cls = []
    for c in model.classifiers[:10]:
        keep = c.hap_allele < A2
        f = c.hap_freq[keep]
        small_cls.append(Classifier(
            snp_index=c.snp_index, hap_bits=c.hap_bits[keep],
            hap_freq=f / f.sum(), hap_allele=c.hap_allele[keep],
            oob_accuracy=c.oob_accuracy))
    small = AttrBagModel(**{**model.__dict__})
    small.classifiers = small_cls
    small.hla_alleles = list(keep_alleles)
    small.hla_freq = None

    r_full = predict(model, hapmap_geno, with_prob=True)
    r_small = predict(small, hapmap_geno, with_prob=True)
    assert len(r_small.hla_alleles) < len(r_full.hla_alleles)

    m = pred_merge([r_full, r_small], weight=[0.7, 0.3], ret_postprob=True)
    assert len(m.hla_alleles) == len(r_full.hla_alleles)  # union = full set
    np.testing.assert_allclose(m.postprob.sum(0), 1.0, atol=1e-6)
    # dominant-weight predictions mostly follow the full model
    same = np.mean([a == b for a, b in zip(m.allele1, r_full.allele1)])
    assert same > 0.8


def test_pred_merge_resolution_truncation(model, hapmap_geno):
    r = predict(model, hapmap_geno, with_prob=True)
    m = pred_merge([r], max_resolution="2-digit", ret_postprob=True)
    assert all(":" not in a for a in m.hla_alleles)
    np.testing.assert_allclose(m.postprob.sum(0), 1.0, atol=1e-6)
