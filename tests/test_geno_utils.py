import numpy as np
import pytest

from hibag_tpu.data.geno import SNPGenoData, combine_geno, switch_strand
from hibag_tpu.eval.report import report


def test_switch_strand_identity(hapmap_geno):
    out = switch_strand(hapmap_geno, hapmap_geno)
    assert out.n_snp == hapmap_geno.n_snp
    np.testing.assert_array_equal(out.genotype, hapmap_geno.genotype)


def test_switch_strand_flipped(hapmap_geno):
    sub = hapmap_geno.subset(snp_mask=np.arange(100))
    flipped = sub.subset()
    # swap allele order: A/B -> B/A, genotypes 2-g
    flipped.snp_allele = np.array(
        ["/".join(reversed(str(a).split("/"))) for a in sub.snp_allele],
        dtype=object)
    flipped.genotype = np.where(sub.genotype <= 2, 2 - sub.genotype,
                                3).astype(np.uint8)
    out = switch_strand(flipped, sub)
    np.testing.assert_array_equal(out.genotype, sub.genotype)
    np.testing.assert_array_equal(out.snp_allele, sub.snp_allele)


def test_combine_geno(hapmap_geno):
    a = hapmap_geno.subset(samp_mask=np.arange(30))
    b = hapmap_geno.subset(samp_mask=np.arange(30, 60))
    c = combine_geno(a, b)
    assert c.n_samp == 60
    assert c.n_snp == hapmap_geno.n_snp
    np.testing.assert_array_equal(
        np.sort(c.sample_id), np.sort(hapmap_geno.sample_id))
    # genotypes preserved for both halves
    pos = {s: i for i, s in enumerate(c.sample_id)}
    j = pos[b.sample_id[0]]
    np.testing.assert_array_equal(c.genotype[:, j], b.genotype[:, 0])


def test_report_formats(hla_types):
    from hibag_tpu.data.allele import HLATypeTable
    from hibag_tpu.eval.compare import compare_alleles
    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"], locus="A")
    r = compare_alleles(t, t)
    txt = report(r, "txt")
    assert "Overall accuracy: 100.0%" in txt
    md = report(r, "markdown")
    assert md.count("|") > 20
    tex = report(r, "tex")
    assert "\\begin{tabular}" in tex
    html = report(r, "html")
    assert "<table" in html


def test_align_fast_path_predicate_matches_allele_switch():
    """The align_to_model fast path (identical non-ambiguous 'X/Y' strings
    skip allele_switch) must agree with allele_switch's full decision for
    every base combination it can trigger on."""
    from itertools import product
    from hibag_tpu.data.geno import _COMPLEMENT, allele_switch

    for b1, b2 in product("ACGT", repeat=2):
        s = f"{b1}/{b2}"
        fast_path = (b1 != b2 and _COMPLEMENT.get(b1) != b2)
        flip, category = allele_switch(s, s, 0.3, 0.3, same_strand=False)
        if fast_path:
            assert (flip, category) == (False, "match"), (s, flip, category)


def test_align_to_model_identity(hapmap_geno):
    """Aligning a dataset against a model built from the same SNP panel must
    produce the identity mapping with no flips."""
    import numpy as np
    from types import SimpleNamespace
    from hibag_tpu.data.geno import align_to_model

    g = hapmap_geno.subset(snp_mask=np.arange(50))
    model = SimpleNamespace(
        snp_id=g.snp_id, snp_position=g.snp_position,
        snp_allele=g.snp_allele, assembly=g.assembly,
        snp_allele_freq=None)
    codes, stats = align_to_model(model, g)
    np.testing.assert_array_equal(codes, g.genotype.T)
