import numpy as np
import pytest

from hibag_tpu.data.allele import (
    HLATypeTable, allele_digit, flanking_snps, loci_info, sort_alleles,
    split_alleles, unique_alleles,
)


def test_sort_alleles_fieldwise():
    # numeric fields sort numerically, not lexically
    assert sort_alleles(["10:01", "02:01", "02:10", "02:02"]) == \
        ["02:01", "02:02", "02:10", "10:01"]
    # suffix ordering after numeric tie; shorter field list first on tie
    assert sort_alleles(["01:01:01", "01:01"]) == ["01:01", "01:01:01"]
    assert sort_alleles(["68:01N", "68:01"]) == ["68:01", "68:01N"]


def test_allele_digit():
    assert allele_digit("01:02:03:04", "4-digit") == "01:02"
    assert allele_digit("01:02:03:04", "2-digit") == "01"
    assert allele_digit("01:02N", "4-digit") == "01:02N"
    assert allele_digit("01:02N", "4-digit", rm_suffix=True) == "01:02"
    assert allele_digit("01:02", "") == "01:02"
    out = allele_digit(np.array(["01:02:03", None], dtype=object), "4-digit")
    assert out[0] == "01:02" and out[1] is None


def test_unique_alleles():
    assert unique_alleles(["02:01", "01:01", "02:01", None]) == ["01:01", "02:01"]


def test_loci_info_and_flanking():
    info = loci_info("hg19")
    assert "A" in info and "DRB1" in info
    chrom, start, end, _ = info["A"]
    assert chrom == "6" and start < end
    ids = np.array(["s1", "s2", "s3"], dtype=object)
    pos = np.array([start - 600_000, start - 100, end + 100])
    sel = flanking_snps(ids, pos, "A", flank_bp=500_000, assembly="hg19")
    assert list(sel) == ["s2", "s3"]


def test_hla_table_and_split(hla_types):
    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"],
        locus="A", assembly="hg19")
    assert t.n_samp == 60
    assert t.pos_start is not None
    counts = t.allele_counts()
    assert sum(counts.values()) == 120
    rng = np.random.default_rng(100)
    tr, va = split_alleles(t, 0.5, rng)
    assert tr.n_samp + va.n_samp == 60
    assert abs(tr.n_samp - 30) <= 6
    # every allele present in validation also appears in training (rarest-first
    # stratification makes this overwhelmingly likely for ceil splits)
    assert set(va.unique_alleles()) <= set(t.unique_alleles())


def test_table_combine_subset(hla_types):
    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"], locus="A")
    a = t.subset(np.arange(30))
    b = t.subset(np.arange(30, 60))
    c = a.combine(b)
    assert c.n_samp == 60
    with pytest.raises(ValueError):
        a.combine(a)
