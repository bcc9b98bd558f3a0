"""Amino-acid conversion against the reference's bundled IMGT v3.22.0 data
(read-only; licensed data stays in the reference tree)."""

import numpy as np
import pytest

from hibag_tpu.data.allele import HLATypeTable
from hibag_tpu.seq.aa import (AASeqTable, conv_sequence, convert_table,
                              protein_alignment, seq_merge)

DATA = "/root/reference/inst/extdata/v3.22.0"


def test_protein_alignment_parse():
    p = protein_alignment("A", DATA)
    assert p["allele"][0] == "01:01:01:01"
    assert p["start"] > 0
    assert set(p["sequence"][0]) == {"-"}          # reference row: all '-'
    assert "." not in p["reference"]               # dots removed
    assert len(p["feature"]) >= 4
    assert p["feature"][0]["id"] == "Exon 1"


def test_seq_merge():
    assert seq_merge(["ABC", "ABC"]) == "ABC"
    assert seq_merge(["ABC", "ABD"]) == "AB*"
    assert seq_merge(["AB", "ABC"]) == "AB*"
    assert seq_merge([]) is None


def test_conv_sequence_exact():
    out = conv_sequence(["01:01:01:01"], "A", DATA, code="exact")
    assert isinstance(out[0], str) and len(out[0]) > 300


def test_conv_sequence_pcode_merge():
    # 4-digit alleles resolve through the P-code groups
    out = conv_sequence(["01:01", "02:01"], "A", DATA, code="P.code.merge")
    assert all(isinstance(s, str) for s in out)
    # merged ambiguity marks disagreement with '*'
    assert set(out[0]) <= set("-*.ACDEFGHIKLMNPQRSTVWYX")


def test_convert_table(hla_types):
    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"],
        locus="A")
    aa = convert_table(t, DATA, code="P.code.merge")
    assert isinstance(aa, AASeqTable)
    ok = sum(s is not None for s in aa.allele1)
    assert ok >= 0.8 * t.n_samp
    res = aa.residue_table(poly_only=True)
    assert len(res["pos"]) > 0
    assert (res["num"] > 0).all()
