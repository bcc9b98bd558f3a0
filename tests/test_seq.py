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


def test_default_data_dir_resolution(monkeypatch, tmp_path):
    """conv_sequence runs OUT OF THE BOX: data_dir=None resolves via
    HIBAG_TPU_IMGT_DIR -> cached fetch_imgt copy -> the reference
    package's bundled release (read in place)."""
    from hibag_tpu.seq.aa import default_data_dir
    monkeypatch.delenv("HIBAG_TPU_IMGT_DIR", raising=False)
    assert default_data_dir() == DATA  # the bundled reference copy
    # env var wins when it points at a release layout
    env_dir = tmp_path / "rel"
    (env_dir / "SeqAlign").mkdir(parents=True)
    monkeypatch.setenv("HIBAG_TPU_IMGT_DIR", str(env_dir))
    assert default_data_dir() == str(env_dir)
    monkeypatch.setenv("HIBAG_TPU_IMGT_DIR", str(tmp_path / "nope"))
    assert default_data_dir() == DATA
    # and the no-data_dir call path works end-to-end
    monkeypatch.delenv("HIBAG_TPU_IMGT_DIR", raising=False)
    out = conv_sequence(["01:01:01:01"], "A", code="exact")
    assert isinstance(out[0], str) and len(out[0]) > 300


def test_feature_info_from_xml(tmp_path):
    """The fetch_imgt FeatureInfo converter extracts UTR/exon/intron spans
    from a release hla.xml into the reference's bundled table layout."""
    import zipfile
    from hibag_tpu.seq.aa import _feature_info_from_xml

    xml = """<?xml version="1.0"?>
<alleles xmlns="http://hla.alleles.org/xml">
 <allele name="HLA-A*01:01:01:01" id="HLA00001">
  <sequence>
   <feature name="5' UTR" featuretype="UTR">
    <SequenceCoordinates start="1" end="300"/>
   </feature>
   <feature name="Exon 1" featuretype="Exon">
    <SequenceCoordinates start="301" end="373"/>
   </feature>
   <feature name="Intron 1" featuretype="Intron">
    <SequenceCoordinates start="374" end="503"/>
   </feature>
   <feature name="TM" featuretype="Protein">
    <SequenceCoordinates start="1" end="10"/>
   </feature>
  </sequence>
 </allele>
</alleles>"""
    zp = tmp_path / "hla.xml.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("hla.xml", xml)
    out = tmp_path / "FeatureInfo.txt"
    _feature_info_from_xml(str(zp), str(out), "3.22.0", ("A",))
    lines = out.read_text().splitlines()
    assert lines[2] == "id\tname\tstart\tend"
    assert lines[3] == "A\t5' UTR\t1\t300"
    assert lines[4] == "A\tExon 1\t301\t373"
    assert lines[5] == "A\tIntron 1\t374\t503"
    assert len(lines) == 6  # the Protein feature is excluded


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
