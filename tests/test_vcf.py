import gzip

import numpy as np

from hibag_tpu.io.vcf import write_vcf
from hibag_tpu.models.model import AttrBagModel
from hibag_tpu.models.predict import predict


def test_vcf_export(model_list, hapmap_geno, tmp_path):
    model = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    res = predict(model, hapmap_geno)
    out = str(tmp_path / "hla.vcf")
    write_vcf(res, out, assembly="hg19")
    lines = open(out).read().splitlines()
    hdr = [l for l in lines if l.startswith("##")]
    assert any("fileformat=VCFv4.0" in l for l in hdr)
    chrom_line = [l for l in lines if l.startswith("#CHROM")][0]
    assert len(chrom_line.split("\t")) == 9 + hapmap_geno.n_samp
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) >= 10  # one row per called allele
    row = body[0].split("\t")
    assert row[0] == "6" and row[2].startswith("HLA-A*")
    assert row[8] == "GT:DS"
    gt, ds = row[9].split(":")
    assert gt in ("0/0", "0/1", "1/0", "1/1")
    float(ds)


def test_vcf_gz_and_cutoff(model_list, hapmap_geno, tmp_path):
    model = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    res = predict(model, hapmap_geno)
    out = str(tmp_path / "hla.vcf.gz")
    write_vcf(res, out, prob_cutoff=1.01)  # everything below cutoff
    lines = gzip.open(out, "rt").read().splitlines()
    body = [l for l in lines if not l.startswith("#")]
    assert all(cell.startswith("./.")
               for l in body for cell in l.split("\t")[9:])
