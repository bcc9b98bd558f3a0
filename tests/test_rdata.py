import numpy as np

from hibag_tpu.io.rdata import read_rdata, r_to_py


def test_read_genotype_data(hapmap_geno):
    g = hapmap_geno
    assert g.n_snp == 1564 and g.n_samp == 60
    vals = np.unique(g.genotype)
    assert set(vals.tolist()) <= {0, 1, 2, 3}
    assert g.assembly in ("hg19", "hg18", "hg38")
    f = g.allele_freq()
    assert np.nanmin(f) >= 0 and np.nanmax(f) <= 1


def test_read_hla_types(hla_types):
    assert len(hla_types["sample.id"]) == 60
    assert all(":" in a for a in hla_types["A.1"])


def test_read_model_list(model_list):
    m = model_list["A"]
    assert int(np.asarray(m["n.snp"])[0]) == 266
    assert len(m["classifiers"]) == 100
    c = m["classifiers"][0]
    assert set(c.keys()) >= {"haplos", "snpidx", "outofbag.acc"}
    h = c["haplos"]
    assert abs(float(np.sum(h["freq"])) - 1.0) < 0.05


def test_read_xz_rdata():
    d = read_rdata("/root/reference/inst/extdata/OutOfBag.RData")
    assert len(d) >= 1
