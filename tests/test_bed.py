import numpy as np
import pytest

from hibag_tpu.io.bed import read_bed, select_region, write_ped

BED = "/root/reference/inst/extdata/HapMap_CEU.bed"


def test_read_bundled_bed(hapmap_geno):
    # the bundled BED holds all 90 CEU trio members; the processed panel
    # keeps the 60 founders
    g = read_bed(BED, import_chr="xMHC", assembly="hg19")
    assert g.n_samp == 90
    assert g.n_snp > 1000
    # cross-check genotypes against the bundled hlaSNPGenoClass on the
    # common samples and SNPs (same source data, same allele order)
    g = g.subset_by_samples(hapmap_geno.sample_id)
    ids = {s: i for i, s in enumerate(g.snp_id)}
    jds = {s: j for j, s in enumerate(hapmap_geno.snp_id)}
    common = [s for s in hapmap_geno.snp_id if s in ids]
    assert len(common) > 1000
    mism = checked = 0
    for s in common[:300]:
        i, j = ids[s], jds[s]
        if g.snp_allele[i] == hapmap_geno.snp_allele[j]:
            checked += 1
            if not np.array_equal(g.genotype[i], hapmap_geno.genotype[j]):
                mism += 1
    assert checked > 200
    assert mism == 0


def test_read_all_chromosomes():
    g = read_bed(BED, import_chr="", assembly="hg19")
    g2 = read_bed(BED, import_chr="xMHC", assembly="hg19")
    assert g.n_snp >= g2.n_snp


def test_select_region():
    chrom = np.array(["6", "6", "1"], dtype=object)
    pos = np.array([30_000_000, 5_000_000, 30_000_000])
    f = select_region(chrom, pos, "xMHC", "hg19")
    assert f[0] and not f[1] and not f[2]
    assert select_region(chrom, pos, "", "hg19").all()
    f6 = select_region(chrom, pos, "6", "hg19")
    assert f6[0] and f6[1] and not f6[2]


def test_ped_roundtrip(tmp_path, hapmap_geno):
    sub = hapmap_geno.subset(snp_mask=np.arange(20),
                             samp_mask=np.arange(5))
    write_ped(sub, str(tmp_path / "out"))
    ped = (tmp_path / "out.ped").read_text().strip().splitlines()
    assert len(ped) == 5
    mp = (tmp_path / "out.map").read_text().strip().splitlines()
    assert len(mp) == 20
