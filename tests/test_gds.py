"""GDS import vs the PLINK copy of the same cohort (bundled fixtures)."""

import numpy as np
import pytest

from hibag_tpu.io.bed import read_bed
from hibag_tpu.io.gds import read_gds

GDS = "/root/reference/inst/extdata/HapMap_CEU_Chr6.gds"
BED = "/root/reference/inst/extdata/HapMap_CEU.bed"


def test_read_gds_structure():
    g = read_gds(GDS, import_chr="")
    assert g.n_samp == 165
    assert g.n_snp == 2348
    assert set(np.unique(g.genotype).tolist()) <= {0, 1, 2, 3}
    assert all("/" in str(a) for a in g.snp_allele[:50])


def test_gds_region_filter():
    g_all = read_gds(GDS, import_chr="")
    g_mhc = read_gds(GDS, import_chr="xMHC")
    assert 0 < g_mhc.n_snp <= g_all.n_snp


def test_gds_matches_bed_genotypes():
    """Every overlapping genotype call agrees with the PLINK fileset after
    per-SNP allele-orientation alignment."""
    g = read_gds(GDS, import_chr="")
    bed = read_bed(BED, import_chr="", assembly="hg19")
    bpos = {str(s): i for i, s in enumerate(bed.snp_id)}
    bsamp = {str(s): j for j, s in enumerate(bed.sample_id)}
    cs = [(i, bpos[str(s)]) for i, s in enumerate(g.snp_id)
          if str(s) in bpos]
    cj = [(j, bsamp[str(s)]) for j, s in enumerate(g.sample_id)
          if str(s) in bsamp]
    assert len(cs) > 1000 and len(cj) > 50
    agree = tot = 0
    for gi, bi in cs[:400]:
        ga, ba = str(g.snp_allele[gi]), str(bed.snp_allele[bi])
        if ga == ba:
            flip = False
        elif ga == "/".join(reversed(ba.split("/"))):
            flip = True
        else:
            continue
        a = g.genotype[gi][[j for j, _ in cj]]
        b = bed.genotype[bi][[j for _, j in cj]]
        ok = (a != 3) & (b != 3)
        exp = (2 - b) if flip else b
        agree += int((a[ok] == exp[ok]).sum())
        tot += int(ok.sum())
    assert tot > 10000
    assert agree == tot      # exact agreement


def test_gds_predicts(model_list):
    """Imputation from GDS-imported genotypes matches BED-imported calls."""
    from hibag_tpu.models.model import AttrBagModel
    from hibag_tpu.models.predict import predict
    model = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    # the GDS fixture uses a different genome build (constant ~108 kb
    # offset) — match by rs ID, the reference's match.type="RefSNP" case
    g = read_gds(GDS, import_chr="")
    res = predict(model, g, match_type="RefSNP")
    bed = read_bed(BED)
    res_b = predict(model, bed, match_type="RefSNP")
    common = [s for s in res.sample_id if s in set(res_b.sample_id)]
    assert len(common) > 50
    m1 = {s: (a, b) for s, a, b in zip(res.sample_id, res.allele1, res.allele2)}
    m2 = {s: (a, b) for s, a, b in zip(res_b.sample_id, res_b.allele1, res_b.allele2)}
    same = sum(m1[s] == m2[s] for s in common)
    # the sparse GDS array covers only ~77 of the 266 model SNPs, so some
    # marginal calls legitimately differ from the full-coverage BED run;
    # the missingness-weighted ensemble still agrees on the vast majority
    assert res.match_info["n_matched"] >= 50
    assert same / len(common) > 0.8


def test_gds_lzma_codec(tmp_path):
    """LZMA(xz)-coded payloads decode identically: transcode the bundled
    fixture's six zlib node streams to xz in place and re-read."""
    import lzma
    import zlib
    from hibag_tpu.io.gds import _zlib_streams

    data = open(GDS, "rb").read()
    # locate the six zlib streams with their byte extents
    spans = []
    pos = 0
    while len(spans) < 6 and pos < len(data) - 2:
        if data[pos] == 0x78 and data[pos + 1] in (0x01, 0x5E, 0x9C, 0xDA):
            try:
                dec = zlib.decompressobj()
                payload = dec.decompress(data[pos:])
                if dec.eof and len(payload) > 16:
                    end = len(data) - len(dec.unused_data)
                    spans.append((pos, end, payload))
                    pos = end
                    continue
            except zlib.error:
                pass
        pos += 1
    assert len(spans) == 6
    out = bytearray()
    last = 0
    for start, end, payload in spans:
        out += data[last:start]
        out += lzma.compress(payload, format=lzma.FORMAT_XZ)
        last = end
    out += data[last:]
    p = tmp_path / "lzma.gds"
    p.write_bytes(bytes(out))

    ref = read_gds(GDS, import_chr="")
    got = read_gds(str(p), import_chr="")
    np.testing.assert_array_equal(got.genotype, ref.genotype)
    np.testing.assert_array_equal(got.snp_position, ref.snp_position)
    assert list(got.sample_id) == list(ref.sample_id)
