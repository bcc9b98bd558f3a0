import gzip

import numpy as np
import pytest

from hibag_tpu.io.vcf_in import read_vcf


def _write_vcf(path, gz=False):
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3",
        "6\t29910500\trs1\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1\t1/1",
        "6\t29910600\trs2\tC\tT\t.\tPASS\t.\tGT:DP\t0|1:10\t./.:3\t0/0:8",
        "6\t29910700\trs3\tA\tGT\t.\tPASS\t.\tGT\t0/0\t0/0\t0/0",   # indel
        "6\t29910800\trs4\tA\tG,C\t.\tPASS\t.\tGT\t0/0\t0/0\t0/0",  # multi
        "1\t1000\trs5\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1\t1/1",        # off-chr
    ]
    data = "\n".join(lines) + "\n"
    if gz:
        gzip.open(path, "wt").write(data)
    else:
        open(path, "w").write(data)


def test_read_vcf(tmp_path):
    p = str(tmp_path / "t.vcf")
    _write_vcf(p)
    g = read_vcf(p, import_chr="xMHC", assembly="hg19")
    assert g.n_samp == 3
    assert list(g.snp_id) == ["rs1", "rs2"]  # indel/multiallelic/off-chr gone
    # REF-allele counts: 0/0→2, 0/1→1, 1/1→0; ./.→3
    np.testing.assert_array_equal(g.genotype[0], [2, 1, 0])
    np.testing.assert_array_equal(g.genotype[1], [1, 3, 2])
    assert g.snp_allele[0] == "A/G"


def test_read_vcf_gz_all_chr(tmp_path):
    p = str(tmp_path / "t.vcf.gz")
    _write_vcf(p, gz=True)
    g = read_vcf(p, import_chr="")
    assert g.n_snp == 3  # rs1 rs2 rs5


def test_vcf_predict_roundtrip(tmp_path, model_list, hapmap_geno):
    """Export imputation input as VCF-like genotypes and re-import."""
    from hibag_tpu.models.model import AttrBagModel
    from hibag_tpu.models.predict import predict
    model = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    # write the hapmap genotypes as a VCF
    p = str(tmp_path / "geno.vcf")
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(map(str, hapmap_geno.sample_id)) + "\n")
        # code counts the A allele; with REF=B, ALT=A the GT carries `code`
        # ALT copies
        conv = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
        for i in range(hapmap_geno.n_snp):
            a, b = str(hapmap_geno.snp_allele[i]).split("/")[:2]
            if len(a) != 1 or len(b) != 1:
                continue
            cells = [conv[int(v)] for v in hapmap_geno.genotype[i]]
            # REF = B allele, ALT = A allele (so REF count = 2 - code)
            f.write(f"6\t{hapmap_geno.snp_position[i]}\t{hapmap_geno.snp_id[i]}"
                    f"\t{b}\t{a}\t.\tPASS\t.\tGT\t" + "\t".join(cells) + "\n")
    g = read_vcf(p, import_chr="")
    res_vcf = predict(model, g)
    res_ref = predict(model, hapmap_geno)
    # allele-order flip is resolved by the matching layer -> identical calls
    np.testing.assert_array_equal(res_vcf.allele1, res_ref.allele1)
    np.testing.assert_array_equal(res_vcf.allele2, res_ref.allele2)


def test_native_gt_parser_matches_python(tmp_path):
    """The native GT parser and the Python fallback agree on tricky cells:
    phasing, haploid calls, partial missing, multi-field FORMAT, '.'."""
    from hibag_tpu.io.native import get_lib, vcf_gt_codes
    if get_lib() is None:
        import pytest
        pytest.skip("native lib not built")

    cells = ["0/0", "0|1", "1/1", "./.", ".", "0", "1", "./1", "0/.",
             "0/1:35:99", "1|1:2", ".:.", "0/0/0", "12/0", "0/12"]
    want = [2, 1, 0, 3, 3, 1, 0, 0, 1, 1, 0, 3, 2, 1, 1]
    region = "\t".join(cells).encode()
    got = vcf_gt_codes(region, 0, len(cells))
    assert got is not None
    assert got.tolist() == want

    # GT not the first FORMAT field
    cells2 = ["99:0/1", "12:1|1", "5:./."]
    got2 = vcf_gt_codes("\t".join(cells2).encode(), 1, len(cells2))
    assert got2.tolist() == [1, 0, 3]
