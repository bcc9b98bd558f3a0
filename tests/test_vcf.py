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


def test_vcf_bgzf_output(model_list, hapmap_geno, tmp_path):
    """`.vcf.gz` output is true BGZF: BC extra field in every member, the
    fixed EOF block, and gzip-module readability."""
    import gzip
    import struct
    from hibag_tpu.io.bgzf import EOF_BLOCK
    from hibag_tpu.models.model import AttrBagModel
    from hibag_tpu.models.predict import predict

    model = AttrBagModel.from_hibag_obj(model_list["A"], locus="A")
    res = predict(model, hapmap_geno)
    out = str(tmp_path / "o.vcf.gz")
    write_vcf(res, out, assembly="hg19")
    raw = open(out, "rb").read()
    # magic + FEXTRA + BC subfield
    assert raw[:4] == b"\x1f\x8b\x08\x04"
    xlen = struct.unpack("<H", raw[10:12])[0]
    extra = raw[12:12 + xlen]
    assert extra[:2] == b"BC" and struct.unpack("<H", extra[2:4])[0] == 2
    # terminated by the fixed BGZF EOF block
    assert raw.endswith(EOF_BLOCK)
    # readable as ordinary multi-member gzip
    text = gzip.decompress(raw).decode()
    assert text.startswith("##fileformat=VCF")
    assert text.count("\n") > 10


def test_bgzf_multiblock_roundtrip(tmp_path):
    import gzip
    from hibag_tpu.io.bgzf import BgzfWriter, MAX_BLOCK
    p = str(tmp_path / "big.gz")
    payload = ("x" * 97 + "\n") * (3 * MAX_BLOCK // 98)
    with BgzfWriter(p, mode="wt") as f:
        f.write(payload)
    assert gzip.decompress(open(p, "rb").read()).decode() == payload


def test_bgzf_bsize_block_walk(tmp_path):
    """A spec-conforming reader advances BSIZE+1 bytes per block and must land
    exactly on the next block's gzip magic (SAM spec 4.1: the BC field stores
    total block size MINUS 1). Regression for the off-by-one that made BSIZE
    walks land one byte past each block."""
    import struct
    import zlib
    from hibag_tpu.io.bgzf import BgzfWriter, EOF_BLOCK, MAX_BLOCK, \
        _compress_block

    # the empty block must be byte-identical to the spec's fixed EOF block
    assert _compress_block(b"", level=6) == EOF_BLOCK

    p = str(tmp_path / "walk.gz")
    import numpy as np
    rng = np.random.default_rng(7)
    payload = rng.integers(32, 127, size=2 * MAX_BLOCK + 1234,
                           dtype=np.uint8).tobytes()
    with BgzfWriter(p) as f:
        f.write(payload)
    raw = open(p, "rb").read()
    pos, out, nblocks = 0, b"", 0
    while pos < len(raw):
        assert raw[pos:pos + 4] == b"\x1f\x8b\x08\x04", \
            f"block {nblocks}: bad magic at offset {pos}"
        xlen = struct.unpack("<H", raw[pos + 10:pos + 12])[0]
        extra = raw[pos + 12:pos + 12 + xlen]
        assert extra[:2] == b"BC"
        bsize = struct.unpack("<H", extra[4:6])[0]
        block = raw[pos:pos + bsize + 1]
        cdata = block[12 + xlen:-8]
        out += zlib.decompress(cdata, -15)
        pos += bsize + 1
        nblocks += 1
    assert pos == len(raw)
    assert nblocks == 4  # 3 data blocks + EOF
    assert out == payload
