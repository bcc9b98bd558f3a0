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


def _lz4_frame(raw: bytes, indep: bool = True, bs: int = 65536) -> bytes:
    """Minimal LZ4 frame writer (literals-only blocks — valid per the
    public block format; the match path is covered by hand vectors in
    test_lz4_block_format)."""
    from hibag_tpu.io import gds as G

    def block(b: bytes) -> bytes:
        head = bytearray([min(len(b), 15) << 4])
        if len(b) >= 15:
            rem = len(b) - 15
            while rem >= 255:
                head.append(255)
                rem -= 255
            head.append(rem)
        return bytes(head) + b

    flg = (1 << 6) | (0x20 if indep else 0)
    out = bytearray(G._LZ4F_MAGIC + bytes([flg, 0x70, 0x00]))
    for i in range(0, len(raw), bs):
        blk = block(raw[i:i + bs])
        out += len(blk).to_bytes(4, "little") + blk
    out += (0).to_bytes(4, "little")
    return bytes(out)


def _transcode_gds(coder: str, split_genotype: bool = False) -> bytes:
    """Rebuild the bundled ZIP-coded fixture with a different node codec.

    Streams are re-laid-out block by block: node data payloads are
    re-encoded per `coder` ("" = raw bytes, "LZMA" = xz, any 3-char name =
    keep zlib payloads but relabel the codec record), and each node-header
    stream is rewritten accordingly — for uncompressed storage the three
    pipe records (codec name, size pair, level) are dropped and the record
    count decremented; otherwise the codec name is replaced in place.
    """
    import lzma
    import zlib
    from hibag_tpu.io import gds as G

    data = open(GDS, "rb").read()
    streams = G._parse_streams(data)
    entries = dict(G._dir_entries(streams[1]))
    header_sids = set(entries.values())
    data_sids = {}
    for name, hsid in entries.items():
        _, dsid = G._node_info(streams[hsid])
        if dsid is not None:
            data_sids[dsid] = hsid

    def rewrite_header(h: bytes) -> bytes:
        start = h.find(b"\x15" + G._CODER_MARKER)
        dims = h.find(b"\x07\xc4\xe3\x64\x1f")
        if start < 0 or dims < 0:
            return h
        end = dims - 1          # the dims record's type byte precedes this
        out = bytearray(h)
        if coder == "":
            out[start:end] = b""
            nrec = int.from_bytes(out[6:8], "little") - 3
            out[6:8] = nrec.to_bytes(2, "little")
        else:
            name = coder.encode()
            out[start + 5:start + 9] = bytes([len(name)]) + name
        out[0:6] = len(out).to_bytes(6, "little")
        return bytes(out)

    def recode_payload(p: bytes) -> bytes:
        raw = zlib.decompressobj().decompress(p)
        if coder == "":
            return raw
        if coder == "LZMA":
            return lzma.compress(raw, format=lzma.FORMAT_XZ)
        if coder == "LZ4":
            return _lz4_frame(raw)
        if coder in ("ZIP_ra", "LZMA_ra", "LZ4_ra"):
            # random-access block chain: [u32 csize][u32 rsize] per block,
            # with a 4-byte stream prefix to exercise the offset scan
            out = bytearray(b"\x10\x01\x00\x00")
            bs = 50_000
            for i in range(0, len(raw), bs):
                blk = raw[i:i + bs]
                cb = (lzma.compress(blk, format=lzma.FORMAT_XZ)
                      if coder == "LZMA_ra" else zlib.compress(blk)
                      if coder == "ZIP_ra" else _lz4_frame(blk))
                out += len(cb).to_bytes(4, "little")
                out += len(blk).to_bytes(4, "little")
                out += cb
            return bytes(out)
        return p                # relabel only — payload stays zlib

    geno_sid = None
    if split_genotype:
        geno_sid = [d for d, h in data_sids.items()
                    if h == entries["genotype"]][0]

    out = bytearray(data[:G._BLOCK_START])
    pos = G._BLOCK_START
    tail = None          # (next-pointer patch offset, continuation bytes)
    while pos + 12 <= len(data):
        word = int.from_bytes(data[pos:pos + 6], "little")
        size = word & G._SIZE_MASK
        sid = int.from_bytes(data[pos + 12:pos + 16], "little")
        content = data[pos + 22:pos + size]
        if sid in header_sids:
            content = rewrite_header(content)
        elif sid in data_sids:
            content = recode_payload(content)
        head, rest = content, b""
        if sid == geno_sid:
            head, rest = content[:1000], content[1000:]
        out += ((22 + len(head)) | G._HEAD_BIT).to_bytes(6, "little")
        nxt_at = len(out)
        out += (0).to_bytes(6, "little")
        out += sid.to_bytes(4, "little")
        out += len(content).to_bytes(6, "little")   # full stream size
        out += head
        if rest:
            tail = (nxt_at, rest)
        pos += size
    if tail is not None:
        nxt_at, rest = tail
        out[nxt_at:nxt_at + 6] = len(out).to_bytes(6, "little")
        out += (12 + len(rest)).to_bytes(6, "little")   # no head bit
        out += (0).to_bytes(6, "little")
        out += rest
    return bytes(out)


@pytest.mark.parametrize("coder", ["", "LZMA", "LZ4", "ZIP_ra", "LZMA_ra",
                                   "LZ4_ra"])
def test_gds_codec_variants(tmp_path, coder):
    """Uncompressed, LZMA(xz), LZ4-frame and random-access block-coded
    (ZIP_RA / LZMA_RA / LZ4_RA, multi-block with a stream prefix) node
    payloads decode identically to the ZIP-coded original."""
    p = tmp_path / f"variant_{coder or 'raw'}.gds"
    p.write_bytes(_transcode_gds(coder))

    ref = read_gds(GDS, import_chr="")
    got = read_gds(str(p), import_chr="")
    np.testing.assert_array_equal(got.genotype, ref.genotype)
    np.testing.assert_array_equal(got.snp_position, ref.snp_position)
    assert list(got.sample_id) == list(ref.sample_id)
    assert list(got.snp_allele) == list(ref.snp_allele)


def test_gds_continuation_blocks(tmp_path):
    """A stream split across chained blocks (head + continuation via the
    next-pointer) reassembles correctly."""
    p = tmp_path / "split.gds"
    p.write_bytes(_transcode_gds("", split_genotype=True))
    ref = read_gds(GDS, import_chr="")
    got = read_gds(str(p), import_chr="")
    np.testing.assert_array_equal(got.genotype, ref.genotype)


def test_gds_unknown_codec_raises(tmp_path):
    p = tmp_path / "xyz.gds"
    p.write_bytes(_transcode_gds("XYZ"))
    with pytest.raises(NotImplementedError, match="XYZ"):
        read_gds(str(p), import_chr="")


def test_lz4_block_format():
    """Hand-built LZ4 vectors: match copies, overlapping (RLE) matches,
    block-dependent frame history."""
    from hibag_tpu.io.gds import _lz4_block, _lz4f_decompress, _LZ4F_MAGIC

    # "abcd" literals, then a 7-byte match at offset 4, then 5 literals
    vec = bytes([0x43]) + b"abcd" + bytes([0x04, 0x00, 0x50]) + b"dabcd"
    assert _lz4_block(vec) == b"abcdabcdabcdabcd"
    # overlapping match: 1 literal "a", match len 6 at offset 1 -> "a"*7
    assert _lz4_block(bytes([0x12]) + b"a" + bytes([0x01, 0x00])) == b"a" * 7
    # history window: a match that reaches into the previous block
    assert _lz4_block(bytes([0x04, 0x08, 0x00]),
                      hist=b"abcdefgh") == b"abcdefgh"
    # block-dependent frame: block 2's match offsets reference block 1
    frame = bytearray(_LZ4F_MAGIC + bytes([1 << 6, 0x70, 0x00]))
    b1 = bytes([0x80]) + b"abcdefgh"                  # 8 literals
    b2 = bytes([0x04, 0x08, 0x00])                    # match len 8, off 8
    for b in (b1, b2):
        frame += len(b).to_bytes(4, "little") + b
    frame += (0).to_bytes(4, "little")
    assert _lz4f_decompress(bytes(frame), "t") == b"abcdefgh" * 2


def test_gds_seq_array_wrong_nodes_raises(tmp_path):
    """A SEQ_ARRAY file without the flat SeqArray node set (e.g. the
    folder-hierarchy layout) raises with conversion guidance."""
    data = open(GDS, "rb").read().replace(b"SNP_ARRAY", b"SEQ_ARRAY")
    p = tmp_path / "seq.gds"
    p.write_bytes(data)
    with pytest.raises(NotImplementedError, match="SEQ_ARRAY"):
        read_gds(str(p), import_chr="")


def _transcode_seq_gds() -> bytes:
    """Rebuild the bundled SNP_ARRAY fixture as a flat-layout SEQ_ARRAY
    file: nodes renamed to the SeqArray set, allele strings converted from
    "A/B" (count of A) to "REF,ALT" = "B,A" (count of first ALT = A), and
    the genotype node repacked as 2-bit allele-index haplotype pairs
    (0->(0,0), 1->(1,0), 2->(1,1), missing->(3,3)), ploidy-major."""
    import zlib
    import numpy as np
    from hibag_tpu.io import gds as G

    data = open(GDS, "rb").read()
    streams = G._parse_streams(data)
    entries = dict(G._dir_entries(streams[1], streams))
    data_sid = {}
    for name, hsid in entries.items():
        _, dsid = G._node_info(streams[hsid])
        data_sid[name] = dsid

    renames = {b"snp.id": b"variant.id", b"snp.position": b"position",
               b"snp.chromosome": b"chromosome", b"snp.allele": b"allele"}

    def rewrite_root(root: bytes) -> bytes:
        out = bytearray(root)
        for old, new in renames.items():
            pat = G._DIR_MARKER + bytes([len(old)]) + old
            i = bytes(out).find(pat)
            assert i >= 0, old
            # entry length u48 sits 25 bytes before the name marker
            elen = int.from_bytes(out[i - 25:i - 19], "little")
            out[i - 25:i - 19] = (elen + len(new) - len(old)).to_bytes(
                6, "little")
            out[i:i + len(pat)] = G._DIR_MARKER + bytes([len(new)]) + new
        # root stream's own length prefix
        out[0:6] = len(out).to_bytes(6, "little")
        return bytes(out).replace(b"SNP_ARRAY", b"SEQ_ARRAY")

    def recode_allele(raw: bytes) -> bytes:
        parts = raw.decode().rstrip("\x00").split("\x00")
        return ("\x00".join(
            ",".join(reversed(p.split("/"))) for p in parts) + "\x00"
        ).encode()

    def recode_genotype(raw: bytes) -> bytes:
        gb = np.frombuffer(raw, dtype=np.uint8)
        codes = np.stack([(gb >> (2 * k)) & 3 for k in range(4)],
                         axis=1).reshape(-1)
        n_var, n_samp = 2348, 165
        codes = codes[:n_var * n_samp].reshape(n_var, n_samp)
        hap = np.zeros((n_var, n_samp, 2), np.uint8)
        hap[codes == 1, 0] = 1
        hap[codes == 2] = 1
        hap[codes >= 3] = 3
        flat = hap.reshape(-1)
        pad = (-len(flat)) % 4
        flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
        q = flat.reshape(-1, 4)
        packed = (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
                  | (q[:, 3] << 6)).astype(np.uint8)
        return packed.tobytes()

    out = bytearray(data[:G._BLOCK_START])
    pos = G._BLOCK_START
    while pos + 12 <= len(data):
        word = int.from_bytes(data[pos:pos + 6], "little")
        size = word & G._SIZE_MASK
        sid = int.from_bytes(data[pos + 12:pos + 16], "little")
        content = data[pos + 22:pos + size]
        if sid == 1:
            content = rewrite_root(content)
        elif sid == data_sid["snp.allele"]:
            content = zlib.compress(recode_allele(
                zlib.decompressobj().decompress(content)))
        elif sid == data_sid["genotype"]:
            content = zlib.compress(recode_genotype(
                zlib.decompressobj().decompress(content)))
        out += ((22 + len(content)) | G._HEAD_BIT).to_bytes(6, "little")
        out += (0).to_bytes(6, "little")
        out += sid.to_bytes(4, "little")
        out += len(content).to_bytes(6, "little")
        out += content
        pos += size
    return bytes(out)


def _to_folder_hierarchy(data: bytes, idx_value: int = 1) -> bytes:
    """Rewrite a flat SEQ_ARRAY container into the genotype/data +
    genotype/@data folder hierarchy real SeqArray files use: the root
    "genotype" entry is repointed at a new folder-node header stream (the
    root-folder grammar) whose "data" entry reuses the original genotype
    node header and whose "@data" entry is a new uncompressed array of
    rows-per-variant counts."""
    from hibag_tpu.io import gds as G

    streams = G._parse_streams(data)
    root = streams[1]
    entries = dict(G._dir_entries(root, streams))
    geno_hsid = entries["genotype"]
    max_sid = max(streams)
    folder_sid, idx_hdr_sid, idx_data_sid = (max_sid + 1, max_sid + 2,
                                             max_sid + 3)

    # root entry grammar: 26-byte prefix (u48 entry length, record words,
    # sid at [12:16]) + name marker + u8 len + name
    i = root.find(G._DIR_MARKER + bytes([9]) + b"sample.id")
    tmpl = root[i - 26:i]

    def entry(name: bytes, sid: int) -> bytes:
        pre = bytearray(tmpl)
        pre[12:16] = sid.to_bytes(4, "little")
        body = bytearray(bytes(pre) + G._DIR_MARKER
                         + bytes([len(name)]) + name)
        body[0:6] = len(body).to_bytes(6, "little")
        return bytes(body)

    folder = bytearray((2).to_bytes(2, "little"))      # entry count
    folder += entry(b"data", geno_hsid)
    folder += entry(b"@data", idx_hdr_sid)
    folder = len(folder).to_bytes(6, "little") + bytes(folder)

    idx_hdr = ((1).to_bytes(2, "little") + b"\x09" + G._DATA_MARKER
               + idx_data_sid.to_bytes(4, "little"))
    idx_hdr = (len(idx_hdr) + 6).to_bytes(6, "little") + idx_hdr
    idx_payload = bytes([idx_value]) * 2348            # n_var counts

    j = root.find(G._DIR_MARKER + bytes([8]) + b"genotype")
    new_root = bytearray(root)
    new_root[j - 14:j - 10] = folder_sid.to_bytes(4, "little")

    out = bytearray(data[:G._BLOCK_START])
    pos = G._BLOCK_START
    new = [(1, bytes(new_root)), (folder_sid, folder),
           (idx_hdr_sid, idx_hdr), (idx_data_sid, idx_payload)]
    while pos + 12 <= len(data):
        word = int.from_bytes(data[pos:pos + 6], "little")
        size = word & G._SIZE_MASK
        sid = int.from_bytes(data[pos + 12:pos + 16], "little")
        content = data[pos + 22:pos + size]
        if sid != 1:
            new.insert(0, (sid, content))
        pos += size
    for sid, content in new:
        out += ((22 + len(content)) | G._HEAD_BIT).to_bytes(6, "little")
        out += (0).to_bytes(6, "little")
        out += sid.to_bytes(4, "little")
        out += len(content).to_bytes(6, "little")
        out += content
    return bytes(out)


def test_gds_seq_array_folder_hierarchy(tmp_path):
    """The genotype/data + genotype/@data folder layout imports identically
    to the flat SEQ_ARRAY layout (reference R/DataUtilities.R:860-912 via
    seqGetData, which resolves the same hierarchy)."""
    p = tmp_path / "seqfolder.gds"
    p.write_bytes(_to_folder_hierarchy(_transcode_seq_gds()))
    ref = read_gds(GDS, import_chr="")
    got = read_gds(str(p), import_chr="")
    np.testing.assert_array_equal(got.genotype, ref.genotype)
    np.testing.assert_array_equal(got.snp_position, ref.snp_position)
    assert list(got.sample_id) == list(ref.sample_id)
    assert list(got.snp_id) == list(ref.snp_id)
    assert list(got.snp_allele) == list(ref.snp_allele)


def test_gds_seq_array_multirow_raises(tmp_path):
    """Multi-row (>3 ALT alleles) genotype encodings are detected via the
    @data index and raise with conversion guidance."""
    p = tmp_path / "seqmulti.gds"
    p.write_bytes(_to_folder_hierarchy(_transcode_seq_gds(), idx_value=2))
    with pytest.raises(NotImplementedError, match="multi-row"):
        read_gds(str(p), import_chr="")


def test_gds_seq_array_import(tmp_path):
    """Flat-layout SEQ_ARRAY import reproduces the SNP_ARRAY genotypes,
    alleles and annotation exactly (reference dosage rules,
    R/DataUtilities.R:860-912)."""
    p = tmp_path / "seqflat.gds"
    p.write_bytes(_transcode_seq_gds())
    ref = read_gds(GDS, import_chr="")
    got = read_gds(str(p), import_chr="")
    np.testing.assert_array_equal(got.genotype, ref.genotype)
    np.testing.assert_array_equal(got.snp_position, ref.snp_position)
    assert list(got.sample_id) == list(ref.sample_id)
    assert list(got.snp_id) == list(ref.snp_id)
    assert list(got.snp_allele) == list(ref.snp_allele)
    # region filtering works on the SeqArray path too
    got_mhc = read_gds(str(p), import_chr="xMHC")
    ref_mhc = read_gds(GDS, import_chr="xMHC")
    np.testing.assert_array_equal(got_mhc.genotype, ref_mhc.genotype)


def test_parse_streams_cyclic_continuation_terminates():
    """A crafted/corrupted file whose zero-payload continuation blocks form
    a next-pointer cycle must terminate (truncated stream), not hang."""
    import hibag_tpu.io.gds as G

    def u48(v):
        return v.to_bytes(6, "little")

    head_off = G._BLOCK_START
    cont_off = head_off + 22                     # header block: no payload
    # head block: size 22 (header only), total claims 8 bytes, next -> cont
    head = u48((1 << 47) | 22) + u48(cont_off) + (7).to_bytes(4, "little") \
        + (8).to_bytes(6, "little")
    # continuation block: size 12 (EMPTY payload), next -> itself (cycle)
    cont = u48(12) + u48(cont_off)
    data = b"\x00" * G._BLOCK_START + head + cont
    streams = G._parse_streams(data)
    assert streams.get(7, b"") == b""            # truncated, but returns
