"""GDS (CoreArray) import for SNPRelate "SNP_ARRAY" files.

Equivalent of hlaGDS2Geno (reference R/DataUtilities.R:787) for SNPRelate
SNP_ARRAY GDS files with the standard node set (sample.id, snp.id,
snp.position, snp.chromosome, snp.allele, genotype).

The CoreArray container is parsed at the block-graph level (reverse-
engineered from SNPRelate-written files; the reference links the gdsfmt C++
library instead):

- After the 12-byte "COREARRAYx0A" magic and a 6-byte version prefix, the
  file is a chain of blocks. Each block head is a 6-byte little-endian word
  whose low 46 bits are the block's total length (header included) and
  whose bit 47 marks a stream head, followed by a 6-byte next-block file
  offset (0 = none). Stream-head blocks carry 10 more bytes: a u32 stream
  ID and a 48-bit total stream size (continuation blocks chained through
  the next pointer carry only the 12-byte header).
- Stream 1 is the root folder: length-prefixed entries whose name follows
  the 4-byte marker 44 C6 60 10 and whose node-header stream ID sits 14
  bytes before it, plus the FileFormat attribute.
- Each node-header stream is a record list: the codec name ("ZIP", "LZMA",
  ...) follows marker C4 46 6D 10 (absent for uncompressed storage) and the
  data-stream ID follows marker C4 C3 7C 0C. Array dims follow C3 43 61.
- Data streams hold the node payload: a raw zlib stream for "ZIP", a raw
  xz container for "LZMA", or the uncompressed bytes when no codec record
  is present.

Genotypes are 2-bit packed SNP-major with 0/1/2 = count of the FIRST
allele of snp.allele "A/B" and 3 = missing — verified genotype-for-
genotype against the PLINK copy of the same cohort (tests/test_gds.py:
100% agreement on ~50k calls).

Codecs: ZIP (zlib), LZMA (xz), and uncompressed nodes are supported; the
random-access variants (ZIP_RA/LZMA_RA/LZ4...) and SeqArray ("SEQ_ARRAY")
files raise with conversion guidance (GDS→BED via SNPRelate, or GDS→VCF).
"""

from __future__ import annotations

import lzma
import zlib

import numpy as np

from ..constants import GENO_MISSING
from ..data.geno import SNPGenoData

_MAGIC = b"COREARRAYx0A"
_EXPECTED = ("sample.id", "snp.id", "snp.position", "snp.chromosome",
             "snp.allele", "genotype")

_BLOCK_START = 18            # magic (12) + version prefix (6)
_HEAD_BIT = 1 << 47
_SIZE_MASK = (1 << 46) - 1
_DIR_MARKER = b"\x44\xc6\x60\x10"    # precedes a directory entry name
_CODER_MARKER = b"\xc4\x46\x6d\x10"  # precedes the codec name record
_DATA_MARKER = b"\xc4\xc3\x7c\x0c"   # precedes the data-stream ID


def _u(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _parse_streams(data: bytes) -> dict:
    """Walk the block chain and reassemble {stream id: payload bytes}."""
    n = len(data)
    blocks = {}       # offset -> (size, next, sid, total, content_start)
    pos = _BLOCK_START
    while pos + 12 <= n:
        word = _u(data[pos:pos + 6])
        size = word & _SIZE_MASK
        if size < 12 or pos + size > n:
            break
        nxt = _u(data[pos + 6:pos + 12])
        if (word & _HEAD_BIT) and size >= 22:
            sid = _u(data[pos + 12:pos + 16])
            total = _u(data[pos + 16:pos + 22])
            blocks[pos] = (size, nxt, sid, total, pos + 22)
        else:
            blocks[pos] = (size, nxt, None, None, pos + 12)
        pos += size

    streams = {}
    for off, (size, nxt, sid, total, cstart) in blocks.items():
        if sid is None:
            continue
        chunks = [data[cstart:off + size]]
        got = len(chunks[0])
        while got < total and nxt in blocks:
            bsize, bnxt, bsid, _, bstart = blocks[nxt]
            if bsid is not None:      # head blocks never continue a chain
                break
            chunk = data[bstart:nxt + bsize]
            chunks.append(chunk)
            got += len(chunk)
            nxt = bnxt
        streams[sid] = b"".join(chunks)[:total]
    return streams


def _dir_entries(root: bytes, streams: dict | None = None) -> list:
    """(name, node-header stream id) pairs from the root folder stream.

    The stream id is read from a fixed offset before the name marker, which
    is layout-dependent; when ``streams`` is given, entries whose id does
    not resolve to a parsed stream containing the data/codec markers are
    dropped so callers fall through to the conversion-guidance error rather
    than misreading an unfamiliar record layout."""
    entries = []
    pos = 0
    while True:
        i = root.find(_DIR_MARKER, pos)
        if i < 0:
            break
        ln = root[i + 4]
        name = root[i + 5:i + 5 + ln]
        pos = i + 5 + ln
        if i < 14:
            continue
        sid = _u(root[i - 14:i - 10])
        if streams is not None:
            hdr = streams.get(sid)
            if hdr is None or (_DATA_MARKER not in hdr
                               and _CODER_MARKER not in hdr):
                continue
        try:
            entries.append((name.decode("ascii"), sid))
        except UnicodeDecodeError:
            pass
    return entries


def _file_format(root: bytes) -> str:
    """The FileFormat attribute stored on the root folder."""
    # layout: "FileFormat" [type tag 0x0e] [len u8] [chars]; scan past
    # stray matches (e.g. inside string data) missing the type tag
    pos = 0
    while True:
        i = root.find(b"FileFormat", pos)
        if i < 0:
            return ""
        if i + 12 <= len(root) and root[i + 10] == 0x0E:
            ln = root[i + 11]
            return root[i + 12:i + 12 + ln].decode("ascii", "replace")
        pos = i + 10


def _node_info(hdr: bytes):
    """(codec name, data stream id) from a node-header stream."""
    coder = ""
    i = hdr.find(_CODER_MARKER)
    if i >= 0:
        ln = hdr[i + 4]
        coder = hdr[i + 5:i + 5 + ln].decode("ascii", "replace")
    j = hdr.find(_DATA_MARKER)
    data_sid = _u(hdr[j + 4:j + 8]) if j >= 0 else None
    return coder, data_sid


def _decode_payload(payload: bytes, coder: str, name: str) -> bytes:
    if coder == "":
        return payload
    if coder == "ZIP":
        dec = zlib.decompressobj()
        return dec.decompress(payload)
    if coder == "LZMA":
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
        return dec.decompress(payload)
    raise NotImplementedError(
        f"GDS node {name!r} uses the {coder!r} codec; only ZIP, LZMA and "
        "uncompressed storage are supported — convert to VCF/BED first "
        "(in R: SNPRelate::snpgdsGDS2BED).")


def read_gds(path: str, import_chr: str = "xMHC",
             assembly: str = "hg19") -> SNPGenoData:
    """Read a SNPRelate SNP_ARRAY GDS file into SNPGenoData."""
    from .bed import select_region

    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"not a CoreArray GDS file: {path}")
    streams = _parse_streams(data)
    if 1 not in streams:
        raise ValueError(f"no root folder stream in GDS file: {path}")
    root = streams[1]
    fmt = _file_format(root)
    if fmt and fmt != "SNP_ARRAY":
        raise NotImplementedError(
            f"GDS FileFormat {fmt!r} is not supported (only SNP_ARRAY); "
            "convert with SeqArray/SNPRelate to VCF or PLINK BED first.")
    entries = dict(_dir_entries(root, streams))
    missing = [n for n in _EXPECTED if n not in entries]
    if missing:
        raise NotImplementedError(
            f"GDS file lacks expected SNP_ARRAY nodes {missing} "
            f"(found {sorted(entries)}); convert to VCF/BED first.")

    by_name = {}
    for name in _EXPECTED:
        hdr = streams.get(entries[name])
        if hdr is None:
            raise ValueError(f"GDS node {name!r} has no header stream")
        coder, data_sid = _node_info(hdr)
        if data_sid is None or data_sid not in streams:
            raise ValueError(f"GDS node {name!r} has no data stream")
        by_name[name] = _decode_payload(streams[data_sid], coder, name)

    sample_id = by_name["sample.id"].decode().rstrip("\x00").split("\x00")
    snp_id = by_name["snp.id"].decode().rstrip("\x00").split("\x00")
    position = np.frombuffer(by_name["snp.position"], dtype="<i4")
    chrom = np.frombuffer(by_name["snp.chromosome"], dtype="<i4")
    allele = by_name["snp.allele"].decode().rstrip("\x00").split("\x00")
    gb = np.frombuffer(by_name["genotype"], dtype=np.uint8)

    n_samp, n_snp = len(sample_id), len(snp_id)
    if not (len(position) == len(chrom) == len(allele) == n_snp):
        raise ValueError("inconsistent SNP annotation lengths in GDS file")
    codes = np.stack([(gb >> (2 * k)) & 3 for k in range(4)],
                     axis=1).reshape(-1)
    if len(codes) < n_snp * n_samp:
        raise ValueError("genotype payload shorter than n_snp * n_samp")
    geno = codes[:n_snp * n_samp].reshape(n_snp, n_samp).astype(np.uint8)
    geno[geno == 3] = GENO_MISSING

    keep = select_region(chrom.astype(str).astype(object),
                         position.astype(np.int64), import_chr, assembly)
    if keep.sum() == 0:
        raise ValueError("no SNPs in the requested region")
    return SNPGenoData(
        genotype=geno[keep],
        sample_id=np.asarray(sample_id, dtype=object),
        snp_id=np.asarray(snp_id, dtype=object)[keep],
        snp_position=position.astype(np.int64)[keep],
        snp_allele=np.asarray(allele, dtype=object)[keep],
        assembly=assembly)
