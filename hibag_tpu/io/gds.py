"""GDS (CoreArray) import — limited support.

The reference's hlaGDS2Geno (R/DataUtilities.R:787) reads SNPRelate
"SNP_ARRAY" and SeqArray "SEQ_ARRAY" GDS files via the gdsfmt R package.
CoreArray is a complex container format (block streams, per-node codecs);
this module currently supports conversion via an intermediate export rather
than parsing CoreArray natively:

  * In R:  ``SNPRelate::snpgdsGDS2BED(gdsfile, "out")`` then ``read_bed``.
  * Or export genotypes to a VCF/text matrix and build ``SNPGenoData``
    directly.

``read_gds`` raises ImportError with this guidance so pipelines fail
loudly instead of silently skipping GDS inputs.

Format notes from a partial reverse-engineering of the bundled
HapMap_CEU_Chr6.gds (for a future native reader): 12-byte magic
"COREARRAYx0A" + u16 version; block segments headed by
[id:u32][size:u48 with bit47 head-flag]; the root folder block lists
entries as [entry_len:u48][...type info...][data_block_id:u32]
[class tag][len-prefixed name] with data block ids 2,4,6,... for
sample.id/snp.id/snp.position/snp.chromosome/snp.allele/genotype; data
streams are "ZIP" (zlib) compressed with length fields preceding the
payload.
"""

from __future__ import annotations


def read_gds(path: str, import_chr: str = "xMHC", assembly: str = "hg19"):
    raise ImportError(
        "Native CoreArray/GDS parsing is not implemented yet. Convert the "
        "GDS file to PLINK BED first (in R: SNPRelate::snpgdsGDS2BED) and "
        "use hibag_tpu.read_bed, or construct SNPGenoData from an exported "
        f"matrix. (file: {path})")
