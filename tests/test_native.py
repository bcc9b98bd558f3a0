"""Native C++ runtime vs NumPy fallback equivalence."""

import numpy as np
import pytest

from hibag_tpu.io import native


def test_lib_loaded():
    assert native.get_lib() is not None, "native library should be built"


def test_bed_decode_matches_fallback():
    rng = np.random.default_rng(0)
    n_snp, n_samp = 200, 37
    stride = (n_samp + 3) // 4
    raw = rng.integers(0, 256, n_snp * stride).astype(np.uint8)
    keep = np.sort(rng.choice(n_snp, 50, replace=False))
    a = native.bed_decode(raw, n_snp, n_samp, keep)
    lib = native._LIB
    native._LIB = None
    try:
        b = native.bed_decode(raw, n_snp, n_samp, keep)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(a, b)


def test_align_codes_matches_fallback():
    rng = np.random.default_rng(1)
    geno = rng.integers(0, 4, (100, 23)).astype(np.int8)
    src = rng.integers(-1, 100, 64).astype(np.int64)
    flip = rng.integers(0, 2, 64).astype(np.uint8)
    a = native.align_codes(geno, src, flip)
    lib = native._LIB
    native._LIB = None
    try:
        b = native.align_codes(geno, src, flip)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(a, b)
    # semantic spot-checks
    assert (a[:, src < 0] == 3).all()
    j = int(np.nonzero((src >= 0) & (flip == 1))[0][0])
    col = geno[src[j]]
    exp = np.where(col <= 2, 2 - col, 3)
    np.testing.assert_array_equal(a[:, j], exp)


def test_snp_stats_matches_fallback():
    rng = np.random.default_rng(2)
    geno = rng.integers(0, 4, (500, 61)).astype(np.int8)
    f1, m1 = native.snp_stats(geno)
    lib = native._LIB
    native._LIB = None
    try:
        f2, m2 = native.snp_stats(geno)
    finally:
        native._LIB = lib
    np.testing.assert_allclose(f1, f2)
    np.testing.assert_allclose(m1, m2)


def test_vcf_gt_codes_malformed_tokens_match_fallback():
    """Non-numeric allele tokens must make the CELL missing (the Python
    fallback's int() ValueError path), not be silently skipped."""
    from hibag_tpu.io.native import get_lib, vcf_gt_codes

    if get_lib() is None:
        pytest.skip("native lib not built")
    #           s1     s2     s3   s4    s5     s6
    cells = b"1/A\tA/1\t0/1\t.\t1|.\t22/0"
    g = vcf_gt_codes(cells, 0, 6)
    assert g is not None
    # Python fallback semantics: 1/A and A/1 -> missing; 0/1 -> 1 REF;
    # "." -> missing; "1|." -> 0 REF; "22/0" -> 1 REF copy
    assert g.tolist() == [3, 3, 1, 3, 0, 1]


def test_vcf_gt_codes_gt_not_first_field():
    from hibag_tpu.io.native import get_lib, vcf_gt_codes

    if get_lib() is None:
        pytest.skip("native lib not built")
    cells = b"9:0/0\t3:1/B\t7:./."
    g = vcf_gt_codes(cells, 1, 3)
    assert g is not None
    assert g.tolist() == [2, 3, 3]


def test_bed_decode_rejects_truncated_payload():
    """A truncated .bed (or mismatched .bim/.fam counts) must raise a
    clean error before reaching the unchecked C++ kernel."""
    from hibag_tpu.io.native import bed_decode

    raw = np.zeros(10, dtype=np.uint8)        # 2 SNPs x 5 samples needs 4
    with pytest.raises(ValueError, match="too short"):
        bed_decode(raw[:3], 2, 5, np.array([0, 1]))
    with pytest.raises(ValueError, match="out of range"):
        bed_decode(raw, 2, 5, np.array([0, 2]))
