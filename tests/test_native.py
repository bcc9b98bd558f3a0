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
