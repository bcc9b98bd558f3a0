import numpy as np
import pytest

from hibag_tpu.data.allele import HLATypeTable
from hibag_tpu.eval.compare import compare_alleles, confusion_em


def _table(ids, a1, a2, locus="A"):
    return HLATypeTable.from_alleles(ids, a1, a2, locus=locus)


def test_perfect_prediction():
    ids = [f"s{i}" for i in range(4)]
    t = _table(ids, ["01:01", "02:01", "01:01", "03:01"],
               ["02:01", "02:01", "03:01", "03:01"])
    r = compare_alleles(t, t)
    assert r.overall["acc.ind"] == 1.0
    assert r.overall["acc.haplo"] == 1.0
    assert r.overall["call.rate"] == 1.0
    np.testing.assert_allclose(np.diag(r.confusion[:len(r.alleles)]),
                               r.detail["valid.num"])


def test_half_accuracy_and_confusion():
    ids = ["s0", "s1"]
    t = _table(ids, ["01:01", "01:01"], ["02:01", "02:01"])
    p = _table(ids, ["01:01", "03:01"], ["03:01", "02:01"])
    r = compare_alleles(t, p)
    assert r.overall["acc.haplo"] == 0.5
    assert r.overall["acc.ind"] == 0.0
    # miscalled allele shows up in the confusion (off-diagonal or '...' row)
    total = r.confusion.sum()
    np.testing.assert_allclose(total, 4.0)


def test_call_threshold():
    ids = ["s0", "s1"]
    t = _table(ids, ["01:01", "01:01"], ["02:01", "02:01"])
    p = _table(ids, ["01:01", "01:01"], ["02:01", "02:01"])
    p.prob = np.array([0.9, 0.3])
    r = compare_alleles(t, p, call_threshold=0.5)
    assert r.overall["n.call"] == 1
    assert r.overall["call.rate"] == 0.5
    assert r.overall["acc.haplo"] == 1.0


def test_max_resolution_truncation():
    ids = ["s0"]
    t = _table(ids, ["01:01:01"], ["02:01:05"])
    p = _table(ids, ["01:01:02"], ["02:01:88"])
    r_full = compare_alleles(t, p)
    assert r_full.overall["acc.haplo"] == 0.0
    r_4d = compare_alleles(t, p, max_resolution="4-digit")
    assert r_4d.overall["acc.haplo"] == 1.0


def test_confusion_em_redistribution():
    init = np.zeros((3, 2))
    # one double-miscall: true (0,1), predicted (both allele idx 2='...')
    out = confusion_em(2, init, [(0, 1, 2, 2)])
    np.testing.assert_allclose(out[2, 0], 1.0)
    np.testing.assert_allclose(out[2, 1], 1.0)
    np.testing.assert_allclose(out.sum(), 2.0)


def test_individual_output():
    ids = ["s0", "s1"]
    t = _table(ids, ["01:01", "01:01"], ["02:01", "02:01"])
    p = _table(ids, ["01:01", "03:01"], ["02:01", "03:01"])
    r = compare_alleles(t, p, output_individual=True)
    np.testing.assert_allclose(r.individual["accuracy"], [1.0, 0.0])
