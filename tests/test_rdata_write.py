"""RData writer: XDR serialization roundtrips and R-HIBAG model export.

The writer (hibag_tpu/io/rdata.py:_Writer) mirrors the reader; these tests
prove (a) plain-value and RObj-tree roundtrips through write_rdata →
read_rdata, (b) the bundled ModelList.RData re-serializes to a deep-equal
structure, and (c) save_rdata exports a model whose re-import predicts
identically (the hlaModelToObj + save() flow, reference R/HIBAG.R:1041,
R/DataUtilities.R:2083-2096).
"""

import numpy as np
import pytest

from hibag_tpu.io.rdata import (r_dataframe, r_to_py, read_rdata,
                                write_rdata)

MODELLIST = "/root/reference/inst/extdata/ModelList.RData"


def _deep_eq(a, b, path=""):
    assert type(a) is type(b) or (
        isinstance(a, (dict,)) and isinstance(b, (dict,))) or (
        isinstance(a, np.ndarray) and isinstance(b, np.ndarray)), \
        f"{path}: {type(a)} vs {type(b)}"
    if isinstance(a, dict):
        assert list(a) == list(b), f"{path}: keys {list(a)} vs {list(b)}"
        for k in a:
            _deep_eq(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, np.ndarray):
        assert a.shape == b.shape, path
        if a.dtype == object or b.dtype == object:
            assert list(a.ravel()) == list(b.ravel()), path
        elif np.issubdtype(a.dtype, np.floating):
            np.testing.assert_array_equal(a, b, err_msg=path)
        else:
            np.testing.assert_array_equal(a, b, err_msg=path)
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _deep_eq(x, y, f"{path}[{i}]")
    else:
        assert a == b or (a is None and b is None), f"{path}: {a!r} vs {b!r}"


def test_write_roundtrip_primitives(tmp_path):
    p = str(tmp_path / "prims.RData")
    objs = {
        "ints": np.arange(5, dtype=np.int64),
        "reals": np.array([1.5, np.nan, -2.0]),
        "strs": np.array(["a", None, "ccc"], dtype=object),
        "lgl": np.array([True, False, True]),
        "nested": {"x": 1, "y": "two", "z": [1.0, 2.0]},
        "nil": None,
        "scalar": 3.25,
        "df": r_dataframe({"a": np.array([1, 2], np.int64),
                           "b": np.array(["u", "v"], dtype=object)}),
    }
    write_rdata(p, objs)
    back = {k: r_to_py(v) for k, v in read_rdata(p).items()}
    np.testing.assert_array_equal(back["ints"], objs["ints"])
    np.testing.assert_array_equal(back["reals"], objs["reals"])
    assert list(back["strs"]) == ["a", None, "ccc"]
    np.testing.assert_array_equal(np.asarray(back["lgl"]), [1, 0, 1])
    assert back["nested"]["x"] == 1
    assert list(back["nested"]["y"]) == ["two"]
    np.testing.assert_array_equal(back["nested"]["z"], [1.0, 2.0])
    assert back["nil"] is None
    np.testing.assert_array_equal(back["scalar"], [3.25])
    assert list(back["df"]["a"]) == [1, 2]
    assert list(back["df"]["b"]) == ["u", "v"]


def test_write_rds_roundtrip(tmp_path):
    from hibag_tpu.io.rdata import read_rds, write_rds
    p = str(tmp_path / "obj.rds")
    write_rds(p, {"v": np.arange(3, dtype=np.int64), "s": "hi"})
    back = r_to_py(read_rds(p))
    np.testing.assert_array_equal(back["v"], [0, 1, 2])
    assert list(back["s"]) == ["hi"]


def test_reserialize_bundled_modellist(tmp_path):
    """The bundled R-written ModelList re-serializes to a deep-equal
    structure (RObj trees pass through the writer with attributes)."""
    orig = read_rdata(MODELLIST)
    p = str(tmp_path / "ml.RData")
    write_rdata(p, orig)
    back = read_rdata(p)
    assert list(back) == list(orig)
    _deep_eq(r_to_py(back["modellist"]), r_to_py(orig["modellist"]))
    # class attributes survive (hlaAttrBagObj on each model, data.frame
    # on each haplos)
    a = back["modellist"].data[0]
    assert a.rclass == ["hlaAttrBagObj"]
    names = a.attr("names")
    cl = a.data[names.index("classifiers")]
    h0 = cl.data[0]
    haplos = h0.data[h0.attr("names").index("haplos")]
    assert haplos.rclass == ["data.frame"]
    rn = haplos.attr("row.names")
    assert rn[0] == -2147483648 and rn[1] < 0          # compact row.names


def test_save_rdata_model_roundtrip(tmp_path):
    """save_rdata → read_rdata → from_hibag_obj reproduces the model
    exactly (classifier bits, freqs, snp indices, OOB) and predicts
    identically."""
    import hibag_tpu
    from hibag_tpu import save_rdata
    from hibag_tpu.models.model import AttrBagModel

    ml = r_to_py(read_rdata(MODELLIST)["modellist"])
    model = AttrBagModel.from_hibag_obj(ml["A"], locus="A")
    p = str(tmp_path / "export.RData")
    save_rdata(model, p)
    back = r_to_py(read_rdata(p)["mobj"])
    model2 = AttrBagModel.from_hibag_obj(back, locus="A")

    assert model2.n_classifiers == model.n_classifiers
    for c1, c2 in zip(model.classifiers, model2.classifiers):
        np.testing.assert_array_equal(c1.snp_index, c2.snp_index)
        np.testing.assert_array_equal(c1.hap_bits, c2.hap_bits)
        np.testing.assert_array_equal(c1.hap_freq, c2.hap_freq)
        np.testing.assert_array_equal(c1.hap_allele, c2.hap_allele)
        assert c1.oob_accuracy == pytest.approx(c2.oob_accuracy, abs=0)

    geno = hibag_tpu.SNPGenoData.from_hibag_r(r_to_py(read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    r1 = hibag_tpu.predict(model, geno)
    r2 = hibag_tpu.predict(model2, geno)
    assert list(r1.allele1) == list(r2.allele1)
    assert list(r1.allele2) == list(r2.allele2)
    np.testing.assert_array_equal(r1.prob, r2.prob)


def test_save_rdata_modellist(tmp_path):
    """A {locus: model} dict saves in the bundled ModelList layout."""
    from hibag_tpu import save_rdata
    from hibag_tpu.models.model import AttrBagModel

    ml = r_to_py(read_rdata(MODELLIST)["modellist"])
    model = AttrBagModel.from_hibag_obj(ml["A"], locus="A")
    p = str(tmp_path / "mlist.RData")
    save_rdata({"A": model}, p)
    back = read_rdata(p)["modellist"]
    assert back.attr("names") == ["A"]
    assert back.data[0].rclass == ["hlaAttrBagObj"]
    m2 = AttrBagModel.from_hibag_obj(r_to_py(back)["A"], locus="A")
    assert m2.n_classifiers == model.n_classifiers


def test_write_roundtrip_matrix(tmp_path):
    """Multi-dim arrays serialize as R matrices: F-order data + dim attr
    (a len()-vs-size mismatch used to corrupt the stream)."""
    from hibag_tpu.io.rdata import read_rds, write_rds

    p = str(tmp_path / "m.rds")
    m = np.arange(12, dtype=np.float64).reshape(3, 4)
    m[1, 2] = np.nan
    write_rds(p, {"m": m, "i": np.arange(6, dtype=np.int32).reshape(2, 3),
                  "v": np.array([1.0, 2.0])})
    back = r_to_py(read_rds(p))
    assert back["m"].shape == (3, 4)
    assert np.isnan(back["m"][1, 2])
    assert np.array_equal(back["m"][~np.isnan(m)], m[~np.isnan(m)])
    assert back["i"].shape == (2, 3)
    assert np.array_equal(back["i"], np.arange(6).reshape(2, 3))
    assert np.array_equal(back["v"], [1.0, 2.0])
