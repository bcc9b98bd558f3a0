import numpy as np
import pytest

from hibag_tpu.data.allele import HLATypeTable
from hibag_tpu.eval.assoc import assoc_test, glm_fit


@pytest.fixture
def cohort():
    rng = np.random.default_rng(1)
    n = 400
    alleles = ["01:01", "02:01", "03:01", "24:02"]
    a1 = rng.choice(alleles, n, p=[0.4, 0.3, 0.2, 0.1])
    a2 = rng.choice(alleles, n, p=[0.4, 0.3, 0.2, 0.1])
    # risk allele 02:01 doubles odds
    carrier = (a1 == "02:01") | (a2 == "02:01")
    logit = -1.0 + 1.2 * carrier
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(int)
    t = HLATypeTable.from_alleles([f"s{i}" for i in range(n)], a1, a2,
                                  locus="A")
    return t, y, carrier


def test_binary_dominant(cohort):
    t, y, carrier = cohort
    res = assoc_test(t, y, model="dominant", show_or=True)
    assert res["binary"]
    row = next(r for r in res["table"] if r["allele"] == "02:01")
    assert row["chisq.p"] < 0.01
    assert row["fisher.p"] < 0.01
    assert row["h_OR.est"] > 1.5          # odds ratio recovered
    assert row["h.pval"] < 0.01
    # non-risk allele should not be strongly associated
    null_rows = [r for r in res["table"] if r["allele"] == "01:01"]
    assert null_rows[0]["chisq.p"] > 1e-4


def test_quantitative_additive(cohort):
    t, y, carrier = cohort
    rng = np.random.default_rng(2)
    n1 = (t.allele1 == "03:01").astype(int) + (t.allele2 == "03:01").astype(int)
    q = 1.0 * n1 + rng.normal(0, 1, t.n_samp)
    res = assoc_test(t, q, model="additive")
    row = next(r for r in res["table"] if r["allele"] == "03:01")
    assert row["ttest.p"] < 1e-4
    assert abs(row["h.est"] - 1.0) < 0.4


def test_genotype_model(cohort):
    t, y, _ = cohort
    res = assoc_test(t, y, model="genotype")
    row = res["table"][0]
    assert "[-/h]" in row and "[h/h]" in row
    assert row["[-/-]"] + row["[-/h]"] + row["[h/h]"] == t.n_samp


def test_covariate_adjustment(cohort):
    t, y, carrier = cohort
    age = np.random.default_rng(3).normal(50, 10, t.n_samp)
    res = assoc_test(t, y, covariates={"age": age}, model="dominant")
    row = next(r for r in res["table"] if r["allele"] == "02:01")
    assert "age.est" in row and row["h.pval"] < 0.01


def test_glm_fit_logistic_recovers_beta():
    rng = np.random.default_rng(0)
    n = 2000
    x = rng.normal(size=n)
    X = np.column_stack([np.ones(n), x])
    p = 1 / (1 + np.exp(-(0.5 + 1.5 * x)))
    y = (rng.random(n) < p).astype(float)
    beta, cov, ok = glm_fit(X, y, "binomial")
    assert ok
    assert abs(beta[1] - 1.5) < 0.2


def test_aa_assoc(hla_types):
    from hibag_tpu.data.allele import HLATypeTable
    from hibag_tpu.eval.assoc import aa_assoc_test
    from hibag_tpu.seq.aa import convert_table
    t = HLATypeTable.from_alleles(
        hla_types["sample.id"], hla_types["A.1"], hla_types["A.2"],
        locus="A")
    aa = convert_table(t, "/root/reference/inst/extdata/v3.22.0",
                       code="P.code.merge")
    rng = np.random.default_rng(5)
    y = rng.integers(0, 2, t.n_samp)
    rows = aa_assoc_test(aa, y)
    assert len(rows) > 10
    ps = [r["chisq.p"] for r in rows if "chisq.p" in r]
    assert len(ps) > 5 and all(0 <= p <= 1 for p in ps)


def test_format_assoc(cohort):
    from hibag_tpu.eval.assoc import format_assoc
    t, y, _ = cohort
    res = assoc_test(t, y, model="dominant")
    s = format_assoc(res)
    assert "chisq.p" in s.splitlines()[0]
    assert "*" in s  # the planted association is significant
    assert "-----" in s or len(s.splitlines()) == len(res["table"]) + 1
