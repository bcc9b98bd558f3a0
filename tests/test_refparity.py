"""Reference-parity tests: the compiled reference kernel vs this framework.

These tests build the REAL HIBAG kernel from /root/reference/src (cached
objects in /tmp/hibag_refbench) and drive it through scripts/refbench/
parity.cpp with a bit-exact R-RNG replica, then compare its classifiers and
posteriors against ours. They convert the project's central claim — "same
model estimates and calls as HIBAG kernel v1.5" — from asserted to measured.

Comparisons run in subprocesses because the f64 paths need jax_enable_x64,
which is process-global.

The (locus, seed) pairs asserted for FULL trajectory equality are ones
where no exact-floating-tie argmax flip occurs (see docs/DEVIATIONS.md #1:
the reference's own SIMD targets disagree at such ties; "base" is the
order-defining scalar kernel). A broad 6-locus sweep (docs/
PARITY_SWEEP.json) measured 13/36 (locus, seed, classifier) combos fully
trajectory-identical — including ALL SIX DQA1 combos — with haplotype
sets exactly equal, freqs at MACHINE EPSILON (<= 6e-16; the init-scale
fix took this down from ~5e-11) and OOB accuracy bit-equal; the rest
diverge only AT a tie flip (long identical prefixes, bootstrap always
identical when stream positions align).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, "scripts", "parity.py")


def _run(args, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, PARITY] + args,
                       capture_output=True, text=True, timeout=timeout,
                       env=env)
    if r.returncode != 0:
        pytest.fail(f"parity.py {args} failed:\n{r.stderr[-3000:]}")
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.fixture(scope="session")
def refparity_bin():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import parity
    b = parity.ensure_built()
    if b is None:
        pytest.skip("reference kernel toolchain unavailable")
    return b


def test_rng_stream_identical(refparity_bin):
    """The C++ driver's R-RNG replica and RRng agree draw-for-draw, so both
    engines consume the identical stream."""
    res = _run(["rng", "--seed", "100"])
    assert res["identical"]


@pytest.mark.parametrize("locus,seed,ncls", [
    ("DRB1", 102, 2),
    ("A", 102, 1),
    ("DQB1", 100, 2),
    ("DQA1", 100, 2),
])
def test_train_trajectory_parity(refparity_bin, locus, seed, ncls):
    """Identical RNG streams -> identical bootstrap counts, accepted-SNP
    sequences, haplotype sets, f64 freqs (<=1e-14) and bit-equal OOB
    accuracy vs the compiled reference kernel (target "base")."""
    res = _run(["train", "--locus", locus, "--seed", str(seed),
                "--ncls", str(ncls)], timeout=1800)
    for k, c in enumerate(res["classifiers"]):
        assert c["bootstrap_equal"], (k, c)
        assert c["snpidx_equal"], (k, c)
        assert c["hapset_equal"], (k, c)
        assert c["freq_max_abs_diff"] <= 1e-14, (k, c)
        assert c["acc_equal"], (k, c)


@pytest.mark.parametrize("locus,seed", [
    ("B", 101),     # the round-3 tie-flip anatomy combo (DEVIATIONS.md #3)
    ("C", 101),
])
def test_train_trajectory_parity_ordered_bitwise(refparity_bin, locus,
                                                 seed):
    """eval_mode="ordered" (native hibag_ordered_step: the reference's
    exact serial summation orders for EM, rare-erase and evaluation, built
    without FP contraction) makes the trajectory BITWISE identical to the
    compiled reference — including on tie-dense combos where the device
    eval's reduction order flips exact floating ties.  The full 36-combo
    sweep measured 36/36 identical with freq_max_abs_diff exactly 0.0
    (docs/PARITY_SWEEP_ORDERED.json)."""
    from hibag_tpu.io.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "hibag_ordered_step"):
        pytest.skip("native library unavailable")
    res = _run(["train", "--locus", locus, "--seed", str(seed),
                "--ncls", "2", "--eval", "ordered"], timeout=1800)
    for k, c in enumerate(res["classifiers"]):
        assert c["bootstrap_equal"], (k, c)
        assert c["snpidx_equal"], (k, c)
        assert c["hapset_equal"], (k, c)
        assert c["freq_max_abs_diff"] == 0.0, (k, c)
        assert c["acc_equal"], (k, c)


def test_predict_parity_with_missing(refparity_bin):
    """The missing-genotype paths agree with the reference kernel: 12.5%
    of model SNPs dropped entirely (per-classifier weighting, reference
    src/LibHLA.cpp:2407-2428) plus 25% scattered missing calls, identical
    masked matrix fed to both engines (measured ~2.7e-11 max abs diff,
    60/60 best guesses identical)."""
    res = _run(["predict", "--locus", "A", "--missing", "0.25"],
               timeout=1200)
    assert res["missing"] == 0.25
    assert res["best_guess_identical"] == res["best_guess_total"] == 60
    assert res["postprob_max_abs_diff"] <= 1e-9
    assert res["matching_max_abs_diff"] <= 1e-9
    assert res["dosage_max_abs_diff"] <= 1e-9


def test_predict_majority_vote_parity(refparity_bin):
    """Majority voting (reference vote_method=2, src/LibHLA.cpp:2460-2476)
    agrees with the reference kernel: identical ensemble best guesses and
    matching on all 60 CEU samples. The vote MATRIX may differ by a few
    whole votes: measured 3 flips, each verified to sit on an in-classifier
    knife-edge tie (top-2 posterior pairs equal to <1e-9 relative), where
    tie resolution is summation-order-defined (docs/DEVIATIONS.md #8)."""
    res = _run(["predict", "--locus", "A", "--vote", "majority"],
               timeout=1200)
    assert res["vote"] == "majority"
    assert res["best_guess_identical"] == res["best_guess_total"] == 60
    assert res["matching_max_abs_diff"] <= 1e-9
    # vote diffs are whole votes (units of 1/n_classifiers), few in number
    d = res["postprob_max_abs_diff"] * res["n_classifiers"]
    assert d <= 5.0 and abs(d - round(d)) < 1e-6, d


@pytest.mark.parametrize("locus", ["A", "DRB1"])
def test_predict_posterior_parity(refparity_bin, locus):
    """Posteriors, matching and best-guess calls agree with the reference
    kernel on all 60 CEU samples (<=1e-9; measured ~2e-11 / ~2e-12): the
    bundled 100-classifier published model for HLA-A, and a model trained
    HERE then injected into the reference's Assign path for DRB1 (round-
    trip of our classifiers through the reference kernel)."""
    res = _run(["predict", "--locus", locus], timeout=1200)
    assert res["n_classifiers"] == (100 if locus == "A" else 4)
    assert res["best_guess_identical"] == res["best_guess_total"] == 60
    assert res["postprob_max_abs_diff"] <= 1e-9
    assert res["maxprob_max_abs_diff"] <= 1e-9
    assert res["matching_max_abs_diff"] <= 1e-9
    assert res["dosage_max_abs_diff"] <= 1e-9
