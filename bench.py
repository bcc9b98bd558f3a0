"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: classifiers trained per second on the BASELINE.json config[0]
workload — HapMap CEU HLA-A, 60 samples, ~1000 flanking SNPs, 25-classifier
ensemble. Secondary metrics (prediction throughput) are included as extra
fields.

`vs_baseline` is measured against the REFERENCE CPU KERNEL: the actual
HIBAG v1.5 kernel (LibHLA.cpp + its AVX-512 target files) compiled from
/root/reference/src with a stub R layer (scripts/refbench/) and timed on
this image's host CPU on the *same exported workload* (see BASELINE.md
"Measured reference baselines"). The strongest measured target
(AVX512VPOPCNTDQ) is used as the denominator — the conservative choice.
"""

import json
import os
import sys
import time

import numpy as np


def _stage(msg: str) -> None:
    """Progress to stderr (stdout carries only the final JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()

# persistent compilation cache: retries/repeat runs skip the remote-compile
# cost when the backend supports executable serialization
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

#: soft deadline: skip optional metrics if the mandatory ones took too long
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "420"))

#: hard watchdog: if the remote-TPU tunnel is down, the first device op
#: blocks forever — emit an explicit failure line and exit instead of
#: hanging the driver (disarmed once the mandatory metric is measured)
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "2400"))
_watchdog_armed = True


def _wait_for_tpu(budget_s: float) -> bool:
    """Probe the TPU tunnel in throwaway subprocesses until a device op
    succeeds or the budget runs out. The tunnel endpoint drops for hours
    at a time (observed: even jax.devices() blocks forever in-process),
    so the bench waits for recovery instead of hanging into the watchdog.
    Returns True when the tunnel answered."""
    import subprocess

    probe = "import jax; jax.devices(); print('ok')"
    t0 = time.time()
    first = True
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=180)
            if r.returncode == 0 and b"ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if first:
            _stage("TPU tunnel unresponsive; waiting for recovery "
                   f"(up to {budget_s:.0f}s)")
            first = False
        if time.time() - t0 >= budget_s:
            return False
        time.sleep(45)


def _arm_watchdog() -> None:
    import threading

    def fire():
        if _watchdog_armed:
            print(json.dumps({
                "metric": "train_classifiers_per_s", "value": None,
                "unit": "classifiers/s", "vs_baseline": None,
                "error": f"watchdog: no training metric after "
                         f"{WATCHDOG_S:.0f}s (TPU tunnel down?)"}),
                flush=True)
            os._exit(3)

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()

# Measured reference-kernel numbers on THIS image's CPU (4-core AVX-512
# Xeon; scripts/refbench, data via scripts/export_baseline_data.py
# "nearest:1000" = the exact config[0] workload, 60 samp x 976 SNP):
#   train  (25 cls):   AVX512BW 3.72-3.79 cls/s (1t/4t), VPOPCNT 4.49 cls/s
#   predict(100 cls, 3840 samp, 4t): AVX512BW 2522/s, VPOPCNT 3477/s
# Denominators = the best measured target (AVX512VPOPCNTDQ).
REF_TRAIN_CLS_PER_S = 4.49
REF_PREDICT_SAMPLES_PER_S = 3477.0
#: reference at the matched mid-scale shape (1,000 samp x 266 SNP, 8 cls,
#: VPOPCNT 4 threads — BASELINE.md "Measured reference baselines")
REF_TRAIN_MID_CLS_PER_S = 0.36
REF_CPU = "AVX512VPOPCNTDQ, 4 cores (scripts/refbench)"


def main():
    global _watchdog_armed
    # only probe when the axon (remote TPU) plugin is on the path — CPU
    # runs must not burn the wait budget
    if any(".axon_site" in p
           for p in os.environ.get("PYTHONPATH", "").split(":")):
        if not _wait_for_tpu(float(os.environ.get(
                "BENCH_TUNNEL_WAIT_S", "5400"))):
            print(json.dumps({
                "metric": "train_classifiers_per_s", "value": None,
                "unit": "classifiers/s", "vs_baseline": None,
                "error": "TPU tunnel unresponsive for the whole wait "
                         "budget (device probe never returned)"}),
                flush=True)
            return 3
    # the optional-metric deadline starts AFTER any tunnel wait — waiting
    # must not eat the measurement budget
    T_START = time.time()
    _arm_watchdog()
    import hibag_tpu
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.models.predict import predict
    from hibag_tpu.models.model import AttrBagModel
    from hibag_tpu.utils.bench_data import (headline_1000snp, load_ceu,
                                            midscale_1000x266)

    # ---- endpoint calibration probe --------------------------------------
    # remote-tunnel DISPATCH latency varies ~1.8x BETWEEN endpoints
    # (identical code measured 18.1 vs 27.2 cls/s across sessions) — record
    # a fixed tiny-kernel round-trip time so cross-round vs_baseline
    # numbers can be normalized for the endpoint draw
    endpoint_probe_ms = None
    try:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _probe(x):
            return (x @ x).sum()

        x = jnp.ones((128, 128), jnp.float32)
        _probe(x).block_until_ready()           # compile
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            _probe(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        endpoint_probe_ms = round(best * 1e3, 2)
        _stage(f"endpoint probe: {endpoint_probe_ms} ms/dispatch")
    except Exception:
        pass

    hla, geno = load_ceu()
    # ~1000 SNPs nearest the HLA-A locus (config[0] workload)
    fg = headline_1000snp(geno)

    # ---- training throughput (fused on-device growth loop) ---------------
    # the whole 25-classifier batch trains in ONE device dispatch; the first
    # run is the compile warmup (kernel shapes are pinned by hcap/max_steps)
    from hibag_tpu.models.train import train_parallel
    n_cls = 25
    # hcap=128 fits this workload's live haplotype count with NO overflow
    # (measured seed 100, post init-frequency-scale fix) — the sweep
    # (scripts/profile_train.py 96 128 160) measured 26.5 cls/s at 128 vs
    # 16.4 at 96 (8/25 retries) and 13.6 at 160 (non-pow2 slots tile onto
    # a larger bucket). on_overflow="freeze" keeps semantics exact if a
    # different seed does overflow; any retry cost lands in the timing
    kw = dict(n_classifiers=n_cls, batch=n_cls, verbose=False,
              with_matching=False, mode="fused", hcap=128, max_steps=192,
              on_overflow="freeze")
    _stage("training warmup (compile)")
    train_parallel(hla, fg, seed=1, **kw)
    _stage("training warm reps")
    # best-of-5: remote-tunnel dispatch latency varies session to session;
    # the best repetition reflects the device, not the tunnel's mood
    train_s = float("inf")
    for rep in range(5):
        t0 = time.time()
        model = train_parallel(hla, fg, seed=100, **kw)
        train_s = min(train_s, time.time() - t0)
    cls_per_s = n_cls / train_s
    _watchdog_armed = False          # mandatory metric measured
    _stage(f"training done: {cls_per_s:.2f} cls/s")

    # ---- prediction throughput (100-classifier published model) ---------
    # optional: skipped when the training portion ate the time budget
    samp_per_s = float("nan")
    cohort_samp_per_s = float("nan")
    exp_roofline_pct = float("nan")
    predict_acc = float("nan")
    if time.time() - T_START < DEADLINE_S:
        ml = r_to_py(read_rdata(
            "/root/reference/inst/extdata/ModelList.RData")["modellist"])
        pub = AttrBagModel.from_hibag_obj(ml["A"], locus="A")
        # tile the 60-sample panel to a 3840-sample batch
        reps = 64
        big = hibag_tpu.SNPGenoData(
            genotype=np.tile(geno.genotype, (1, reps)),
            sample_id=np.array([f"s{i}" for i in range(geno.n_samp * reps)],
                               dtype=object),
            snp_id=geno.snp_id, snp_position=geno.snp_position,
            snp_allele=geno.snp_allele, assembly=geno.assembly)
        _stage("predict warmup (compile)")
        predict(pub, big)
        predict(pub, big)   # second warmup: lazy init fully settled
        _stage("predict warm reps")
        pred_s = float("inf")
        for rep in range(5):
            t0 = time.time()
            res = predict(pub, big)
            pred_s = min(pred_s, time.time() - t0)
        samp_per_s = big.n_samp / pred_s
        _stage(f"predict done: {samp_per_s:.0f} samp/s")

        # TPU-side correctness assertion: the Mosaic-compiled ensemble
        # kernel's best-guess calls for the original 60 CEU samples must
        # match the bundled model's known accuracy (0.9917) — a TPU-only
        # miscompile would otherwise ship a fast wrong answer
        from hibag_tpu.models.predict import _pair_match
        tmap60 = {s: (a, b) for s, a, b in
                  zip(hla.sample_id, hla.allele1, hla.allele2)}
        hits = [
            _pair_match(res.allele1[i], res.allele2[i],
                        *tmap60[geno.sample_id[i]]) / 2.0
            for i in range(geno.n_samp) if geno.sample_id[i] in tmap60]
        acc = float(np.mean(hits))
        predict_acc = float(acc)
        if not acc >= 0.99:
            raise AssertionError(
                f"TPU predict accuracy {acc:.4f} < 0.99 on the CEU panel — "
                "ensemble kernel output is wrong")
        _stage(f"predict accuracy assertion ok ({acc:.4f})")
        # achieved tensor-FLOP/s in the ensemble kernel vs chip peak:
        # per sample per classifier the matmuls cost
        # 2*(2*H*L + H*H*L + Ap*H*H + Ap*H*Ac) — two genotype projections,
        # the cross-distance matmul, and the two batched symmetric
        # allele contractions (only Ap value-carrying rows are computed)
        packed = pub.pack()
        C = pub.n_classifiers
        Hp = ((packed.hap_bits.shape[1] + 127) // 128) * 128
        L = packed.hap_bits.shape[2]
        Ac = ((pub.n_alleles + 127) // 128) * 128
        Ap = ((pub.n_alleles + 7) // 8) * 8
        flops = 2.0 * big.n_samp * C * (2 * Hp * L + Hp * Hp * L
                                        + Ap * Hp * Hp + Ap * Hp * Ac)
        kernel_tflops = flops / pred_s / 1e12
        # v5e peak: 197 TFLOP/s bf16 (distance matmul) / ~49 f32-equivalent
        mfu_pct = 100.0 * kernel_tflops / 197.0
        # exp (transcendental) roofline: the kernel is exp-bound, not
        # matmul-bound — pen=exp(lambda*(D-dmin)) costs C*N*Hp*Hp exps per
        # run. Nominal v5e VPU throughput: 4 ALUs x (8x128) lanes x
        # ~1.5 GHz ~= 6.1e12 ops/s, with exp measured ~ 1 VPU-op cost
        # (CLAUDE.md round-2 measurements), so this is the honest peak for
        # this kernel — report it alongside the (misleadingly low) MXU MFU.
        exp_per_s = float(C) * big.n_samp * Hp * Hp / pred_s
        exp_roofline_pct = 100.0 * exp_per_s / 6.1e12

        # ---- cohort-scale predict (block=8192 pipelined path) -----------
        if time.time() - T_START < DEADLINE_S:
            creps = 854                       # 51,240 samples (config[3])
            cohort = hibag_tpu.SNPGenoData(
                genotype=np.tile(geno.genotype, (1, creps)),
                sample_id=np.array(
                    [f"c{i}" for i in range(geno.n_samp * creps)],
                    dtype=object),
                snp_id=geno.snp_id, snp_position=geno.snp_position,
                snp_allele=geno.snp_allele, assembly=geno.assembly)
            _stage("cohort predict warmup")
            predict(pub, cohort)
            _stage("cohort predict reps")
            cpred_s = float("inf")
            for rep in range(3):
                t0 = time.time()
                predict(pub, cohort)
                cpred_s = min(cpred_s, time.time() - t0)
            cohort_samp_per_s = cohort.n_samp / cpred_s
            _stage(f"cohort predict done: {cohort_samp_per_s:.0f} samp/s")

    # ---- matched mid-scale training config (reference: 0.36 cls/s) ------
    # 1,000 resampled CEU samples x 266 flanking SNPs — the shape
    # BASELINE.md measured the reference kernel at (VPOPCNT, 4 threads).
    mid_cls_per_s = float("nan")
    if time.time() - T_START < DEADLINE_S:
        hla1000, g1000 = midscale_1000x266(hla, geno)
        mkw = dict(n_classifiers=8, batch=8, verbose=False,
                   with_matching=False, mode="fused", hcap=256,
                   max_steps=192, on_overflow="freeze")
        _stage("mid-scale training warmup (compile)")
        train_parallel(hla1000, g1000, seed=1, **mkw)
        _stage("mid-scale training reps")
        mid_s = float("inf")
        for rep in range(3):
            t0 = time.time()
            train_parallel(hla1000, g1000, seed=100, **mkw)
            mid_s = min(mid_s, time.time() - t0)
        mid_cls_per_s = 8 / mid_s
        _stage(f"mid-scale training done: {mid_cls_per_s:.2f} cls/s")

    mean_oob = float(np.mean([c.oob_accuracy for c in model.classifiers]))
    print(json.dumps({
        "metric": "train_classifiers_per_s",
        "value": round(cls_per_s, 4),
        "unit": "classifiers/s",
        "vs_baseline": round(cls_per_s / REF_TRAIN_CLS_PER_S, 3),
        "baseline_ref": f"HIBAG kernel v1.5 {REF_CPU}: "
                        f"{REF_TRAIN_CLS_PER_S} cls/s, "
                        f"{REF_PREDICT_SAMPLES_PER_S:.0f} samp/s",
        "train_seconds_25cls": round(train_s, 2),
        "mean_oob_accuracy": round(mean_oob, 4),
        "predict_samples_per_s": (round(samp_per_s, 1)
                                  if np.isfinite(samp_per_s) else None),
        "predict_vs_baseline": (
            round(samp_per_s / REF_PREDICT_SAMPLES_PER_S, 3)
            if np.isfinite(samp_per_s) else None),
        "predict_kernel_tflops": (round(kernel_tflops, 2)
                                  if np.isfinite(samp_per_s) else None),
        "predict_mfu_pct_bf16peak": (round(mfu_pct, 2)
                                     if np.isfinite(samp_per_s) else None),
        "predict_exp_roofline_pct_vpu": (
            round(exp_roofline_pct, 1)
            if np.isfinite(exp_roofline_pct) else None),
        "predict_accuracy_ceu": (round(predict_acc, 4)
                                 if np.isfinite(predict_acc) else None),
        "cohort_predict_samples_per_s": (
            round(cohort_samp_per_s, 1)
            if np.isfinite(cohort_samp_per_s) else None),
        "cohort_predict_vs_baseline": (
            round(cohort_samp_per_s / REF_PREDICT_SAMPLES_PER_S, 3)
            if np.isfinite(cohort_samp_per_s) else None),
        "midscale_train_cls_per_s_1000x266": (
            round(mid_cls_per_s, 3) if np.isfinite(mid_cls_per_s) else None),
        "midscale_train_vs_baseline": (
            round(mid_cls_per_s / REF_TRAIN_MID_CLS_PER_S, 2)
            if np.isfinite(mid_cls_per_s) else None),
        "endpoint_probe_ms": endpoint_probe_ms,
        "n_snp": int(fg.n_snp),
        "n_samp": int(fg.n_samp),
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
