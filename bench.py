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

# Measured reference-kernel numbers on THIS image's CPU (4-core AVX-512
# Xeon; scripts/refbench, data via scripts/export_baseline_data.py
# "nearest:1000" = the exact config[0] workload, 60 samp x 976 SNP):
#   train  (25 cls):   AVX512BW 3.72-3.79 cls/s (1t/4t), VPOPCNT 4.49 cls/s
#   predict(100 cls, 3840 samp, 4t): AVX512BW 2522/s, VPOPCNT 3477/s
# Denominators = the best measured target (AVX512VPOPCNTDQ).
REF_TRAIN_CLS_PER_S = 4.49
REF_PREDICT_SAMPLES_PER_S = 3477.0
REF_CPU = "AVX512VPOPCNTDQ, 4 cores (scripts/refbench)"


def main():
    T_START = time.time()
    import hibag_tpu
    from hibag_tpu.data.allele import HLATypeTable
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.models.train import train
    from hibag_tpu.models.predict import predict
    from hibag_tpu.models.model import AttrBagModel

    ht = r_to_py(read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = hibag_tpu.SNPGenoData.from_hibag_r(r_to_py(read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    hla = HLATypeTable.from_alleles(
        ht["sample.id"], ht["A.1"], ht["A.2"], locus="A", assembly="hg19")

    # ~1000 SNPs nearest the HLA-A locus (config[0] workload)
    from hibag_tpu.data.allele import loci_info
    _, start, end, _ = loci_info("hg19")["A"]
    mid = (start + end) // 2
    order = np.argsort(np.abs(geno.snp_position - mid))[:1000]
    fg = geno.subset(snp_mask=np.sort(order))

    # ---- training throughput (fused on-device growth loop) ---------------
    # the whole 25-classifier batch trains in ONE device dispatch; the first
    # run is the compile warmup (kernel shapes are pinned by hcap/max_steps)
    from hibag_tpu.models.train import train_parallel
    n_cls = 25
    # hcap=128 fits the live haplotype count of this workload for 24/25
    # classifiers (the H^2 EM/eval terms scale with the slot capacity, so
    # smaller slots = faster); on_overflow="retry" retrains the one
    # overflowing classifier at 2x slots on the identical RNG stream, so
    # semantics stay exact and the retry cost is included in the timing
    kw = dict(n_classifiers=n_cls, batch=n_cls, verbose=False,
              with_matching=False, mode="fused", hcap=128, max_steps=192,
              on_overflow="retry")
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
    _stage(f"training done: {cls_per_s:.2f} cls/s")

    # ---- prediction throughput (100-classifier published model) ---------
    # optional: skipped when the training portion ate the time budget
    samp_per_s = float("nan")
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
        "n_snp": int(fg.n_snp),
        "n_samp": int(fg.n_samp),
    }))


if __name__ == "__main__":
    main()
