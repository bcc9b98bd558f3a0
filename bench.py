"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: classifiers trained per second on the BASELINE.json config[0]
workload — HapMap CEU HLA-A, 60 samples, ~1000 flanking SNPs, 25-classifier
ensemble. Secondary metrics (prediction throughput) are included as extra
fields.

`vs_baseline` is measured against SELF_BASELINE (the first recorded round-1
value on this hardware); the reference publishes only relative CPU speedups
(BASELINE.md) and no R runtime exists in this image to measure HIBAG
directly.
"""

import json
import os
import time

import numpy as np

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

# round-1 self-baseline: the first working implementation's throughput on
# this chip (host-loop trainer, measured exclusively: 1.76 classifiers/s;
# jnp predict: 834 samples/s). Later numbers report speedup over these.
SELF_BASELINE_TRAIN = 1.76
SELF_BASELINE_PREDICT = 834.0


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
    kw = dict(n_classifiers=n_cls, batch=n_cls, verbose=False,
              with_matching=False, mode="fused", hcap=192, max_steps=192)
    train_parallel(hla, fg, seed=1, **kw)
    t0 = time.time()
    model = train_parallel(hla, fg, seed=100, **kw)
    train_s = time.time() - t0
    cls_per_s = n_cls / train_s

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
        predict(pub, big.subset(samp_mask=np.arange(256)), block=256)
        t0 = time.time()
        res = predict(pub, big, block=256)
        pred_s = time.time() - t0
        samp_per_s = big.n_samp / pred_s

    mean_oob = float(np.mean([c.oob_accuracy for c in model.classifiers]))
    print(json.dumps({
        "metric": "train_classifiers_per_s",
        "value": round(cls_per_s, 4),
        "unit": "classifiers/s",
        "vs_baseline": round(cls_per_s / SELF_BASELINE_TRAIN, 3),
        "train_seconds_25cls": round(train_s, 2),
        "mean_oob_accuracy": round(mean_oob, 4),
        "predict_samples_per_s": (round(samp_per_s, 1)
                                  if np.isfinite(samp_per_s) else None),
        "predict_vs_baseline": (round(samp_per_s / SELF_BASELINE_PREDICT, 3)
                                if np.isfinite(samp_per_s) else None),
        "n_snp": int(fg.n_snp),
        "n_samp": int(fg.n_samp),
    }))


if __name__ == "__main__":
    main()
