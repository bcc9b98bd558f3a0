"""Worker for the BASELINE config[4] run (see config4_run.py).

Usage: python scripts/config4_worker.py <coordinator> <nproc> <pid> <outdir>
       [n_classifiers] [mode]

One jax.distributed session per process; for each of the 6 loci both
processes train their deterministic half of the ensemble on the training
split, the halves are merged hlaCombineModelObj-style (every process also
saves its LOCAL partial model so the driver can re-merge through the public
combine() API and verify equality), and process 0 predicts the held-out
half and records accuracy + wall time.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    coordinator, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    n_cls = int(sys.argv[5]) if len(sys.argv) > 5 else 100
    mode = sys.argv[6] if len(sys.argv) > 6 else "fused"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import hibag_tpu as ht
    from hibag_tpu.models.train import train_parallel
    from hibag_tpu.parallel.mesh import (classifier_range, distributed_init,
                                         gather_classifiers)

    pi, pc = distributed_init(coordinator, nproc, pid)

    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))

    floors = {"A": 0.9, "B": 0.8, "C": 0.8, "DQA1": 0.8, "DQB1": 0.8,
              "DRB1": 0.7}
    results = {}
    for locus, floor in floors.items():
        t0 = time.time()
        hla = ht.hlaAllele(truth["sample.id"], truth[f"{locus}.1"],
                           truth[f"{locus}.2"], locus=locus,
                           assembly="hg19")
        ids = ht.flanking_snps(geno.snp_id, geno.snp_position, locus,
                               500_000, "hg19")
        fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                          ids.astype(str)))
        tr, va = ht.split_alleles(hla, 0.5, np.random.default_rng(100))
        tr_geno = fg.subset_by_samples(tr.sample_id)

        rng_range = classifier_range(n_cls, pi, pc)
        local = train_parallel(tr, tr_geno, n_classifiers=len(rng_range),
                               seed=100, first_id=rng_range.start,
                               verbose=False, with_matching=False,
                               mode=mode, batch=10)
        local.save(os.path.join(outdir, f"{locus}_p{pi}.npz"))
        merged = gather_classifiers(local, n_cls)
        train_s = time.time() - t0

        if pi == 0:
            res = ht.predict(merged, fg.subset_by_samples(va.sample_id))
            cmp = ht.compare_alleles(va, res)
            acc = float(cmp.overall["acc.haplo"])
            results[locus] = {
                "acc": acc, "floor": floor, "ok": acc >= floor,
                "n_classifiers": merged.n_classifiers,
                "train_wall_s": round(train_s, 1),
                "n_snp": int(fg.n_snp),
            }
            print(f"[config4] {locus}: acc={acc:.4f} floor={floor} "
                  f"{'OK' if acc >= floor else 'FAIL'} "
                  f"({train_s:.0f}s train)", flush=True)

    if pi == 0:
        with open(os.path.join(outdir, "results.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
