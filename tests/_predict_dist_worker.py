"""Worker for the 2-process distributed-prediction test: each process
imputes its sample share of the bundled CEU cohort with the published
HLA-A model and all-gathers; both must hold the full, identical result.

Usage: python _predict_dist_worker.py <coordinator> <nproc> <pid> <out.npz>
"""

import sys

import numpy as np


def main():
    coordinator, nproc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    import hibag_tpu as ht
    from hibag_tpu.parallel.mesh import predict_distributed

    ml = ht.r_to_py(ht.read_rdata(
        "/root/reference/inst/extdata/ModelList.RData")["modellist"])
    model = ht.AttrBagModel.from_hibag_obj(ml["A"], locus="A")
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))

    res = predict_distributed(model, geno, coordinator=coordinator,
                              num_processes=nproc, process_id=pid,
                              with_prob=True)
    np.savez(out, sample_id=res.sample_id.astype(str),
             allele1=res.allele1.astype(str), allele2=res.allele2.astype(str),
             prob=res.prob, matching=res.matching, postprob=res.postprob)
    print(f"proc {pid}: {len(res.sample_id)} samples gathered")


if __name__ == "__main__":
    main()
