"""Worker for test_train_dynamic_two_processes_straggler.

Usage: python tests/_dyn_worker.py <coordinator> <nproc> <pid> <work_dir>
       <out.npz> [sleep_s]

Process `pid` optionally sleeps before claiming (a straggler): the other
process should pick up most jobs, and the merged model must still equal
the single-process result (per-classifier RNG substreams are id-derived).
"""

import sys
import time

import numpy as np


def main():
    coord, nproc, pid, work_dir, out = sys.argv[1:6]
    sleep_s = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0
    import jax
    jax.config.update("jax_platforms", "cpu")

    from hibag_tpu.data.allele import HLATypeTable, flanking_snps
    from hibag_tpu.data.geno import SNPGenoData
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.models.train import train_dynamic
    from hibag_tpu.parallel.mesh import distributed_init

    distributed_init(coord, int(nproc), int(pid))
    if sleep_s:
        time.sleep(sleep_s)

    truth = r_to_py(read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = SNPGenoData.from_hibag_r(r_to_py(read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    t = HLATypeTable.from_alleles(
        truth["sample.id"], truth["A.1"], truth["A.2"], locus="A")
    ids = flanking_snps(geno.snp_id, geno.snp_position, "A", 500_000,
                        "hg19")
    fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                      ids.astype(str)))
    m = train_dynamic(t, fg, n_classifiers=4, seed=100, job_size=1,
                      work_dir=work_dir, verbose=False, mode="host")
    np.savez(out, n=m.n_classifiers,
             **{f"snp{k}": c.snp_index
                for k, c in enumerate(m.classifiers)})


if __name__ == "__main__":
    main()
