"""Quantify the f32-vs-f64 training-decision deviation (DEVIATIONS.md #1).

Trains the same classifiers (same R-RNG stream, same bootstraps) on real CEU
data twice — once with the default f32 device compute, once with the opt-in
f64 path — and reports how many accepted-SNP sequences diverge. The greedy
accept/stop/prune decisions compare OOB accuracy (integers, exact in both)
and -2logLik (float, knife-edge only at exact ties), so divergence measures
the practical effect of f32 rounding on model structure.

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/f64_deviation.py [K] [loci...]
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)


def main(n_classifiers=8, loci=("A", "C")):
    import hibag_tpu as ht
    from hibag_tpu.utils.rng import RRng

    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))

    n_same = n_diff = 0
    per_locus = {}
    for locus in loci:
        hla = ht.hlaAllele(truth["sample.id"], truth[f"{locus}.1"],
                           truth[f"{locus}.2"], locus=locus, assembly="hg19")
        ids = ht.flanking_snps(geno.snp_id, geno.snp_position, locus,
                               500_000, "hg19")
        fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                          ids.astype(str)))
        m32 = ht.train(hla, fg, n_classifiers=n_classifiers, seed=100,
                       verbose=False, with_matching=False,
                       dtype=np.float32)
        m64 = ht.train(hla, fg, n_classifiers=n_classifiers, seed=100,
                       verbose=False, with_matching=False,
                       dtype=np.float64)
        same = 0
        prefixes = []
        for c32, c64 in zip(m32.classifiers, m64.classifiers):
            if np.array_equal(c32.snp_index, c64.snp_index):
                same += 1
            k = 0
            for a, b in zip(c32.snp_index, c64.snp_index):
                if a != b:
                    break
                k += 1
            prefixes.append(k)
        # do the structurally-different ensembles CALL the same types?
        p32 = ht.predict(m32, fg, verbose=False)
        p64 = ht.predict(m64, fg, verbose=False)
        agree = float(np.mean((p32.allele1 == p64.allele1)
                              & (p32.allele2 == p64.allele2)))
        per_locus[locus] = {
            "same_sequences": same,
            "total": n_classifiers,
            "mean_common_prefix": float(np.mean(prefixes)),
            "mean_len_f32": float(np.mean(
                [len(c.snp_index) for c in m32.classifiers])),
            "mean_len_f64": float(np.mean(
                [len(c.snp_index) for c in m64.classifiers])),
            "mean_oob_f32": float(np.mean(
                [c.oob_accuracy for c in m32.classifiers])),
            "mean_oob_f64": float(np.mean(
                [c.oob_accuracy for c in m64.classifiers])),
            "call_agreement": agree,
        }
        n_same += same
        n_diff += n_classifiers - same
    print(json.dumps({
        "metric": "f32_vs_f64_identical_snp_sequences",
        "value": n_same / max(n_same + n_diff, 1),
        "unit": "fraction",
        "n_classifiers_compared": n_same + n_diff,
        "identical": n_same,
        "diverged": n_diff,
        "per_locus": per_locus,
    }, indent=1))


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    loci = tuple(sys.argv[2:]) or ("A", "C")
    main(k, loci)
