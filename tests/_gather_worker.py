"""Worker for the large-ensemble gather test: each process builds a
synthetic local model with big classifiers (~1 MiB of haplotype data each,
so the serialized half exceeds 32 MiB and the gathered ensemble 64 MiB),
all-gathers, and writes a digest of the merged ensemble.

Usage: python _gather_worker.py <coordinator> <nproc> <pid> <out.npz>
"""

import sys

import numpy as np


def main():
    coordinator, nproc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from hibag_tpu.models.model import AttrBagModel, Classifier
    from hibag_tpu.parallel.mesh import (classifier_range, distributed_init,
                                         gather_classifiers)

    pi, pc = distributed_init(coordinator, nproc, pid)
    n_total = 64
    rng_range = classifier_range(n_total, pi, pc)

    # ~1 MiB of haplotype strings per classifier: each process's pickled
    # half is ~33 MiB (2x the old fixed 16 MiB gather wall) and the merged
    # ensemble ~66 MiB
    P, L, H, A = 512, 128, 8000, 40
    classifiers = []
    for k in rng_range:
        rng = np.random.default_rng(k)     # content depends only on id
        freq = rng.dirichlet(np.ones(H))
        classifiers.append(Classifier(
            snp_index=np.sort(rng.choice(P, L, replace=False)).astype(
                np.int32),
            hap_bits=rng.integers(0, 2, (H, L)).astype(np.uint8),
            hap_freq=freq,
            hap_allele=np.sort(rng.integers(0, A, H)).astype(np.int32),
            bootstrap_count=rng.integers(0, 3, 100).astype(np.int32),
            oob_accuracy=float(rng.random()),
        ))
    local = AttrBagModel(
        locus="A",
        snp_id=np.array([f"rs{i}" for i in range(P)], dtype=object),
        snp_position=np.arange(P, dtype=np.int64) * 100 + 29_900_000,
        snp_allele=np.array(["A/G"] * P, dtype=object),
        snp_allele_freq=np.full(P, 0.5),
        hla_alleles=[f"{i:02d}:01" for i in range(A)],
        hla_freq=np.full(A, 1.0 / A),
        assembly="hg19",
        sample_id=np.array([f"s{i}" for i in range(100)], dtype=object),
        classifiers=classifiers,
    )
    merged = gather_classifiers(local, n_total)
    digest = np.array([float(np.sum(c.hap_freq * np.arange(c.n_haplo)))
                       for c in merged.classifiers])
    np.savez(out, n=merged.n_classifiers, digest=digest,
             nbytes=sum(c.hap_bits.nbytes + c.hap_freq.nbytes
                        for c in merged.classifiers))
    print(f"proc {pi}: gathered {merged.n_classifiers} classifiers")


if __name__ == "__main__":
    main()
