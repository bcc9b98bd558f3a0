"""hcap sweep at the matched mid-scale training shape (1,000 samp x 266
SNP, 8 classifiers — the config BASELINE.md measured the reference at).

Reuses bench.py's exact mid-scale data construction so timings map 1:1
onto the recorded midscale_train_cls_per_s_1000x266 metric. Run on TPU:
PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_mid.py 128 256
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import hibag_tpu
    from hibag_tpu.data.allele import HLATypeTable, flanking_snps
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.models.train import train_parallel
    from hibag_tpu.models import train_fused

    ht = r_to_py(read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = hibag_tpu.SNPGenoData.from_hibag_r(r_to_py(read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    hla = HLATypeTable.from_alleles(
        ht["sample.id"], ht["A.1"], ht["A.2"], locus="A", assembly="hg19")
    ids = flanking_snps(geno.snp_id, geno.snp_position, "A", 500_000,
                        "hg19")
    f266 = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                        ids.astype(str)))
    rng = np.random.default_rng(0)
    tmap = {s: i for i, s in enumerate(hla.sample_id)}
    keep = np.asarray([i for i, s in enumerate(f266.sample_id)
                       if s in tmap])
    f266 = f266.subset(samp_mask=keep)
    cols = rng.integers(0, f266.n_samp, 1000)
    sid = np.array([f"m{i}" for i in range(1000)], dtype=object)
    ti = np.array([tmap[s] for s in f266.sample_id])[cols]
    g1000 = hibag_tpu.SNPGenoData(
        genotype=f266.genotype[:, cols], sample_id=sid,
        snp_id=f266.snp_id, snp_position=f266.snp_position,
        snp_allele=f266.snp_allele, assembly=f266.assembly)
    hla1000 = HLATypeTable.from_alleles(
        sid, hla.allele1[ti], hla.allele2[ti], locus="A", assembly="hg19")

    orig = train_fused.fused_grow_batch
    marks = {}

    def timed(bits0, *a, **kw):
        t0 = time.perf_counter()
        out = orig(bits0, *a, **kw)
        jax.block_until_ready(out)
        marks.setdefault("grow", []).append(
            (time.perf_counter() - t0, bits0.shape[0], bits0.shape[1]))
        return out

    train_fused.fused_grow_batch = timed

    hcaps = [int(x) for x in sys.argv[1:]] or [256]
    for hcap in hcaps:
        kw = dict(n_classifiers=8, batch=8, verbose=False,
                  with_matching=False, mode="fused", hcap=hcap,
                  max_steps=192, on_overflow="retry")
        print(f"=== hcap={hcap}: warmup (compile)...", flush=True)
        train_parallel(hla1000, g1000, seed=1, **kw)
        best = None
        for rep in range(3):
            marks.clear()
            t0 = time.perf_counter()
            train_parallel(hla1000, g1000, seed=100, **kw)
            total = time.perf_counter() - t0
            disp = [(round(t, 3), K, H) for t, K, H in marks.get("grow", [])]
            print(f"rep{rep}: total {total:.3f}s dispatches {disp}",
                  flush=True)
            best = total if best is None else min(best, total)
        print(f"hcap={hcap}: best {best:.3f}s = {8 / best:.2f} cls/s",
              flush=True)


if __name__ == "__main__":
    main()
