"""Decompose the config[0] warm training iteration: host prep vs device loop.

Times, inside train_fused_batch: bootstrap/init-haplotype host prep, the
fused_grow_batch device dispatch (block_until_ready), and classifier
post-processing. Run on TPU: PYTHONPATH=/root/.axon_site:/root/repo
python3 scripts/profile_train.py
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import hibag_tpu
    from hibag_tpu.data.allele import HLATypeTable, loci_info
    from hibag_tpu.io.rdata import read_rdata, r_to_py
    from hibag_tpu.models.train import train_parallel
    from hibag_tpu.models import train_fused

    ht = r_to_py(read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = hibag_tpu.SNPGenoData.from_hibag_r(r_to_py(read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    hla = HLATypeTable.from_alleles(
        ht["sample.id"], ht["A.1"], ht["A.2"], locus="A", assembly="hg19")
    _, start, end, _ = loci_info("hg19")["A"]
    mid = (start + end) // 2
    order = np.argsort(np.abs(geno.snp_position - mid))[:1000]
    fg = geno.subset(snp_mask=np.sort(order))

    # instrument fused_grow_batch: per-dispatch wall time + batch size +
    # hcap (retry dispatches show up as a second, smaller-K entry)
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

    import sys
    hcaps = ([int(x) for x in sys.argv[1:]] or [128])
    for hcap in hcaps:
        kw = dict(n_classifiers=25, batch=25, verbose=False,
                  with_matching=False, mode="fused", hcap=hcap,
                  max_steps=192, on_overflow="retry")
        print(f"=== hcap={hcap}: warmup (compile)...", flush=True)
        train_parallel(hla, fg, seed=1, **kw)
        print("warm reps", flush=True)
        best = None
        for rep in range(5):
            marks.clear()
            t0 = time.perf_counter()
            train_parallel(hla, fg, seed=100, **kw)
            total = time.perf_counter() - t0
            grow = sum(t for t, *_ in marks.get("grow", []))
            disp = [(round(t, 3), K, H) for t, K, H in marks.get("grow", [])]
            print(f"rep{rep}: total {total:.3f}s device-loop {grow:.3f}s "
                  f"dispatches {disp} host/other {total - grow:.3f}s",
                  flush=True)
            best = total if best is None else min(best, total)
        print(f"hcap={hcap}: best {best:.3f}s = {25 / best:.2f} cls/s",
              flush=True)


if __name__ == "__main__":
    main()
