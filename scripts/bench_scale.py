"""Scaling benchmarks beyond the headline bench.py config.

Covers BASELINE.json configs: large-cohort prediction throughput (config[3]:
published model over a ~50k-sample cohort) and multi-locus training sweeps.
Prints one JSON line per measurement. Run exclusively on the TPU.
"""

import json
import os
import sys
import time

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def predict_50k(n_samples: int = 51_200, engine: str = "pallas"):
    import hibag_tpu as ht
    ml = ht.r_to_py(ht.read_rdata(
        "/root/reference/inst/extdata/ModelList.RData")["modellist"])
    model = ht.AttrBagModel.from_hibag_obj(ml["A"], locus="A")
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    # synthesize a large cohort by resampling the CEU genotype columns
    rng = np.random.default_rng(0)
    cols = rng.integers(0, geno.n_samp, n_samples)
    big = ht.SNPGenoData(
        genotype=geno.genotype[:, cols],
        sample_id=np.array([f"s{i}" for i in range(n_samples)], dtype=object),
        snp_id=geno.snp_id, snp_position=geno.snp_position,
        snp_allele=geno.snp_allele, assembly=geno.assembly)
    # warmup
    ht.predict(model, big.subset(samp_mask=np.arange(4096)), block=4096,
               engine=engine)
    t0 = time.time()
    res = ht.predict(model, big, block=4096, engine=engine)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "predict_samples_per_s_50k",
        "value": round(n_samples / dt, 1),
        "unit": "samples/s",
        "engine": engine,
        "n_samples": n_samples,
        "seconds": round(dt, 2),
        "n_classifiers": model.n_classifiers,
    }), flush=True)
    return res


def train_6loci(n_classifiers: int = 100):
    import hibag_tpu as ht
    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    for locus in ("A", "B", "C", "DQA1", "DQB1", "DRB1"):
        hla = ht.hlaAllele(truth["sample.id"], truth[f"{locus}.1"],
                           truth[f"{locus}.2"], locus=locus, assembly="hg19")
        ids = ht.flanking_snps(geno.snp_id, geno.snp_position, locus,
                               500_000, "hg19")
        fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                          ids.astype(str)))
        t0 = time.time()
        # hcap must stay a multiple of 128: 192 tiles the H^2 EM terms
        # onto 256 lanes (measured 4x cost, CLAUDE.md round-3 sweep);
        # freeze-resume covers the loci that need more than 128 slots
        m = ht.train_parallel(hla, fg, n_classifiers=n_classifiers,
                              batch=min(n_classifiers, 50), seed=100,
                              verbose=False, with_matching=False,
                              mode="fused", hcap=128, max_steps=192,
                              on_overflow="freeze")
        dt = time.time() - t0
        oob = float(np.mean([c.oob_accuracy for c in m.classifiers]))
        print(json.dumps({
            "metric": f"train_{locus}_classifiers_per_s",
            "value": round(n_classifiers / dt, 2),
            "unit": "classifiers/s",
            "n_classifiers": n_classifiers,
            "seconds": round(dt, 2),
            "mean_oob": round(oob, 4),
        }), flush=True)


def _synthetic_cohort(n_samples: int, locus: str = "A", seed: int = 0):
    """Resample the bundled CEU cohort (genotype column + HLA pair jointly)
    up to n_samples individuals — keeps genotype<->HLA coherence so trained
    classifiers stay meaningful at biobank scale."""
    import hibag_tpu as ht
    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    ids = ht.flanking_snps(geno.snp_id, geno.snp_position, locus,
                           500_000, "hg19")
    fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                      ids.astype(str)))
    tmap = {s: i for i, s in enumerate(truth["sample.id"])}
    keep = [i for i, s in enumerate(fg.sample_id) if s in tmap]
    fg = fg.subset(samp_mask=np.asarray(keep))
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, fg.n_samp, n_samples)
    sid = np.array([f"s{i}" for i in range(n_samples)], dtype=object)
    big = ht.SNPGenoData(
        genotype=fg.genotype[:, cols], sample_id=sid,
        snp_id=fg.snp_id, snp_position=fg.snp_position,
        snp_allele=fg.snp_allele, assembly=fg.assembly)
    ti = np.array([tmap[s] for s in fg.sample_id])[cols]
    a1 = np.asarray(truth[f"{locus}.1"], dtype=object)[ti]
    a2 = np.asarray(truth[f"{locus}.2"], dtype=object)[ti]
    hla = ht.hlaAllele(sid, a1, a2, locus=locus, assembly="hg19")
    return hla, big


def train_cohort(n_samples: int = 50_176, n_classifiers: int = 4,
                 mode: str = "fused", hcap: int = 256,
                 max_steps: int = 128, seed: int = 100,
                 seg_steps=None, on_overflow: str = "warn",
                 batch=None, freeze_max_batch=None):
    """Biobank-scale training: N>=50k resampled samples on one chip with
    bounded memory (pair masks are rematerialized per chunk — persistent
    state is O(C*H), reference streams pair lists src/LibHLA.cpp:1104-1255).
    """
    import hibag_tpu as ht
    hla, big = _synthetic_cohort(n_samples)
    t0 = time.time()
    m = ht.train_parallel(hla, big, n_classifiers=n_classifiers,
                          batch=batch or n_classifiers, seed=seed,
                          verbose=True, with_matching=False, mode=mode,
                          hcap=hcap, max_steps=max_steps,
                          seg_steps=seg_steps, on_overflow=on_overflow,
                          freeze_max_batch=freeze_max_batch)
    dt = time.time() - t0
    oob = float(np.mean([c.oob_accuracy for c in m.classifiers]))
    print(json.dumps({
        "metric": f"train_cohort{n_samples}_classifiers_per_s",
        "value": round(n_classifiers / dt, 4),
        "unit": "classifiers/s",
        "mode": mode,
        "hcap": hcap,
        "n_samples": n_samples,
        "n_classifiers": n_classifiers,
        "seconds": round(dt, 2),
        "mean_oob": round(oob, 4),
        "snp_seqs": [c.snp_index.tolist() for c in m.classifiers],
        "n_haplo": [int(c.n_haplo) for c in m.classifiers],
    }), flush=True)
    return m


def cohort_exact_semantics(n_samples: int = 102_400,
                           n_classifiers: int = 4):
    """Exact-list semantics at the top of the reference's cohort range:
    train at hcap=512 and hcap=1024 (seg_steps=1) and report whether the
    accepted-SNP sequences — the training DECISIONS, not just OOB — differ
    (VERDICT r2 item 4; the unbounded reference list is
    src/LibHLA.cpp:352-578)."""
    out = {}
    for hcap in (512, 1024):
        t0 = time.time()
        # hcap=1024 at this scale: even ONE growth step per dispatch is a
        # multi-minute XLA execution at K=4 (the remote tunnel kills it) —
        # train classifiers one at a time (identical per-id RNG streams)
        m = train_cohort(n_samples, n_classifiers, hcap=hcap,
                         max_steps=128, seg_steps=1,
                         batch=1 if hcap > 512 else None)
        out[hcap] = {
            "seqs": [c.snp_index.tolist() for c in m.classifiers],
            "n_haplo": [int(c.n_haplo) for c in m.classifiers],
            "oob": [float(c.oob_accuracy) for c in m.classifiers],
            "seconds": round(time.time() - t0, 1),
        }
    same = [a == b for a, b in zip(out[512]["seqs"], out[1024]["seqs"])]
    print(json.dumps({
        "metric": "cohort_exact_semantics_102400",
        "snp_seq_identical_512_vs_1024": same,
        "n_haplo_512": out[512]["n_haplo"],
        "n_haplo_1024": out[1024]["n_haplo"],
        "oob_512": out[512]["oob"],
        "oob_1024": out[1024]["oob"],
        "seconds_512": out[512]["seconds"],
        "seconds_1024": out[1024]["seconds"],
    }), flush=True)


def cohort_exact_freeze(n_samples: int = 102_400, n_classifiers: int = 4):
    """Exact-list semantics at the top of the reference's cohort range,
    BATCHED (VERDICT r3 item 4): K=4 trains together at hcap=256 with
    on_overflow="freeze"; classifiers whose lists outgrow 512 slots stop
    at their first drop and resume at 1024/1536/... with the doubled-
    capacity dispatches capped at one classifier each (freeze_max_batch=1
    — a K=4 x hcap>=1024 single-step dispatch exceeds the remote tunnel's
    per-execution ceiling, COVERAGE.md). Exactness chain: freeze==retry==
    direct-big-hcap is bitwise (tests/test_fused.py), so the sequences
    equal a from-scratch run at each classifier's sufficient capacity —
    the round-3 serial exact run measured final live-haplotype counts
    564/558/554/690 for seed 100, which this run must reproduce.
    Reference equivalent: unbounded CHaplotypeList growth,
    /root/reference/src/LibHLA.cpp:352-578."""
    t0 = time.time()
    # start at 256: the K=4 phase stays in the PACKED pair-mask tier
    # (839 MB/classifier <= the 2 GB per-classifier budget; 512 would fall
    # to per-iteration remat at ~4x the step cost), and every K=1 resume
    # bucket (512/640/768/...) is packed too — overflow happens so early
    # that phase-1 capacity barely matters, resume-capacity cost is all
    m = train_cohort(n_samples, n_classifiers, hcap=256, max_steps=128,
                     seg_steps=1, on_overflow="freeze",
                     freeze_max_batch=1)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "cohort_exact_freeze_102400_seconds",
        "value": round(dt, 1),
        "unit": "s",
        "n_haplo": [int(c.n_haplo) for c in m.classifiers],
        "snp_seqs": [c.snp_index.tolist() for c in m.classifiers],
        "oob": [float(c.oob_accuracy) for c in m.classifiers],
        "round3_serial_seconds": 1218,
        "round3_n_haplo_expected": [564, 558, 554, 690],
    }), flush=True)
    return m


def train_drb1_500(n_classifiers: int = 500):
    """BASELINE.json config[2]: 4-digit HLA-DRB1, 500 kb flank, 500
    classifiers (stresses EM + the SNP-selection loop: DRB1 has the largest
    allele/haplotype universe of the classical loci)."""
    import hibag_tpu as ht
    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    hla = ht.hlaAllele(truth["sample.id"], truth["DRB1.1"],
                       truth["DRB1.2"], locus="DRB1", assembly="hg19")
    ids = ht.flanking_snps(geno.snp_id, geno.snp_position, "DRB1",
                           500_000, "hg19")
    fg = geno.subset(snp_mask=np.isin(geno.snp_id.astype(str),
                                      ids.astype(str)))
    t0 = time.time()
    m = ht.train_parallel(hla, fg, n_classifiers=n_classifiers, batch=50,
                          seed=100, verbose=False, with_matching=False,
                          mode="fused", hcap=128, max_steps=192,
                          on_overflow="freeze")
    dt = time.time() - t0
    oob = float(np.mean([c.oob_accuracy for c in m.classifiers]))
    print(json.dumps({
        "metric": "train_drb1_500cls_classifiers_per_s",
        "value": round(n_classifiers / dt, 2),
        "unit": "classifiers/s",
        "n_classifiers": n_classifiers,
        "seconds": round(dt, 2),
        "mean_oob": round(oob, 4),
        "n_snps": fg.n_snp,
    }), flush=True)


def predict_mesh_virtual(n_samples: int = 8192):
    """Mesh-sharded prediction through the PUBLIC predict(mesh=) API on
    the virtual multi-device mesh (no multi-chip hardware in this image;
    run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
    device_count=8). Measures sharded vs single-device throughput AND
    asserts call identity — the scaling analogue of hlaPredict(cl=),
    R/HIBAG.R:764-807."""
    import jax

    import hibag_tpu as ht
    from hibag_tpu.parallel.mesh import ensemble_mesh

    ml = ht.r_to_py(ht.read_rdata(
        "/root/reference/inst/extdata/ModelList.RData")["modellist"])
    model = ht.AttrBagModel.from_hibag_obj(ml["A"], locus="A")
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    rng = np.random.default_rng(0)
    cols = rng.integers(0, geno.n_samp, n_samples)
    big = ht.SNPGenoData(
        genotype=geno.genotype[:, cols],
        sample_id=np.array([f"s{i}" for i in range(n_samples)],
                           dtype=object),
        snp_id=geno.snp_id, snp_position=geno.snp_position,
        snp_allele=geno.snp_allele, assembly=geno.assembly)
    mesh = ensemble_mesh()
    out = {"metric": "predict_mesh_virtual_samples_per_s",
           "unit": "samples/s", "n_samples": n_samples,
           "n_devices": len(jax.devices()),
           "n_classifiers": model.n_classifiers}
    # engine="jnp": on the CPU mesh the Pallas kernel would run in
    # interpret mode (orders of magnitude slow) — the compiled scan path
    # is the meaningful virtual-device measurement; kernel-path mesh
    # identity is covered by tests/test_parallel.py
    ht.predict(model, big, block=2048, engine="jnp")         # warmups
    ht.predict(model, big, mesh=mesh, block=2048, engine="jnp")
    results = {}
    for label, kw in (("single", {}), ("mesh", {"mesh": mesh})):
        t0 = time.time()
        results[label] = ht.predict(model, big, block=2048, engine="jnp",
                                    **kw)
        out[f"{label}_samples_per_s"] = round(
            n_samples / (time.time() - t0), 1)
    assert np.array_equal(results["mesh"].allele1,
                          results["single"].allele1)
    assert np.array_equal(results["mesh"].allele2,
                          results["single"].allele2)
    out["calls_identical"] = True
    out["value"] = out["mesh_samples_per_s"]
    # virtual devices all share this host's physical cores: the ratio
    # measures collective/sharding OVERHEAD (it cannot show speedup —
    # there is no extra silicon); identity of calls is the real assert
    out["note"] = ("virtual devices share one host's cores; ratio = "
                   "sharding overhead, not scaling")
    out["mesh_overhead_factor"] = round(
        out["single_samples_per_s"] / out["mesh_samples_per_s"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "predict"
    if which == "predict":
        predict_50k()
    elif which == "train6":
        train_6loci(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
    elif which == "drb1":
        train_drb1_500(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
    elif which == "cohort":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_176
        mode = sys.argv[3] if len(sys.argv) > 3 else "fused"
        train_cohort(n, mode=mode)
    elif which == "exactfreeze":
        cohort_exact_freeze(
            int(sys.argv[2]) if len(sys.argv) > 2 else 102_400)
    elif which == "exact":
        cohort_exact_semantics(
            int(sys.argv[2]) if len(sys.argv) > 2 else 102_400)
    elif which == "mesh":
        predict_mesh_virtual(
            int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
