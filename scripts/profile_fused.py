"""Dissect the fused training step's cost at the headline (config[0])
shapes: where do the ~30 ms/growth-step go?

Times, warm, on whatever backend the env selects:
  em      — em_all_candidates for a K-batched candidate set (the while_loop)
  eval    — evaluate_candidates alone
  step    — batched_grow_step (em + erase + eval)
  iters   — EM iteration counts (the lockstep while_loop runs to the MAX
            over all K x mtry candidate problems)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_fused.py
"""

import json
import os
import time

import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax
import jax.numpy as jnp


def main(K=25, reps=30):
    import hibag_tpu as ht
    from hibag_tpu.constants import FRACTION_HAPLO, GENO_MISSING, MIN_RARE_FREQ
    from hibag_tpu.models.em import em_all_candidates, erase_rare, \
        evaluate_candidates
    from hibag_tpu.models.train import make_training_context, _resolve_mtry
    from hibag_tpu.parallel.mesh import batched_grow_step
    from hibag_tpu.utils.rng import RRng
    from hibag_tpu.data.allele import loci_info

    truth = ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HLA_Type_Table.rdata")["HLA_Type_Table"])
    geno = ht.SNPGenoData.from_hibag_r(ht.r_to_py(ht.read_rdata(
        "/root/reference/data/HapMap_CEU_Geno.rdata")["HapMap_CEU_Geno"]))
    hla = ht.hlaAllele(truth["sample.id"], truth["A.1"], truth["A.2"],
                       locus="A", assembly="hg19")
    _, start, end, _ = loci_info("hg19")["A"]
    mid = (start + end) // 2
    order = np.argsort(np.abs(geno.snp_position - mid))[:1000]
    fg = geno.subset(snp_mask=np.sort(order))
    ctx, alleles, _ = make_training_context(hla, fg, hap_bucket=64)
    mtry = _resolve_mtry("sqrt", ctx.n_snp)
    N, Np, L = ctx.n_samp, ctx.n_samp_pad, 128
    rare_prob = max(FRACTION_HAPLO / (2.0 * N), MIN_RARE_FREQ)

    # mid-training-ish state: run a few host greedy steps to get real shapes
    rng = RRng(100)
    Bs = np.stack([ctx.pad_B(RRng(100 + k).bootstrap_counts(N))
                   for k in range(K)])
    Hc = 128
    rngs = np.random.default_rng(0)
    bits = rngs.integers(0, 2, (K, Hc, L)).astype(np.float32)
    bits[:, :, 10:] = 0
    freq = rngs.dirichlet(np.ones(40), (K,)).astype(np.float32)
    freqp = np.zeros((K, Hc), np.float32)
    freqp[:, :40] = freq
    allele = np.sort(rngs.integers(0, ctx.n_alleles, (K, Hc)), 1).astype(np.int32)
    geno_sel = np.full((K, Np, L), GENO_MISSING, dtype=np.int8)
    geno_sel[:, :, :10] = np.asarray(ctx.geno_pad[:, :10])[None]
    cand_idx = rngs.integers(0, ctx.n_snp, (K, mtry))
    g_cand = np.take(ctx.geno_pad, cand_idx, axis=1)
    g_cand = np.moveaxis(g_cand, 0, 2).astype(np.int8)
    afreq = np.full((K, mtry), 0.3, np.float32)
    is_oob = (Bs == 0) & (np.arange(Np) < N)[None]
    new_col = np.full(K, 10, np.int32)

    J = jnp.asarray
    args = dict(bits=J(bits), freq=J(freqp), allele=J(allele),
                geno_sel=J(geno_sel), B=J(Bs.astype(np.float32)),
                is_oob=J(is_oob), g_cand=J(g_cand),
                afreq=J(afreq), new_col=J(new_col))

    em_one = jax.jit(jax.vmap(
        lambda b, f, al, gs, Bk, gc, af: em_all_candidates(
            f, f > 0, b, al, gs, ctx.a1_j, ctx.a2_j, Bk, gc, af, float(N))))
    ev_one = jax.jit(jax.vmap(
        lambda b, al, nc, fA, fB, gc, gs, ob, Bk: evaluate_candidates(
            b, al, nc, fA, fB, gc, gs, ctx.a1_j, ctx.a2_j, ob, Bk,
            ctx.n_alleles),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0)))

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_em, em_out = timed(em_one, args["bits"], args["freq"], args["allele"],
                         args["geno_sel"], args["B"], args["g_cand"],
                         args["afreq"])
    fA, fB, ll, iters = em_out
    fA2, fB2 = erase_rare(fA, fB, rare_prob)
    t_ev, _ = timed(ev_one, args["bits"], args["allele"], args["new_col"],
                    fA2, fB2, args["g_cand"], args["geno_sel"],
                    args["is_oob"], args["B"])
    t_step, _ = timed(
        lambda: batched_grow_step(
            args["bits"], args["freq"], args["allele"], args["geno_sel"],
            args["B"], args["is_oob"], args["g_cand"], args["afreq"],
            args["new_col"], ctx.a1_j, ctx.a2_j, rare_prob, float(N),
            ctx.n_alleles))
    print(json.dumps({
        "metric": "fused_step_profile",
        "K": K, "mtry": mtry, "Hc": Hc, "Np": Np,
        "em_ms": round(t_em * 1e3, 2),
        "eval_ms": round(t_ev * 1e3, 2),
        "grow_step_ms": round(t_step * 1e3, 2),
        "em_iters": np.asarray(iters).tolist(),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
