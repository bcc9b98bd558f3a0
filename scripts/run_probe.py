"""Runtime probe: execute fused_grow_batch on synthetic data at given
shapes. Bisects the N=32768 TPU worker crash (shape-driven kernel fault).

Usage: python scripts/run_probe.py N [hcap] [steps] [stage]
  stage: full | em | eval
"""

import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    hcap = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    stage = sys.argv[4] if len(sys.argv) > 4 else "full"
    K, P, mtry, A, L = 4, 1536, 36, 26, 128
    rng = np.random.default_rng(0)
    geno = rng.integers(0, 3, (N, P)).astype(np.int8)
    a1 = np.sort(rng.integers(0, A, (2, N)), axis=0).astype(np.int32)
    a2 = a1[1]
    a1 = a1[0]
    B = rng.poisson(1.0, (K, N)).astype(np.float32)
    real = np.ones(N, bool)
    bits0 = np.zeros((K, hcap, L), np.float32)
    freq0 = np.zeros((K, hcap), np.float32)
    allele0 = np.zeros((K, hcap), np.int32)
    freq0[:, :A] = 1.0 / A
    allele0[:, :A] = np.arange(A)
    keys = jnp.stack([jax.random.PRNGKey(7 + j) for j in range(K)])
    print(f"stage={stage} N={N} hcap={hcap} steps={steps} "
          f"S*H*H={N * hcap * hcap:,}", flush=True)
    t0 = time.time()
    if stage == "full":
        from hibag_tpu.models.train_fused import fused_grow_batch

        def run(n_steps):
            t0 = time.time()
            out = fused_grow_batch(
                jnp.asarray(bits0), jnp.asarray(freq0),
                jnp.asarray(allele0), jnp.asarray(B), jnp.asarray(real),
                jnp.asarray(geno), jnp.asarray(a1), jnp.asarray(a2), keys,
                0.0005, float(N), A, mtry, True, n_steps,
                seg_steps=n_steps)
            ns = np.asarray(out[3])
            return time.time() - t0, ns

        t_cold, ns = run(2)
        print(f"cold 2 steps: {t_cold:.1f}s n_snp={ns.tolist()}", flush=True)
        # warm: the segment executable is shared (step limit is dynamic)
        t_warm2, _ = run(2)
        t_warm, ns = run(steps)
        per_step = (t_warm - t_warm2) / max(steps - 2, 1)
        print(f"warm {steps} steps: {t_warm:.1f}s (2 steps {t_warm2:.1f}s) "
              f"-> {per_step:.2f}s/step  n_snp={ns.tolist()}", flush=True)
    elif stage in ("em", "eval"):
        from hibag_tpu.models.em import (em_all_candidates, erase_rare,
                                         evaluate_candidates)
        # single-classifier slice, C=mtry candidates
        g_cand = jnp.asarray(geno[:, :mtry].T.astype(np.int8))   # [C, N]
        geno_sel = jnp.full((N, L), 3, jnp.int8)
        bits = jnp.asarray(bits0[0])
        freq = jnp.asarray(freq0[0])
        allele = jnp.asarray(allele0[0])
        valid = freq > 0
        afreq = jnp.full((mtry,), 0.4, jnp.float32)
        fA, fB, ll, it = em_all_candidates(
            freq, valid, bits, allele, geno_sel, jnp.asarray(a1),
            jnp.asarray(a2), jnp.asarray(B[0]), g_cand, afreq, float(N))
        fA, fB = erase_rare(fA, fB, 0.0005)
        fA.block_until_ready()
        print(f"em OK iters={int(it.max())} t={time.time() - t0:.1f}s",
              flush=True)
        if stage == "eval":
            t0 = time.time()
            acc, loss = evaluate_candidates(
                bits, allele, jnp.asarray(0), fA, fB, g_cand, geno_sel,
                jnp.asarray(a1), jnp.asarray(a2),
                jnp.asarray(B[0] == 0), jnp.asarray(B[0]), A)
            acc.block_until_ready()
            print(f"eval OK t={time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
