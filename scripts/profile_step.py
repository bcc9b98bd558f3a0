"""Decompose the fused growth step at headline shapes: EM vs eval cost.

The fused while_loop cannot be timed from inside, so this times the two
dominant sub-kernels STANDALONE at the exact shapes step_one uses
(config[0]: N=64 pad, P=1024, H=128, mtry=31, K=25 via vmap), each jitted
and vmapped the same way. Numbers bound where the ~26 ms/classifier
device-loop time goes and what a hand-fused Pallas EM iteration could
save. Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_step.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hibag_tpu.models.em import (em_all_candidates, erase_rare,
                                     evaluate_candidates)

    K, N, H, L, Cm, A = 25, 64, 128, 128, 31, 14
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (K, H, L)).astype(np.float32)
    freq = rng.random((K, H)).astype(np.float32)
    freq[:, 40:] = 0.0                      # ~40 live haplotypes typical
    freq /= freq.sum(1, keepdims=True)
    allele = np.sort(rng.integers(0, A, (K, H)), 1).astype(np.int32)
    geno_sel = rng.integers(0, 4, (K, N, L)).astype(np.int8)
    a1 = np.sort(rng.integers(0, A, (2, N)), 0).astype(np.int32)
    B = rng.multinomial(60, np.ones(N) / N, size=K).astype(np.float32)
    g_cand = rng.integers(0, 3, (K, Cm, N)).astype(np.int8)
    afreq = rng.uniform(0.2, 0.8, (K, Cm)).astype(np.float32)
    is_oob = (B == 0)
    n_snp = np.full(K, 10, np.int32)

    em_v = jax.jit(jax.vmap(
        lambda f, b, al, gs, gc, af, bb: em_all_candidates(
            f, f > 0, b, al, gs, jnp.asarray(a1[0]), jnp.asarray(a1[1]),
            bb, gc, af, 60.0)))
    ev_v = jax.jit(jax.vmap(
        lambda b, al, ns, fa, fb, gc, gs, oo, bb: evaluate_candidates(
            b, al, ns, fa, fb, gc, gs, jnp.asarray(a1[0]),
            jnp.asarray(a1[1]), oo, bb, A),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0)))

    args_em = tuple(map(jnp.asarray, (freq, bits, allele, geno_sel,
                                      g_cand, afreq, B)))
    out = em_v(*args_em)
    jax.block_until_ready(out)
    fA, fB, ll, it = out
    print("EM iterations (max per classifier):",
          np.asarray(it).max(), flush=True)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = em_v(*args_em)
    jax.block_until_ready(out)
    em_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"em_all_candidates (K={K} vmap, to convergence): "
          f"{em_ms:.2f} ms/step-equivalent", flush=True)

    fa2, fb2 = jax.jit(jax.vmap(
        lambda a, b: erase_rare(a, b, 1e-3)))(fA, fB)
    args_ev = (jnp.asarray(bits), jnp.asarray(allele), jnp.asarray(n_snp),
               fa2, fb2, jnp.asarray(g_cand), jnp.asarray(geno_sel),
               jnp.asarray(is_oob), jnp.asarray(B))
    out = ev_v(*args_ev)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ev_v(*args_ev)
    jax.block_until_ready(out)
    ev_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"evaluate_candidates (K={K} vmap): {ev_ms:.2f} ms/step",
          flush=True)
    per_iter = em_ms / max(int(np.asarray(it).max()), 1)
    print(f"-> per-EM-iteration ~{per_iter:.3f} ms; a ~45-step growth "
          f"loop spends ~{45 * (em_ms + ev_ms) / 1e3:.2f} s if these "
          f"dominate (measured device loop: ~0.66 s for K=25)",
          flush=True)


if __name__ == "__main__":
    main()
