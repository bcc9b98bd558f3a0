"""Candidate-evaluation cost at cohort-resume shapes: jnp vs the Pallas
eval kernel, including H=640 (the dominant freeze-resume capacity of the
exact-at-scale run — final live counts 564/565/554 fit the 640 bucket).

Measured round 5 (this script; EVAL_MAX_H=640 has shipped as the default
since): jnp 2.06 s vs pallas 1.55 s at N=102,400, H=640 — eval dominates
those growth steps.  Same-process interleaved timing, per COVERAGE.md
methodology.  Use HIBAG_TPU_EVAL_MAX_H only to probe other ceilings
(H=768 needs ~18 MB VMEM and will fail to compile).

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_eval_cohort.py \
      --n 102400 --h 640 --reps 3
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=102_400)
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--cm", type=int, default=31)
    ap.add_argument("--alleles", type=int, default=14)
    ap.add_argument("--live", type=int, default=560)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hibag_tpu.models.em import evaluate_candidates
    from hibag_tpu.ops.train_step_pallas import evaluate_candidates_pallas

    N, H, Cm, A, L = args.n, args.h, args.cm, args.alleles, 128
    live = min(args.live, H)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (H, L)).astype(np.float32)
    fA = np.zeros((Cm, H), np.float32)
    fB = np.zeros((Cm, H), np.float32)
    fA[:, :live] = rng.random((Cm, live))
    fB[:, :live] = rng.random((Cm, live))
    fA /= fA.sum(1, keepdims=True) * 2
    fB /= fB.sum(1, keepdims=True) * 2
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno_sel = rng.integers(0, 3, (N, L)).astype(np.int8)
    a12 = np.sort(rng.integers(0, A, (2, N)), 0).astype(np.int32)
    B = rng.poisson(1.0, N).astype(np.float32)
    g_cand = rng.integers(0, 3, (Cm, N)).astype(np.int8)
    is_oob = (B == 0)
    n_snp = np.int32(10)

    jz = jnp.asarray
    common = (jz(bits), jz(allele))
    rest = (jz(fA), jz(fB), jz(g_cand), jz(geno_sel), jz(a12[0]),
            jz(a12[1]), jz(is_oob), jz(B))

    jnp_fn = jax.jit(lambda *a: evaluate_candidates(
        a[0], a[1], n_snp, *a[2:], A))
    pl_fn = jax.jit(lambda *a: evaluate_candidates_pallas(*a, A))

    fns = {"jnp": (jnp_fn, common + rest), "pallas": (pl_fn, common + rest)}
    for name in list(fns):
        fn, fa = fns[name]
        t0 = time.perf_counter()
        try:
            out = fn(*fa)
            jax.block_until_ready(out)
        except Exception as e:  # VMEM OOM etc — keep the other engine
            print(f"{name} FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            del fns[name]
            continue
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s; "
              f"acc[:4]={np.asarray(out[0])[:4].tolist()} "
              f"ll[0]={float(out[1][0]):.6g}", flush=True)

    results = {k: [] for k in fns}
    for rep in range(args.reps):
        for name, (fn, fa) in fns.items():
            t0 = time.perf_counter()
            out = fn(*fa)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt * 1e3:.1f} ms", flush=True)

    print("---", flush=True)
    for name in fns:
        print(f"{name}: best {min(results[name]) * 1e3:.1f} ms "
              f"(all: {[round(x * 1e3, 1) for x in results[name]]})",
              flush=True)


if __name__ == "__main__":
    main()
