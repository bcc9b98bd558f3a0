"""Per-EM-iteration cost at cohort-resume shapes: jnp packed tier vs the
Pallas packed-mask kernel (ops/train_step_pallas.em_estep_pallas_packed).

The round-5 question left open by COVERAGE.md: the packed Pallas EM kernel
was built for the cohort tier (in-kernel bitfield unpack, mask streamed at
1/8 the HBM bytes) but never measured at the shapes that matter — the K=1
freeze resumes of the exact-at-scale run (N=102,400, H=640..1024), where
EM is ~all of the 3 s/step cost (CLAUDE.md round-4 state).

Methodology (the only trustworthy one here, per COVERAGE.md): same
process, interleaved engines, and a SLOPE measurement — time
_em_segment_run at it_end=2 and it_end=2+ITERS and divide the delta by
ITERS, so the once-per-step mask build/pack and fixed dispatch cost
cancel.  Random genotypes/haplotypes do not converge in that window, so
every candidate stays live for all timed iterations (verified via the
returned `it`).

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_em_cohort.py \
      --n 102400 --h 640 --iters 10 --reps 3
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=102_400)
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--cm", type=int, default=31)
    ap.add_argument("--live", type=int, default=560)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--engines", nargs="*",
                    default=["jnp", "pallas_em"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hibag_tpu.models import em as em_mod
    from hibag_tpu.models.em import _em_segment_init, _em_segment_run

    N, H, Cm, A, L = args.n, args.h, args.cm, 14, 128
    live = min(args.live, H)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (H, L)).astype(np.float32)
    freq = np.zeros(H, np.float32)
    freq[:live] = rng.random(live).astype(np.float32)
    freq /= freq.sum()
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno_sel = rng.integers(0, 3, (N, L)).astype(np.int8)
    a1 = np.sort(rng.integers(0, A, (2, N)), 0).astype(np.int32)
    B = rng.poisson(1.0, N).astype(np.float32)
    g_new = rng.integers(0, 3, (Cm, N)).astype(np.int8)
    afreq = rng.uniform(0.2, 0.8, Cm).astype(np.float32)
    total_n = float(B.sum() / 2)

    # the K=1 resume budget from train_fused (8 GB): packed tier for both
    budget = em_mod.MASK_TOTAL_BUDGET_BYTES
    packed_bytes = N * H * (H // 8)
    print(f"N={N} H={H} Cm={Cm} live={live} packed_mask="
          f"{packed_bytes / 2**30:.2f} GiB budget={budget / 2**30:.0f} GiB",
          flush=True)

    fv = jnp.asarray(freq)
    argz = (fv, fv > 0, jnp.asarray(bits), jnp.asarray(allele),
            jnp.asarray(geno_sel), jnp.asarray(a1[0]), jnp.asarray(a1[1]),
            jnp.asarray(B), jnp.asarray(g_new))

    def run(engine, it_end):
        # reltol=0 -> tolerance ~0: candidates never converge inside the
        # timed window, so the slope really is `iters` iterations (random
        # data converges in ~2 iters at the default reltol)
        st = _em_segment_init(*argz, jnp.asarray(afreq), total_n,
                              reltol=0.0, mask_budget=budget,
                              engine=engine)
        out = _em_segment_run(*argz, total_n, st, jnp.asarray(it_end),
                              mask_budget=budget, engine=engine)
        jax.block_until_ready(out)
        return out

    lo, hi = 2, 2 + args.iters
    # compile both engines at both iteration counts first
    for e in args.engines:
        for it_end in (lo, hi):
            out = run(e, it_end)
            print(f"compiled {e} it_end={it_end} "
                  f"(reached it={int(out[4])})", flush=True)

    results = {e: [] for e in args.engines}
    for rep in range(args.reps):
        for e in args.engines:
            t0 = time.perf_counter()
            run(e, lo)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(e, hi)
            t_hi = time.perf_counter() - t0
            per_it = (t_hi - t_lo) / args.iters
            results[e].append(per_it)
            print(f"rep{rep} {e}: t({lo})={t_lo:.3f}s t({hi})={t_hi:.3f}s"
                  f" -> {per_it * 1e3:.1f} ms/iter", flush=True)

    print("---", flush=True)
    for e in args.engines:
        best = min(results[e])
        print(f"{e}: best {best * 1e3:.1f} ms/iter "
              f"(all: {[round(x * 1e3, 1) for x in results[e]]})",
              flush=True)


if __name__ == "__main__":
    main()
