"""Decompose the config[0] warm training iteration: host prep vs device loop.

Times, inside train_fused_batch: bootstrap/init-haplotype host prep, the
fused_grow_batch device dispatch (block_until_ready), and classifier
post-processing. Supports an hcap sweep and a batch-size (K) sweep for the
K-scaling investigation (VERDICT r3 item 2). Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_train.py \
      [--k 25 50 100] [--hcap 128] [--overflow freeze]
Bare integers are treated as hcap values (round-3 usage).
"""

import sys
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hibag_tpu.models.train import train_parallel
    from hibag_tpu.models import train_fused
    from hibag_tpu.utils.bench_data import headline_1000snp, load_ceu

    hla, geno = load_ceu()
    fg = headline_1000snp(geno)

    # instrument fused_grow_batch: per-dispatch wall time + batch size +
    # hcap (freeze-resume dispatches show up as smaller-K entries)
    orig = train_fused.fused_grow_batch
    marks = {}

    def timed(bits0, *a, **kw):
        t0 = time.perf_counter()
        out = orig(bits0, *a, **kw)
        jax.block_until_ready(out)
        src = bits0 if bits0 is not None else kw["state0"].bits
        marks.setdefault("grow", []).append(
            (time.perf_counter() - t0, src.shape[0], src.shape[1]))
        return out

    train_fused.fused_grow_batch = timed

    ks, hcaps, overflow = [], [], "freeze"
    mode = None
    for x in sys.argv[1:]:
        if x == "--k":
            mode = "k"
        elif x == "--hcap":
            mode = "h"
        elif x == "--overflow":
            mode = "o"
        elif mode == "k":
            ks.append(int(x))
        elif mode == "o":
            overflow = x
        else:
            hcaps.append(int(x))
    ks = ks or [25]
    hcaps = hcaps or [128]

    for K in ks:
        for hcap in hcaps:
            kw = dict(n_classifiers=K, batch=K, verbose=False,
                      with_matching=False, mode="fused", hcap=hcap,
                      max_steps=192, on_overflow=overflow)
            print(f"=== K={K} hcap={hcap} ({overflow}): warmup "
                  f"(compile)...", flush=True)
            train_parallel(hla, fg, seed=1, **kw)
            print("warm reps", flush=True)
            best = None
            for rep in range(5):
                marks.clear()
                t0 = time.perf_counter()
                train_parallel(hla, fg, seed=100, **kw)
                total = time.perf_counter() - t0
                grow = sum(t for t, *_ in marks.get("grow", []))
                disp = [(round(t, 3), k_, h_)
                        for t, k_, h_ in marks.get("grow", [])]
                print(f"rep{rep}: total {total:.3f}s device-loop "
                      f"{grow:.3f}s dispatches {disp} host/other "
                      f"{total - grow:.3f}s", flush=True)
                best = total if best is None else min(best, total)
            print(f"K={K} hcap={hcap}: best {best:.3f}s = "
                  f"{K / best:.2f} cls/s", flush=True)


if __name__ == "__main__":
    main()
