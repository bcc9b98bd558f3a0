"""hcap sweep at the matched mid-scale training shape (1,000 samp x 266
SNP, 8 classifiers — the config BASELINE.md measured the reference at).

Uses bench.py's exact mid-scale data construction (shared helper
hibag_tpu.utils.bench_data.midscale_1000x266) so timings map 1:1 onto the
recorded midscale_train_cls_per_s_1000x266 metric. Run on TPU:
PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/profile_mid.py 128 256
"""

import sys
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hibag_tpu.models.train import train_parallel
    from hibag_tpu.models import train_fused
    from hibag_tpu.utils.bench_data import midscale_1000x266

    hla1000, g1000 = midscale_1000x266()

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

    overflow_mode = "freeze"
    hcaps = []
    for x in sys.argv[1:]:
        if x in ("freeze", "retry", "warn"):
            overflow_mode = x
        else:
            hcaps.append(int(x))
    hcaps = hcaps or [256]
    for hcap in hcaps:
        kw = dict(n_classifiers=8, batch=8, verbose=False,
                  with_matching=False, mode="fused", hcap=hcap,
                  max_steps=192, on_overflow=overflow_mode)
        print(f"=== hcap={hcap} ({overflow_mode}): warmup (compile)...",
              flush=True)
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
