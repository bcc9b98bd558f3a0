"""Compile-only memory probe for the fused trainer at cohort scale.

Lowers fused_grow_segment (the jitted device loop inside the
fused_grow_batch host driver) at the exact shapes of a given cohort size
and prints XLA's buffer-assignment memory analysis WITHOUT executing —
isolates whether a TPU-worker crash is an HBM blowup vs a runtime fault.

Usage: python scripts/mem_probe.py [N] [hcap] [P] [K]
"""

import os
import sys

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hibag_tpu.models.train import _shape_bucket
from hibag_tpu.models.train_fused import GrowState, fused_grow_segment


def probe(N=32768, hcap=256, P=1321, K=4, mtry=36, n_alleles=26):
    Np = _shape_bucket(N)
    Pp = _shape_bucket(P)
    L = 128
    s = jax.ShapeDtypeStruct
    state = GrowState(
        bits=s((K, hcap, L), jnp.float32),
        freq=s((K, hcap), jnp.float32),
        allele=s((K, hcap), jnp.int32),
        geno_sel=s((K, Np, L), jnp.int8),
        n_snp=s((K,), jnp.int32),
        snp_order=s((K, L), jnp.int32),
        pool=s((K, Pp), jnp.bool_),
        gmax_acc=s((K,), jnp.int32),
        gmin_loss=s((K,), jnp.float32),
        done=s((K,), jnp.bool_),
        key=s((K, 2), jnp.uint32),
        overflow=s((K,), jnp.int32),
        n_step=s((K,), jnp.int32),
        steps=s((), jnp.int32),
    )
    print(f"probing N={N} (pad {Np}) P={P} (pad {Pp}) hcap={hcap} K={K} "
          f"mtry={mtry} A={n_alleles}", flush=True)
    lowered = fused_grow_segment.lower(
        state, s((), jnp.int32), s((), jnp.int32), s((K, Np), jnp.float32),
        s((Np,), jnp.bool_), s((Np, Pp), jnp.int8), s((Np,), jnp.int32),
        s((Np,), jnp.int32), 0.0005, float(N), n_alleles, mtry, True)
    print("lowered ok; compiling...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("memory analysis:", ma, flush=True)
    try:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            v = getattr(ma, attr, None)
            if v is not None:
                print(f"  {attr}: {v/1e9:.3f} GB", flush=True)
    except Exception as e:
        print("attr walk failed:", e)


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    hcap = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 1321
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    probe(N=N, hcap=hcap, P=P, K=K)
