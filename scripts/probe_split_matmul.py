"""Probe: is XLA's Precision.HIGH (bf16x3) einsum bitwise-equal to a hand
2-pass hi/lo split when one operand is EXACT in bf16 ({0,1} masks)?

If yes, the cohort EM's t-einsum (em._em_estep_chunk, Precision.HIGH) can
drop to 2 DEFAULT-precision passes with a pre-cast bf16 mask — bitwise
identical, ~2/3 the MXU cost — which matters at cohort scale where the EM
is MXU-bound (~120 ms/iter at N=102,400, H=640).

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python3 scripts/probe_split_matmul.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    S, H, C = 64, 640, 64
    mask = rng.integers(0, 2, (S, H, H)).astype(np.float32)
    f = rng.random((C, H)).astype(np.float32)

    @jax.jit
    def t_high(mask_f, fboth):
        return jnp.einsum("shj,cj->csh", mask_f, fboth,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

    @jax.jit
    def t_split(mask_f, fboth):
        mb = mask_f.astype(jnp.bfloat16)
        fh = fboth.astype(jnp.bfloat16)
        fl = (fboth - fh.astype(jnp.float32)).astype(jnp.bfloat16)
        th = jnp.einsum("shj,cj->csh", mb, fh,
                        preferred_element_type=jnp.float32)
        tl = jnp.einsum("shj,cj->csh", mb, fl,
                        preferred_element_type=jnp.float32)
        return th + tl

    a = np.asarray(t_high(mask, f))
    b = np.asarray(t_split(mask, f))
    eq = np.array_equal(a, b)
    d = np.abs(a - b)
    rel = d / np.maximum(np.abs(a), 1e-30)
    print(f"bitwise_equal={eq} max_abs={d.max():.3e} "
          f"max_rel={rel.max():.3e} n_diff={(d > 0).sum()}", flush=True)

    # timing at the cohort EM shape (one chunk's worth, interleaved)
    import time
    mask_j = jnp.asarray(mask)
    f_j = jnp.asarray(f)
    for fn, name in ((t_high, "high"), (t_split, "split2")):
        jax.block_until_ready(fn(mask_j, f_j))
    for rep in range(3):
        for fn, name in ((t_high, "high"), (t_split, "split2")):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(mask_j, f_j)
            jax.block_until_ready(out)
            print(f"rep{rep} {name}: {(time.perf_counter() - t0) * 100:.2f} "
                  f"ms/call", flush=True)


if __name__ == "__main__":
    main()
