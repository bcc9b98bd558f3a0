"""Fused Pallas scoring kernel vs the jnp reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hibag_tpu.ops.scoring import posterior_scores
from hibag_tpu.ops.scoring_pallas import classifier_posteriors


def _random_classifier(rng, H=40, L=128, A=14, N=24, n_snp=20):
    bits = rng.integers(0, 2, (H, L)).astype(np.float32)
    bits[:, n_snp:] = 0
    freq = rng.random(H).astype(np.float32)
    freq[H - 5:] = 0  # padded slots
    freq[freq > 0] /= freq[freq > 0].sum()
    allele = np.sort(rng.integers(0, A, H)).astype(np.int32)
    geno = rng.integers(0, 4, (N, L)).astype(np.int8)
    geno[:, n_snp:] = 3
    return bits, freq, allele, geno


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_reference(seed):
    rng = np.random.default_rng(seed)
    bits, freq, allele, geno = _random_classifier(rng)
    ref = posterior_scores(jnp.asarray(bits), jnp.asarray(freq),
                           jnp.asarray(allele), jnp.asarray(geno), 14)
    out = classifier_posteriors(jnp.asarray(bits), jnp.asarray(freq),
                                jnp.asarray(allele), jnp.asarray(geno), 14,
                                interpret=jax.default_backend() == "cpu")
    np.testing.assert_allclose(np.asarray(out["dmin"]),
                               np.asarray(ref["dmin"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["S"]), np.asarray(ref["S"]),
                               rtol=2e-4, atol=1e-30)
    np.testing.assert_allclose(np.asarray(out["total"]),
                               np.asarray(ref["total"]), rtol=2e-4)


def test_pallas_missing_heavy():
    rng = np.random.default_rng(7)
    bits, freq, allele, geno = _random_classifier(rng, N=8)
    geno[:4] = 3  # all-missing samples
    ref = posterior_scores(jnp.asarray(bits), jnp.asarray(freq),
                           jnp.asarray(allele), jnp.asarray(geno), 14)
    out = classifier_posteriors(jnp.asarray(bits), jnp.asarray(freq),
                                jnp.asarray(allele), jnp.asarray(geno), 14,
                                interpret=jax.default_backend() == "cpu")
    np.testing.assert_allclose(np.asarray(out["S"]), np.asarray(ref["S"]),
                               rtol=2e-4, atol=1e-30)
