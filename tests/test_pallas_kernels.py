import numpy as np
import pytest

import jax.numpy as jnp

from pgmpy_tpu.ops.pallas_kernels import weighted_bincount, weighted_bincount_pallas

# numeric golden module: re-runs on the real chip in the TPU parity lane
# (the Pallas one-hot MXU kernel only actually compiles there)
pytestmark = pytest.mark.tpu


class TestWeightedBincount:
    def _case(self, n=5000, length=300, seed=0):
        rng = np.random.default_rng(seed)
        idx = jnp.asarray(rng.integers(0, length, n), dtype=jnp.int32)
        w = jnp.asarray(rng.random(n), dtype=jnp.float32)
        ref = np.zeros(length)
        np.add.at(ref, np.asarray(idx), np.asarray(w, dtype=np.float64))
        return idx, w, ref

    def test_pallas_interpret_matches_numpy(self):
        idx, w, ref = self._case()
        got = np.asarray(weighted_bincount_pallas(idx, w, 300, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_dispatch_fallback_matches(self):
        idx, w, ref = self._case()
        got = np.asarray(weighted_bincount(idx, w, 300))
        np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_non_multiple_chunk(self):
        idx, w, ref = self._case(n=1537, length=64, seed=1)
        got = np.asarray(weighted_bincount_pallas(idx, w, 64, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_empty_bins(self):
        idx = jnp.asarray([5, 5, 5], dtype=jnp.int32)
        w = jnp.ones(3, dtype=jnp.float32)
        got = np.asarray(weighted_bincount_pallas(idx, w, 8, interpret=True))
        expected = np.zeros(8)
        expected[5] = 3
        np.testing.assert_allclose(got, expected, atol=1e-5)
