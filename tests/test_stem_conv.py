"""Space-to-depth stem conv == direct 8x8/s2 conv (torch geometry)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.ops.stem_conv import conv8x8s2_direct, conv8x8s2_s2d


@pytest.mark.parametrize("shape", [(2, 16, 16, 3, 8), (1, 12, 20, 7, 5)])
def test_s2d_matches_direct(shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(8, 8, cin, cout)) * 0.1).astype(np.float32))
    ref = conv8x8s2_direct(x, k)
    got = conv8x8s2_s2d(x, k)
    assert got.shape == ref.shape == (b, h // 2, w // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_odd_size_falls_back():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 9, 9, 2)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(8, 8, 2, 4)) * 0.1).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(conv8x8s2_s2d(x, k)), np.asarray(conv8x8s2_direct(x, k)), rtol=1e-6
    )
