"""Pallas fused conv3x3+GroupNorm+ReLU: exactness vs the XLA chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.ops.fused_conv_gn import conv3x3_gn_relu, reference_chain


def _params(key, cin, cout):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return (
        jax.random.normal(k1, (3, 3, cin, cout)) * 0.1,
        jax.random.normal(k2, (cout,)) * 0.05,
        1.0 + 0.1 * jax.random.normal(k3, (cout,)),
        0.1 * jax.random.normal(k4, (cout,)),
    )


class TestFusedConvGN:
    @pytest.mark.parametrize("shape,groups", [
        ((2, 16, 16, 8), 4),
        ((1, 32, 24, 16), 8),
        ((3, 8, 8, 32), 8),
    ])
    def test_matches_xla_chain(self, shape, groups):
        n, h, w, cin = shape
        cout = 2 * cin
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        kern, b, gamma, beta = _params(jax.random.PRNGKey(1), cin, cout)
        got = conv3x3_gn_relu(x, kern, b, gamma, beta, groups, interpret=True)
        want = reference_chain(x, kern, b, gamma, beta, groups)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_no_activation(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8))
        kern, b, gamma, beta = _params(jax.random.PRNGKey(3), 8, 16)
        got = conv3x3_gn_relu(x, kern, b, gamma, beta, 4,
                              activation=False, interpret=True)
        want = reference_chain(x, kern, b, gamma, beta, 4, activation=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
        assert float(jnp.min(got)) < 0  # relu really off

    def test_matches_flax_modules(self):
        """Against the actual nn.Conv + nn.GroupNorm modules the decoder uses."""
        import flax.linen as nn

        class Chain(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), name="conv")(x)
                x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="norm")(x)
                return nn.relu(x)

        x = jax.random.normal(jax.random.PRNGKey(4), (2, 12, 12, 8))
        m = Chain()
        variables = m.init(jax.random.PRNGKey(5), x)
        want = m.apply(variables, x)
        p = variables["params"]
        got = conv3x3_gn_relu(
            x, p["conv"]["kernel"], p["conv"]["bias"],
            p["norm"]["scale"], p["norm"]["bias"], groups=4, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
