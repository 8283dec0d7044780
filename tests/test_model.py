"""Score UNet: shapes, feature-map pyramid, param-count parity, conditioning.

Parity targets from the reference (sbgm/score_unet.py; BASELINE.md):
- 5 encoder fmaps with channels [64, 64, 128, 256, 512] at strides
  [2, 4, 8, 16, 32];
- 19,083,842 trainable params in the default configuration (in=6 cond channels,
  time_embedding 256, 4 seasons, group-norm decoder, resize-conv upsampling).
  docs/PARAMS.md derives this module-by-module: the reference source as
  mounted counts 19,080,898 analytically; the +2,944 is this decoder's affine
  norm scales/offsets (torch InstanceNorm2d is affine=False). The 17,511,874
  in the reference's 2025-07-16 training log is an earlier revision —
  PARAMS.md reconstructs it EXACTLY (1-channel geo, attention at all stages,
  ConvTranspose2d upsampling), and its 768 non-trainable params match the six
  128-wide fixed Fourier buffers this model also carries;
- output = decoder output / marginal_prob_std(t).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.models.unet import Decoder, Encoder, ModelSpec, ScoreUNet, build_score_model
from sbgm_danra_tpu.sde import VESDE

REFERENCE_PARAM_COUNT = 19_083_842


def _make_inputs(b=2, size=64, n_lr=2, num_classes=4):
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.normal(size=(b, size, size, 1)).astype(np.float32)),
        t=jnp.asarray(rng.uniform(0.01, 1.0, size=(b,)).astype(np.float32)),
        y=jnp.asarray(rng.integers(0, num_classes + 1, size=(b,))),
        cond_img=jnp.asarray(rng.normal(size=(b, size, size, n_lr)).astype(np.float32)),
        lsm_cond=jnp.asarray(rng.normal(size=(b, size, size, 2)).astype(np.float32)),
        topo_cond=jnp.asarray(rng.normal(size=(b, size, size, 2)).astype(np.float32)),
    )


def _build(num_classes=4, **kw):
    spec = ModelSpec(in_channels=6, num_classes=num_classes, **kw)
    return build_score_model(spec, VESDE())


def _init(model, inputs):
    return model.init({"params": jax.random.PRNGKey(0)}, **inputs, train=False)


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class TestEncoder:
    def test_fmap_pyramid(self):
        enc = Encoder(num_classes=4)
        inputs = _make_inputs(size=64)
        x_cat_free = inputs["x"]
        variables = enc.init(
            {"params": jax.random.PRNGKey(0)},
            x_cat_free,
            inputs["t"],
            y=inputs["y"],
            cond_img=inputs["cond_img"],
            lsm_cond=inputs["lsm_cond"],
            topo_cond=inputs["topo_cond"],
            train=False,
        )
        fmaps = enc.apply(
            variables,
            x_cat_free,
            inputs["t"],
            y=inputs["y"],
            cond_img=inputs["cond_img"],
            lsm_cond=inputs["lsm_cond"],
            topo_cond=inputs["topo_cond"],
            train=False,
        )
        shapes = [f.shape for f in fmaps]
        assert shapes == [
            (2, 32, 32, 64),
            (2, 16, 16, 64),
            (2, 8, 8, 128),
            (2, 4, 4, 256),
            (2, 2, 2, 512),
        ]

    def test_attention_only_on_top_two_stages(self):
        enc = Encoder(num_classes=4)
        inputs = _make_inputs(size=64)
        variables = enc.init(
            {"params": jax.random.PRNGKey(0)},
            inputs["x"], inputs["t"], y=inputs["y"], cond_img=inputs["cond_img"],
            lsm_cond=inputs["lsm_cond"], topo_cond=inputs["topo_cond"], train=False,
        )
        names = set(variables["params"].keys())
        assert "attn3" in names and "attn4" in names
        assert "attn0" not in names and "attn1" not in names and "attn2" not in names

    def test_null_label_embedding_row_zeroed(self):
        enc = Encoder(num_classes=4)
        inputs = _make_inputs(size=64)
        variables = enc.init(
            {"params": jax.random.PRNGKey(0)},
            inputs["x"], inputs["t"], y=inputs["y"], cond_img=inputs["cond_img"],
            lsm_cond=inputs["lsm_cond"], topo_cond=inputs["topo_cond"], train=False,
        )
        emb = variables["params"]["label_emb"]["embedding"]
        assert emb.shape == (5, 256)
        np.testing.assert_array_equal(np.asarray(emb[0]), 0.0)
        assert float(jnp.abs(emb[1:]).sum()) > 0


class TestScoreUNet:
    @pytest.mark.parametrize("size", [64, 128])
    def test_output_shape(self, size):
        model = _build()
        inputs = _make_inputs(size=size)
        variables = _init(model, inputs)
        out = model.apply(variables, **inputs, train=False)
        assert out.shape == (2, size, size, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_param_count_parity(self):
        model = _build()
        inputs = _make_inputs(size=64)
        variables = _init(model, inputs)
        n = _count(variables["params"])
        assert n == REFERENCE_PARAM_COUNT, (
            f"param count {n} != reference {REFERENCE_PARAM_COUNT} "
            f"(delta {n - REFERENCE_PARAM_COUNT})"
        )

    def test_sigma_division(self):
        # Output must equal the raw decoder output divided by sigma(t): evaluate
        # at two t values with identical decoder input impossible, so check the
        # scaling law statistically — magnitude should blow up as t -> 0.
        model = _build()
        inputs = _make_inputs(size=64)
        variables = _init(model, inputs)
        sde = VESDE()
        out_small_t = model.apply(
            variables, **{**inputs, "t": jnp.full((2,), 1e-3)}, train=False
        )
        out_big_t = model.apply(
            variables, **{**inputs, "t": jnp.full((2,), 1.0)}, train=False
        )
        ratio = float(jnp.std(out_small_t) / jnp.std(out_big_t))
        sigma_ratio = float(sde.marginal_prob_std(1.0) / sde.marginal_prob_std(1e-3))
        # decoder outputs have similar scale; the 1/sigma factor dominates.
        assert ratio > 0.05 * sigma_ratio

    def test_unconditional_variant(self):
        spec = ModelSpec(in_channels=0, num_classes=None)
        model = build_score_model(spec)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
        t = jnp.full((2,), 0.5)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
        out = model.apply(variables, x, t, train=False)
        assert out.shape == x.shape

    def test_train_mode_updates_batch_stats(self):
        model = _build()
        inputs = _make_inputs(size=64)
        variables = _init(model, inputs)
        assert "batch_stats" in variables
        _, mutated = model.apply(
            variables, **inputs, train=True, mutable=["batch_stats"]
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )
        assert changed

    def test_buffers_are_not_params(self):
        model = _build()
        inputs = _make_inputs(size=64)
        variables = _init(model, inputs)
        assert "buffers" in variables
        # encoder W + 5 decoder-block Ws (4 residual + final) = 6 buffers of 128.
        leaves = jax.tree.leaves(variables["buffers"])
        assert len(leaves) == 6
        assert all(l.shape == (128,) for l in leaves)

    def test_grad_flows_to_all_params(self):
        model = _build()
        inputs = _make_inputs(size=32)
        variables = _init(model, inputs)

        def loss(params):
            out = model.apply(
                {**variables, "params": params}, **inputs, train=False
            )
            return jnp.sum(out**2)

        grads = jax.grad(loss)(variables["params"])
        flat = jax.tree.leaves(grads)
        n_nonzero = sum(int(np.abs(np.asarray(g)).sum() > 0) for g in flat)
        # the final block's unused time projection gets no gradient; nearly all
        # other leaves must.
        assert n_nonzero / len(flat) > 0.95

    def test_jit_compiles(self):
        model = _build()
        inputs = _make_inputs(size=64)
        variables = _init(model, inputs)
        fwd = jax.jit(lambda v, **kw: model.apply(v, **kw, train=False))
        out = fwd(variables, **inputs)
        assert out.shape == (2, 64, 64, 1)


class TestDecoder:
    def test_rejects_wrong_fmap_count(self):
        dec = Decoder()
        fmaps = [jnp.zeros((1, 2, 2, 512))] * 3
        with pytest.raises(ValueError):
            dec.init({"params": jax.random.PRNGKey(0)}, fmaps, jnp.zeros((1,)))


class TestLoweringKnobs:
    """stem_impl / fuse_upsample change the XLA program, not the math or the
    checkpoint layout: identical param trees and (f32) outputs."""

    @pytest.mark.parametrize("knobs", [
        {"stem_impl": "s2d"},
        {"fuse_upsample": "dilated"},
        {"fuse_upsample": "phases"},
        {"stem_impl": "s2d", "fuse_upsample": "dilated"},
        {"fuse_head": True},
        {"stem_impl": "s2d", "fuse_head": True},
    ])
    def test_identical_params_and_outputs(self, knobs):
        inputs = _make_inputs(size=64)
        base = _build()
        fast = _build(**knobs)
        v0 = _init(base, inputs)
        v1 = _init(fast, inputs)
        # identical param trees (paths AND values: the holders reproduce
        # nn.Conv's names, shapes, and init RNG paths)
        flat0 = jax.tree_util.tree_flatten_with_path(v0["params"])[0]
        flat1 = jax.tree_util.tree_flatten_with_path(v1["params"])[0]
        assert [k for k, _ in flat0] == [k for k, _ in flat1]
        for (p, a), (_, b) in zip(flat0, flat1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))
        out0 = base.apply(v0, **inputs, train=False)
        out1 = fast.apply(v1, **inputs, train=False)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out0), rtol=2e-4, atol=2e-4
        )


class TestInferenceSpec:
    """inference_spec applies the measured per-shape winners (DESIGN 4a)."""

    def test_crop_scale_is_baseline(self):
        from sbgm_danra_tpu.models.unet import ModelSpec, inference_spec

        spec = inference_spec(ModelSpec(in_channels=6), image_hw=(128, 128))
        assert spec.stem_impl == "direct"
        assert spec.fuse_upsample == "none"
        assert spec.fuse_head is False

    def test_full_domain_fuses_head(self):
        from sbgm_danra_tpu.models.unet import ModelSpec, inference_spec

        spec = inference_spec(ModelSpec(in_channels=6), image_hw=(608, 800))
        assert spec.fuse_head is True
        # lowering knobs never change params/math, only the XLA program
        assert spec.stem_impl == "direct"
