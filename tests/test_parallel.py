"""Mesh parallelism on the 8-virtual-device CPU platform.

The standard JAX substitute for multi-chip testing: the same Mesh/NamedSharding
code that runs on a TPU slice runs here on 8 CPU devices, so data-parallel
gradients, sharded batches, and member-sharded ensembles are all exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
from sbgm_danra_tpu.parallel.ensemble import generate_ensemble, repeat_condition
from sbgm_danra_tpu.parallel.mesh import make_mesh, shard_batch, shard_batch_spec
from sbgm_danra_tpu.parallel.train import make_parallel_steps
from sbgm_danra_tpu.sampling import SamplerConfig
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.training.state import create_train_state
from sbgm_danra_tpu.training.train_step import make_train_step

from tests.test_training import tiny_batch as _tiny_batch_fixture  # reuse maker
from tests.test_training import tiny_config, tiny_model


@pytest.fixture(scope="module")
def mesh(devices):
    return make_mesh({"data": 8})


def _batch(b=8, s=32):
    rng = np.random.default_rng(0)
    return {
        "x": jnp.asarray(rng.normal(size=(b, s, s, 1)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 5, size=(b,)).astype(np.int32)),
        "cond_img": jnp.asarray(rng.normal(size=(b, s, s, 1)).astype(np.float32)),
        "lsm_cond": jnp.asarray(rng.normal(size=(b, s, s, 2)).astype(np.float32)),
        "topo_cond": jnp.asarray(rng.normal(size=(b, s, s, 2)).astype(np.float32)),
        "sdf": jnp.asarray(rng.uniform(size=(b, s, s, 1)).astype(np.float32)),
    }


class TestMesh:
    def test_make_mesh(self, mesh):
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == 8

    def test_mesh_shape_validation(self, devices):
        with pytest.raises(ValueError):
            make_mesh({"data": 3})

    def test_shard_batch_places_shards(self, mesh):
        batch = shard_batch(mesh, _batch())
        x = batch["x"]
        assert len(x.addressable_shards) == 8
        assert x.addressable_shards[0].data.shape == (1, 32, 32, 1)


class TestDataParallelTraining:
    def test_dp_matches_single_device(self, mesh, tmp_path):
        """The sharded step must produce the same loss and params as the
        single-device step on the identical global batch."""
        import os

        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate

        root = str(tmp_path / "env")
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=8,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        model = tiny_model()
        batch = _batch()
        init = {k: v for k, v in batch.items() if k != "sdf"}
        state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))

        # single device
        step1 = jax.jit(make_train_step(model, VESDE()))
        s1, m1 = step1(state, batch, jax.random.PRNGKey(1))

        # mesh
        train_step, eval_step, pstate, batch_sh = make_parallel_steps(
            model, VESDE(), cfg, state, mesh
        )
        sharded = jax.tree.map(lambda x: jax.device_put(x, batch_sh), batch)
        s2, m2 = train_step(pstate, sharded, jax.random.PRNGKey(1))

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
        a = jax.tree.leaves(s1.params)[0]
        b = jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

        # eval step works on sharded batches too
        em = eval_step(s2, sharded, jax.random.PRNGKey(2))
        assert np.isfinite(float(em["loss"]))


class TestEnsemble:
    def test_repeat_condition(self):
        cond = {"y": jnp.array([3]), "cond_img": jnp.ones((1, 4, 4, 2)), "none": None}
        out = repeat_condition(cond, 8)
        assert out["y"].shape == (8,)
        assert out["cond_img"].shape == (8, 4, 4, 2)
        assert out["none"] is None

    def test_sharded_ensemble_members_differ(self, mesh):
        mu, s0 = 1.0, 2.0
        sde = VESDE()

        def score(x, t, **kw):
            var = s0**2 + sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - mu) / var

        samples = generate_ensemble(
            score,
            jax.random.PRNGKey(0),
            n_members=16,
            sample_shape=(8, 8, 1),
            sampler="em_sampler",
            config=SamplerConfig(num_steps=50),
            mesh=mesh,
        )
        assert samples.shape == (16, 8, 8, 1)
        assert len(samples.addressable_shards) == 8
        arr = np.asarray(samples)
        # members are distinct draws
        assert np.std(arr.mean(axis=(1, 2, 3))) > 0.05
        # and statistically sane
        assert arr.mean() == pytest.approx(mu, abs=0.6)

    def test_unsharded_path(self):
        sde = VESDE()
        score = lambda x, t, **kw: -x / sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
        samples = generate_ensemble(
            score, jax.random.PRNGKey(1), 4, (8, 8, 1),
            sampler="em_sampler", config=SamplerConfig(num_steps=20),
        )
        assert samples.shape == (4, 8, 8, 1)


class TestRingAttention:
    def test_matches_dense_attention(self, mesh):
        from sbgm_danra_tpu.parallel.ring_attention import ring_self_attention

        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        shape = (2, 128, 2, 16)  # S=128 sharded 16-per-device over 8 devices
        q = jax.random.normal(kq, shape)
        k = jax.random.normal(kk, shape)
        v = jax.random.normal(kv, shape)
        got = ring_self_attention(q, k, v, mesh, "data")
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)
        # output stays token-sharded across the ring
        assert len(got.addressable_shards) == 8

    def test_rejects_nondivisible_tokens(self, mesh):
        from sbgm_danra_tpu.parallel.ring_attention import ring_self_attention

        x = jnp.zeros((1, 100, 2, 16))
        with pytest.raises(ValueError):
            ring_self_attention(x, x, x, mesh, "data")


class TestTensorParallelHooks:
    def test_forward_with_sharded_params(self, devices):
        """Model forward on a ('data', 'model') mesh with TP-sharded params."""
        from sbgm_danra_tpu.parallel.mesh import make_mesh
        from sbgm_danra_tpu.parallel.tp import shard_params, sharded_param_fraction

        mesh2d = make_mesh({"data": 4, "model": 2})
        model = tiny_model()
        rng = np.random.default_rng(0)
        kwargs = dict(
            x=jnp.asarray(rng.normal(size=(4, 32, 32, 1)).astype(np.float32)),
            t=jnp.full((4,), 0.5),
            y=jnp.array([1, 2, 3, 4]),
            cond_img=jnp.asarray(rng.normal(size=(4, 32, 32, 1)).astype(np.float32)),
            lsm_cond=jnp.zeros((4, 32, 32, 2)),
            topo_cond=jnp.zeros((4, 32, 32, 2)),
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs, train=False)
        ref = model.apply(variables, **kwargs, train=False)

        sharded = dict(variables)
        sharded["params"] = shard_params(variables["params"], mesh2d)
        frac = sharded_param_fraction(variables["params"], mesh2d)
        # tiny test model (64-ch) has few >=128-out kernels; the flagship
        # 512-ch model shards the majority of its bytes
        assert frac > 0.03

        out = jax.jit(lambda v: model.apply(v, **kwargs, train=False))(sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_nondivisible_leaves_fall_back(self, devices):
        from jax.sharding import PartitionSpec as P

        from sbgm_danra_tpu.parallel.mesh import make_mesh
        from sbgm_danra_tpu.parallel.tp import shard_params

        mesh2d = make_mesh({"data": 1, "model": 8})
        params = {"layer": {"kernel": jnp.zeros((3, 3, 4, 132))}}  # 132 % 8 != 0
        out = shard_params(params, mesh2d)
        assert out["layer"]["kernel"].sharding.spec == P()


class TestEnsembleEDM:
    def test_sharded_edm_ensemble(self, mesh):
        """EDM's 68-NFE path through the sharded member axis (the production
        fast-ensemble configuration)."""
        mu, s0 = 1.0, 2.0
        sde = VESDE()

        def score(x, t, **kw):
            var = s0**2 + sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - mu) / var

        samples = generate_ensemble(
            score,
            jax.random.PRNGKey(2),
            n_members=16,
            sample_shape=(8, 8, 1),
            sampler="edm_sampler",
            config=SamplerConfig(num_steps=18, s_churn=4.0),
            mesh=mesh,
        )
        assert samples.shape == (16, 8, 8, 1)
        assert len(samples.addressable_shards) == 8
        arr = np.asarray(samples)
        assert np.std(arr.mean(axis=(1, 2, 3))) > 0.05
        assert np.isfinite(arr).all()


class TestEnsemblePadding:
    def test_nondivisible_members_stay_sharded(self, mesh):
        """100 % 8 != 0: members are padded to the next device multiple and
        trimmed, NOT silently dropped to a single device (the BASELINE
        projection math assumes the sharded path for any n_members)."""
        mu, s0 = 1.0, 2.0
        sde = VESDE()

        def score(x, t, **kw):
            var = s0**2 + sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - mu) / var

        kwargs = dict(
            sample_shape=(8, 8, 1), sampler="em_sampler",
            config=SamplerConfig(num_steps=50),
        )
        samples = generate_ensemble(
            score, jax.random.PRNGKey(0), n_members=100, mesh=mesh, **kwargs
        )
        assert samples.shape == (100, 8, 8, 1)
        arr = np.asarray(samples)
        assert np.isfinite(arr).all()
        # statistically equal to the unsharded ensemble (same stationary law)
        unsharded = np.asarray(generate_ensemble(
            score, jax.random.PRNGKey(0), n_members=100, **kwargs
        ))
        assert arr.mean() == pytest.approx(unsharded.mean(), abs=0.4)
        assert arr.std() == pytest.approx(unsharded.std(), rel=0.15)
