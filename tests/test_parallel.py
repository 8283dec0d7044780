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
