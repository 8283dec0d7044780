"""Mesh parallelism on the 8-virtual-device CPU platform.

The standard JAX substitute for multi-chip testing: the same Mesh/NamedSharding
code that runs on a TPU slice runs here on 8 CPU devices, so data-parallel
gradients, sharded batches, and member-sharded ensembles are all exercised.
"""

import os
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

    def test_inline_matches_dense_under_jit(self, mesh):
        """ring_attention_inline inside a jitted fn under ring_context equals
        the dense path; without a context it IS the dense path."""
        from sbgm_danra_tpu.parallel.ring_attention import (
            ring_attention_inline,
            ring_context,
        )

        kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
        shape = (2, 64, 2, 16)
        q, k, v = (jax.random.normal(key, shape) for key in (kq, kk, kv))
        want = jax.nn.dot_product_attention(q, k, v)

        no_ctx = jax.jit(ring_attention_inline)(q, k, v)
        np.testing.assert_allclose(np.asarray(no_ctx), np.asarray(want), atol=1e-6)

        with ring_context(mesh, "data"):
            got = jax.jit(ring_attention_inline)(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)

    def test_module_backend_ring_matches_xla(self, mesh):
        """SpatialSelfAttention(backend='ring') under ring_context == the xla
        backend with identical params (VERDICT r2 item 3: the wiring)."""
        from sbgm_danra_tpu.models.attention import SpatialSelfAttention
        from sbgm_danra_tpu.parallel.ring_attention import ring_context

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 32))  # 128 tokens
        dense = SpatialSelfAttention(32, 2, backend="xla")
        ring = SpatialSelfAttention(32, 2, backend="ring")
        variables = dense.init(jax.random.PRNGKey(3), x)
        want = dense.apply(variables, x)
        with ring_context(mesh, "data"):
            got = jax.jit(lambda v, x: ring.apply(v, x))(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)

    def test_model_forward_ring_backend(self, mesh):
        """Full tiny score-model forward with attention_backend='ring' on the
        8-device mesh matches the single-device xla-backend forward; stages
        whose token count does not divide the mesh fall back dense (still
        exact)."""
        import dataclasses as dc

        from sbgm_danra_tpu.parallel.ring_attention import ring_context

        spec = ModelSpec(
            in_channels=6, num_classes=4, last_fmap_channels=64,
            time_embedding=32, num_heads=2, block_layers=(1, 1, 1, 1),
        )
        sde = VESDE()
        model_xla = build_score_model(spec, sde)
        model_ring = build_score_model(dc.replace(spec, attention_backend="ring"), sde)
        batch = _batch(b=2, s=64)  # attended maps: 4x4=16 tokens (sharded), 2x2=4 (fallback)
        t = jnp.full((2,), 0.5)
        variables = model_xla.init({"params": jax.random.PRNGKey(0)}, batch["x"], t,
                                   y=batch["y"], cond_img=batch["cond_img"],
                                   lsm_cond=batch["lsm_cond"],
                                   topo_cond=batch["topo_cond"], train=False)

        def fwd(model):
            def f(v):
                return model.apply(v, batch["x"], t, y=batch["y"],
                                   cond_img=batch["cond_img"],
                                   lsm_cond=batch["lsm_cond"],
                                   topo_cond=batch["topo_cond"], train=False)
            return jax.jit(f)(variables)

        want = fwd(model_xla)
        with ring_context(mesh, "data"):
            got = fwd(model_ring)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)


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


class TestTwoDMesh:
    """DPxTP ('data','model') mesh through the tp partition rules
    (VERDICT round-1 item 4b)."""

    def _setup(self, mesh_shape, tp):
        import __graft_entry__ as ge
        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.parallel.mesh import make_mesh
        from sbgm_danra_tpu.parallel.train import make_parallel_steps
        from sbgm_danra_tpu.training.state import create_train_state

        mesh = make_mesh(mesh_shape)
        model, sde, make_batch = ge._flagship(size=32, tiny=True)
        cfg = from_dict({"training": {"batch_size": 8, "learning_rate": 1e-3,
                                      "with_ema": True}})
        batch = make_batch(8)
        batch.pop("t")
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        steps = make_parallel_steps(model, sde, cfg, state, mesh, tp=tp)
        return steps, batch

    def test_dp_tp_matches_flat_dp(self, devices):
        (t_dp, e_dp, s_dp, sh_dp), batch = self._setup({"data": 8}, tp=False)
        (t_tp, e_tp, s_tp, sh_tp), _ = self._setup({"data": 4, "model": 2}, tp=True)
        b_dp = jax.tree.map(lambda x: jax.device_put(x, sh_dp), batch)
        b_tp = jax.tree.map(lambda x: jax.device_put(x, sh_tp), batch)
        ref = float(e_dp(s_dp, b_dp, jax.random.PRNGKey(2))["loss"])
        got = float(e_tp(s_tp, b_tp, jax.random.PRNGKey(2))["loss"])
        assert got == pytest.approx(ref, rel=1e-3)
        # and the TP step actually steps
        s_tp, m = t_tp(s_tp, b_tp, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))

    def test_tp_state_is_actually_sharded(self, devices):
        """At production widths the model-axis sharding must engage (the tiny
        test model is below MIN_SHARD_CHANNELS for most kernels)."""
        from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
        from sbgm_danra_tpu.parallel.mesh import make_mesh
        from sbgm_danra_tpu.parallel.tp import shard_params, sharded_param_fraction
        from sbgm_danra_tpu.sde import VESDE

        mesh = make_mesh({"data": 4, "model": 2})
        spec = ModelSpec(in_channels=6, num_classes=4, last_fmap_channels=512,
                         time_embedding=64, num_heads=2, block_layers=(1, 1, 1, 1))
        model = build_score_model(spec, VESDE())
        b = {
            "x": jnp.zeros((1, 32, 32, 1)), "t": jnp.full((1,), 0.5),
            "y": jnp.zeros((1,), jnp.int32), "cond_img": jnp.zeros((1, 32, 32, 2)),
            "lsm_cond": jnp.zeros((1, 32, 32, 2)), "topo_cond": jnp.zeros((1, 32, 32, 2)),
        }
        params = model.init({"params": jax.random.PRNGKey(0)}, **b, train=False)["params"]
        frac = sharded_param_fraction(params, mesh)
        assert frac > 0.5, f"only {frac:.2%} of param bytes sharded"
        sharded = shard_params(params, mesh)
        from jax.sharding import PartitionSpec as P
        n_model_sharded = sum(
            1 for leaf in jax.tree.leaves(sharded)
            if "model" in str(leaf.sharding.spec)
        )
        assert n_model_sharded > 10


class TestBigGridTraining:
    """Full-domain-scale remat'd DP training steps (VERDICT round-1 item 4a)."""

    def _run_step(self, H, W):
        import __graft_entry__ as ge
        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
        from sbgm_danra_tpu.parallel.mesh import make_mesh
        from sbgm_danra_tpu.parallel.train import make_parallel_steps
        from sbgm_danra_tpu.sde import VESDE
        from sbgm_danra_tpu.training.state import create_train_state

        spec = ModelSpec(in_channels=6, num_classes=4, last_fmap_channels=32,
                         time_embedding=16, num_heads=2, block_layers=(1, 1, 1, 1))
        sde = VESDE()
        model = build_score_model(spec, sde)
        rng = np.random.default_rng(0)
        b = 8
        batch = {
            "x": jnp.asarray(rng.normal(size=(b, H, W, 1)).astype(np.float32)),
            "y": jnp.zeros((b,), jnp.int32),
            "cond_img": jnp.asarray(rng.normal(size=(b, H, W, 2)).astype(np.float32)),
            "lsm_cond": jnp.asarray(rng.normal(size=(b, H, W, 2)).astype(np.float32)),
            "topo_cond": jnp.asarray(rng.normal(size=(b, H, W, 2)).astype(np.float32)),
        }
        cfg = from_dict({"training": {"batch_size": b, "learning_rate": 1e-3,
                                      "with_ema": True, "remat": True}})
        mesh = make_mesh({"data": 8})
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        train_step, _, state, batch_sh = make_parallel_steps(model, sde, cfg, state, mesh)
        sharded = jax.tree.map(lambda x: jax.device_put(x, batch_sh), batch)
        state, metrics = train_step(state, sharded, jax.random.PRNGKey(1))
        return float(metrics["loss"])

    def test_big_grid_remat_step(self, devices):
        """320x416 (half the padded DANRA domain per side) remat'd DP step."""
        assert np.isfinite(self._run_step(320, 416))

    @pytest.mark.skipif(
        not os.environ.get("SBGM_BIG_TESTS"),
        reason="608x800 (padded full domain) on the CPU mesh takes ~6 min; set SBGM_BIG_TESTS=1",
    )
    def test_full_domain_remat_step(self, devices):
        """The full padded 608x800 DANRA domain actually steps (measured green
        2026-08-16; kept env-gated for suite runtime)."""
        from sbgm_danra_tpu.evaluate.full_domain import padded_dims

        assert np.isfinite(self._run_step(*padded_dims(589, 789)))


class TestMultiHostInit:
    def test_two_process_distributed_init(self, tmp_path):
        """2-process jax.distributed.initialize CPU smoke: 8 global devices
        across 2 processes, cross-process global reduction via a pjit sum
        (VERDICT round-1 item 4c)."""
        import subprocess
        import sys

        worker = tmp_path / "worker.py"
        worker.write_text(
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import numpy as np\n"
            "import jax.numpy as jnp\n"
            "from jax.sharding import NamedSharding, PartitionSpec as P\n"
            "from sbgm_danra_tpu.parallel.mesh import initialize_distributed, make_mesh\n"
            "n = initialize_distributed()\n"
            "assert n == 2, n\n"
            "assert jax.device_count() == 8, jax.device_count()\n"
            "assert jax.local_device_count() == 4\n"
            "mesh = make_mesh({'data': 8})\n"
            "sharding = NamedSharding(mesh, P('data'))\n"
            "pid = jax.process_index()\n"
            "local = np.arange(4, dtype=np.float32) + 4 * pid\n"
            "g = jax.make_array_from_process_local_data(sharding, local, global_shape=(8,))\n"
            "total = jax.jit(jnp.sum)(g)\n"
            "assert float(total) == 28.0, float(total)\n"
            "print(f'proc {pid}: OK', flush=True)\n"
        )
        import socket

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs = []
        for pid in range(2):
            env = os.environ.copy()
            env.pop("PALLAS_AXON_POOL_IPS", None)  # no axon boot in workers
            env.update({
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "COORDINATOR_ADDRESS": f"localhost:{port}",
                "NUM_PROCESSES": "2",
                "PROCESS_ID": str(pid),
                "PYTHONPATH": root + ":" + env.get("PYTHONPATH", ""),
            })
            procs.append(subprocess.Popen(
                [sys.executable, str(worker)], env=env, cwd=root,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = [p.communicate(timeout=300)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
            assert "OK" in out
