"""Inference service: engine generation + live HTTP round-trip."""

import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
from sbgm_danra_tpu.serve import InferenceEngine, make_handler

from tests.test_training import tiny_config


@pytest.fixture(scope="module")
def trained_env(tmp_path_factory):
    """A tiny trained checkpoint to serve."""
    root = str(tmp_path_factory.mktemp("serve_env"))
    generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=12,
                           crop_region=(8, 40, 16, 56)))
    cfg = tiny_config(root)
    cfg.sampler.n_timesteps = 6
    cfg.evaluation.n_steps = 6
    from sbgm_danra_tpu.data.factory import make_loaders
    from sbgm_danra_tpu.training.pipeline import TrainingPipeline

    train_loader, valid_loader, _ = make_loaders(cfg)
    pipe = TrainingPipeline(cfg, train_loader, valid_loader)
    pipe.train(epochs=1, steps_per_epoch=2)
    return cfg


@pytest.fixture(scope="module")
def engine(trained_env):
    eng = InferenceEngine(trained_env, max_members=4)
    eng.warmup()
    return eng


def _conditions(hw=(32, 32)):
    rng = np.random.default_rng(0)
    return {
        "y": np.int32(2),
        "cond_img": rng.normal(size=(*hw, 1)).astype(np.float32),
        "lsm_cond": np.ones((*hw, 2), np.float32),
        "topo_cond": np.zeros((*hw, 2), np.float32),
    }


class TestSamplingPipelineLoad:
    def test_fused_config_loads_with_host_loader(self, trained_env):
        """Regression: production configs enable training.fused_steps, but the
        sampling path (serving/generation) runs with host loaders and must not
        trip the fused-scan device-loader guard (training/pipeline.py) — it
        never trains. Broke when fused_steps landed in flagship configs (r5)."""
        import copy

        from sbgm_danra_tpu.cli.entries import _load_pipeline_for_sampling

        cfg = copy.deepcopy(trained_env)
        cfg.training.fused_steps = 8
        cfg.data_handling.device_dataset = False
        pipeline, _ = _load_pipeline_for_sampling(cfg)
        assert pipeline.cfg.training.fused_steps == 0
        # the caller's config is untouched (serving reads sampler knobs off it)
        assert cfg.training.fused_steps == 8


class TestInferenceEngine:
    def test_generate_members(self, engine):
        out = engine.generate(_conditions(), n_members=3, seed=1)
        assert out.shape == (3, 32, 32)
        assert np.isfinite(out).all()
        # distinct members
        assert np.std(out.mean(axis=(1, 2))) > 0

    def test_seed_determinism(self, engine):
        a = engine.generate(_conditions(), n_members=2, seed=5)
        b = engine.generate(_conditions(), n_members=2, seed=5)
        np.testing.assert_array_equal(a, b)

    def test_capacity_guard(self, engine):
        with pytest.raises(ValueError):
            engine.generate(_conditions(), n_members=99)

    def test_partial_conditions_match_compiled_structure(self, engine):
        """Requests missing condition keys must still hit the AOT-compiled
        executable (missing keys = CFG-null zeros), not fail with a pytree
        structure mismatch (ADVICE r2 medium)."""
        cond = _conditions()
        cond.pop("topo_cond")
        cond.pop("y")
        out = engine.generate(cond, n_members=2, seed=7)
        assert out.shape == (2, 32, 32)
        assert np.isfinite(out).all()
        # empty conditions = fully CFG-null request; also must serve
        out2 = engine.generate({}, n_members=1, seed=7)
        assert out2.shape == (1, 32, 32)
        assert np.isfinite(out2).all()


class TestCoalescing:
    """Request coalescing (VERDICT r3 item 5): packing into one fixed-shape
    dispatch, and bit-identical results whether a request ran alone or
    co-batched (the per-member-key property the batcher relies on)."""

    def test_cobatched_equals_solo(self, engine):
        import jax

        from sbgm_danra_tpu.serve import _Ticket

        solo = engine.generate(_conditions(), n_members=2, seed=21)

        # reproduce the same request's rows co-batched with a stranger's
        row = engine._zero_row()
        cond = _conditions()
        row.update({k: np.asarray(v, np.float32) for k, v in cond.items() if k != "y"})
        row["y"] = np.asarray(cond["y"], np.int32)
        mine = _Ticket(np.asarray(jax.random.split(jax.random.PRNGKey(21), 2)),
                       row, 2)
        other = _Ticket(np.asarray(jax.random.split(jax.random.PRNGKey(99), 2)),
                        engine._zero_row(), 2)
        before = engine.n_dispatches
        engine._dispatch([other, mine])  # one shared program call
        assert engine.n_dispatches == before + 1

        bt = engine.back_transforms.get("generated")
        cobatched = np.asarray(bt(mine.out)) if bt is not None else mine.out
        np.testing.assert_array_equal(cobatched, solo)

    def test_concurrent_requests_all_served(self, engine):
        results = {}

        def client(seed):
            results[seed] = engine.generate(_conditions(), n_members=1, seed=seed)

        threads = [threading.Thread(target=client, args=(s,)) for s in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 6
        for seed, out in results.items():
            assert out.shape == (1, 32, 32)
            assert np.isfinite(out).all()
            # per-request key derivation: same seed alone == same seed under load
            np.testing.assert_array_equal(
                out, engine.generate(_conditions(), n_members=1, seed=seed)
            )


class TestHTTPAPI:
    @pytest.fixture(scope="class")
    def server(self, engine):
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["sample_hw"] == [32, 32]

    def test_generate_roundtrip(self, server):
        cond = _conditions()
        payload = {
            "conditions": {k: np.asarray(v).tolist() for k, v in cond.items()},
            "n_members": 2,
            "seed": 3,
        }
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body["shape"] == [2, 32, 32]
        arr = np.asarray(body["generated"])
        assert np.isfinite(arr).all()
        assert body["latency_s"] >= 0

    def test_bad_request(self, server):
        req = urllib.request.Request(
            f"{server}/generate", data=b'{"n_members": 999}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_unknown_path(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server}/nope")
        assert e.value.code == 404


class TestServeSpreadCalibration:
    """Per-request ensemble inflation (evaluate/calibration.py) through the
    engine and the HTTP API. tiny_config's HR variable is zscore-normalized,
    so the affine back-transform commutes with the member rescale and the
    physical-space outputs can be compared exactly."""

    def test_engine_applies_alpha(self, engine):
        from sbgm_danra_tpu.evaluate.calibration import apply_spread_scale

        raw = engine.generate(_conditions(), n_members=3, seed=11)
        cal = engine.generate(
            _conditions(), n_members=3, seed=11, spread_calibration=0.5
        )
        # atol covers fp32 cancellation near zero-crossings: members are
        # O(1e3) after the affine back-transform, and scale-about-the-mean
        # only commutes with it exactly in real arithmetic
        np.testing.assert_allclose(cal, apply_spread_scale(raw, 0.5), rtol=1e-5, atol=1e-3)
        # alpha is a no-op for single members (mean == member)
        one = engine.generate(_conditions(), n_members=1, seed=11,
                              spread_calibration=0.5)
        np.testing.assert_allclose(one, raw[:1], rtol=1e-5, atol=1e-5)

    def test_http_request_knob(self, engine):
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from sbgm_danra_tpu.serve import make_handler

        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            payload = {"n_members": 2, "seed": 4, "spread_calibration": 0.0}
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                body = json.loads(r.read())
            arr = np.asarray(body["generated"])
            # alpha=0 collapses both members onto the ensemble mean
            np.testing.assert_allclose(arr[0], arr[1], rtol=1e-4, atol=1e-4)
        finally:
            srv.shutdown()
