"""bench.py is a driver contract (one JSON line on real hardware) — pin that
its building blocks run: the flagship builder honors the lowering-knob env
overrides, and the train window compiles as ONE lax.scan program."""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_flagship_env_knobs(monkeypatch):
    monkeypatch.setenv("SBGM_BENCH_STEM_IMPL", "s2d")
    monkeypatch.setenv("SBGM_BENCH_FUSE_UPSAMPLE", "phases")
    monkeypatch.setenv("SBGM_BENCH_FUSE_HEAD", "1")
    import bench

    importlib.reload(bench)
    model, sde = bench._flagship(64)
    assert model.encoder.stem_impl == "s2d"
    assert model.decoder.fuse_upsample == "phases"
    assert model.decoder.fuse_head is True


def test_bench_train_window_runs_tiny(monkeypatch):
    for k in ("SBGM_BENCH_STEM_IMPL", "SBGM_BENCH_FUSE_UPSAMPLE", "SBGM_BENCH_FUSE_HEAD"):
        monkeypatch.delenv(k, raising=False)
    import bench

    importlib.reload(bench)
    sps = bench.bench_train(batch=2, size=32, iters=2)
    assert np.isfinite(sps) and sps > 0
