"""Sweep engine: samplers, pruning, sqlite sharing, end-to-end objective."""

import math
import os

import numpy as np
import pytest

from sbgm_danra_tpu.sweep import (
    HaltonSampler,
    RandomSampler,
    Study,
    SuccessiveHalvingPruner,
    TrialPruned,
)


class TestSamplers:
    def test_random_float_bounds(self):
        s = RandomSampler(seed=0)
        vals = [s.suggest_float(i, 0, 1e-5, 3e-3, log=True) for i in range(200)]
        assert all(1e-5 <= v <= 3e-3 for v in vals)
        # log-uniform: median near geometric mean
        assert 5e-5 < np.median(vals) < 1e-3

    def test_categorical_and_int(self):
        s = RandomSampler(seed=1)
        cats = {s.suggest_categorical(i, 0, ["a", "b", "c"]) for i in range(50)}
        assert cats == {"a", "b", "c"}
        ints = [s.suggest_int(i, 0, 2, 5) for i in range(100)]
        assert set(ints) == {2, 3, 4, 5}

    def test_halton_low_discrepancy(self):
        s = HaltonSampler(seed=0)
        vals = sorted(s.suggest_float(i, 0, 0.0, 1.0) for i in range(64))
        gaps = np.diff([0.0] + vals + [1.0])
        # quasirandom: no gap should be much larger than 2/n
        assert gaps.max() < 4.0 / 64


class TestPruner:
    def test_prunes_bad_trials(self):
        p = SuccessiveHalvingPruner(min_resource=1, reduction_factor=2)
        peers = [[(1, 0.1)], [(1, 0.2)], [(1, 0.3)], [(1, 0.4)]]
        assert p.should_prune(1, 0.9, peers)  # worst -> pruned
        assert not p.should_prune(1, 0.05, peers)  # best -> kept

    def test_no_prune_with_few_peers(self):
        p = SuccessiveHalvingPruner(min_resource=1, reduction_factor=4)
        assert not p.should_prune(1, 0.9, [[(1, 0.1)]])


class TestStudy:
    def test_optimize_and_best(self, tmp_path):
        study = Study(str(tmp_path / "s.db"), sampler=RandomSampler(0))

        def objective(trial):
            x = trial.suggest_float("x", -2.0, 2.0)
            return (x - 0.5) ** 2

        study.optimize(objective, n_trials=30)
        best = study.best_trial
        assert abs(best["params"]["x"] - 0.5) < 0.5
        assert len(study.trials) == 30

    def test_shared_storage_two_workers(self, tmp_path):
        path = str(tmp_path / "shared.db")
        s1 = Study(path, sampler=HaltonSampler(0))
        s2 = Study(path, sampler=HaltonSampler(0), load_if_exists=True)
        obj = lambda t: t.suggest_float("x", 0, 1) ** 2
        s1.optimize(obj, n_trials=3)
        s2.optimize(obj, n_trials=3)
        assert len(s1.trials) == 6  # both see all trials

    def test_pruned_trials_recorded(self, tmp_path):
        study = Study(
            str(tmp_path / "p.db"),
            sampler=RandomSampler(0),
            pruner=SuccessiveHalvingPruner(1, 2),
        )
        counter = {"n": 0}

        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            counter["n"] += 1
            for step in range(1, 4):
                trial.report(x, step)
                if trial.should_prune():
                    raise TrialPruned()
            return x

        study.optimize(objective, n_trials=12)
        states = {t["state"] for t in study.trials}
        assert "complete" in states and "pruned" in states

    def test_failed_trial_recorded_and_reraised(self, tmp_path):
        study = Study(str(tmp_path / "f.db"))

        def objective(trial):
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            study.optimize(objective, n_trials=1)
        assert study.trials[0]["state"] == "failed"


class TestSweepRunner:
    def test_end_to_end_tiny_sweep(self, tmp_path):
        """Two real trials over the training pipeline on synthetic data."""
        import yaml

        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.sweep.run_sweep import run_sweep
        from tests.test_training import tiny_config

        root = str(tmp_path / "env")
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=12,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        cfg.training.batch_size = 2
        cfg_path = str(tmp_path / "base.yaml")
        cfg.dump(cfg_path)
        study = run_sweep(
            cfg_path,
            str(tmp_path / "study.db"),
            n_trials=2,
            epochs=1,
            steps_per_epoch=2,
        )
        assert len(study.trials) == 2
        done = [t for t in study.trials if t["state"] in ("complete", "pruned")]
        assert done
        # trial configs dumped
        gen_dir = str(tmp_path / "generated")
        assert len(os.listdir(gen_dir)) == 2
        with open(os.path.join(gen_dir, sorted(os.listdir(gen_dir))[0])) as f:
            dumped = yaml.safe_load(f)
        assert "training" in dumped and "sampler" in dumped


class TestGPSampler:
    def test_converges_on_quadratic(self, tmp_path):
        from sbgm_danra_tpu.sweep.study import GPSampler

        study = Study(
            str(tmp_path / "gp.db"),
            sampler=GPSampler(seed=0, n_startup=6, n_candidates=256),
        )

        def objective(trial):
            x = trial.suggest_float("x", -2.0, 2.0)
            y = trial.suggest_float("y", -2.0, 2.0)
            return (x - 0.7) ** 2 + (y + 0.3) ** 2

        study.optimize(objective, n_trials=30)
        best = study.best_trial
        assert best["value"] < 0.05
        # post-startup GP trials should outperform the startup phase on average
        trials = study.trials
        startup = [t["value"] for t in trials[:6]]
        gp_phase = [t["value"] for t in trials[6:]]
        assert min(gp_phase) <= min(startup)

    def test_units_persisted(self, tmp_path):
        from sbgm_danra_tpu.sweep.study import GPSampler

        study = Study(str(tmp_path / "u.db"), sampler=GPSampler(seed=0))
        study.optimize(lambda t: t.suggest_float("x", 0, 1), n_trials=2)
        units = study._observed_units()
        assert len(units) == 2
        assert all(len(u) == 1 and 0 <= u[0] <= 1 for u, _ in units)
