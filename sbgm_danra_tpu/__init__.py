"""sbgm_danra_tpu — TPU-native score-based generative modeling for climate downscaling.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TheaQG/SBGM_DANRA
(reference mounted at /root/reference): conditional score UNet + VE-SDE denoising
score matching for ERA5 -> DANRA downscaling, with reverse-SDE samplers compiled to
single `lax.scan` programs, `shard_map`/`NamedSharding` data- and ensemble-parallelism
over TPU meshes, and Pallas kernels for spatial attention.

Layout
------
- ``sde``          VE/VP SDE marginals, diffusion coefficients, DSM loss
                   (reference: sbgm/score_unet.py:881-985)
- ``transforms``   per-variable normalization + exact inverse transforms
                   (reference: sbgm/special_transforms.py)
- ``models``       Flax score UNet (reference: sbgm/score_unet.py:24-879)
- ``sampling``     Euler-Maruyama / predictor-corrector / probability-flow ODE +
                   classifier-free guidance (reference: sbgm/score_sampling.py)
- ``data``         zarr-compatible storage, date-keyed conditional dataset, prefetch
                   loaders (reference: sbgm/data_modules.py)
- ``training``     DSM training engine with EMA, schedulers, orbax checkpoints
                   (reference: sbgm/training.py, training_utils.py)
- ``parallel``     mesh construction, sharded train step, pod-sharded ensembles
- ``ops``          Pallas kernels + device-side numerics (attention, SDF, resize)
- ``evaluate``     sample generation and metrics (reference: sbgm/evaluate_sbgm/)
- ``pipelines``    data ETL: splits, stats, comparison, correlations, ERA5 download
- ``sweep``        hyperparameter search harness (reference: sbgm/sweep/run_optuna.py)
"""

__version__ = "0.1.0"
