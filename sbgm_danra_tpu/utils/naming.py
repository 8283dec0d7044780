"""Canonical run/checkpoint naming (reference sbgm/utils.py:88-128)."""

from __future__ import annotations

from sbgm_danra_tpu.config import Config


def get_model_string(cfg: Config) -> str:
    hr_size = tuple(cfg.highres.data_size or (128, 128))
    lr_size = tuple(cfg.lowres.data_size) if cfg.lowres.data_size else hr_size
    rf = cfg.lowres.resize_factor
    if rf > 1:
        hr_size = (hr_size[0] // rf, hr_size[1] // rf)
        lr_size = (lr_size[0] // rf, lr_size[1] // rf)
    lr_vars = "_".join(cfg.lowres.condition_variables or ())
    return (
        f"{cfg.experiment.config_name}__"
        f"HR_{cfg.highres.variable}_{cfg.highres.model}__"
        f"SIZE_{hr_size[0]}x{hr_size[1]}__"
        f"LR_{lr_vars}_{cfg.lowres.model}__"
        f"LOSS_{cfg.training.loss_type}__"
        f"HEADS_{cfg.sampler.num_heads}__"
        f"TIMESTEPS_{cfg.sampler.n_timesteps}"
    )
