"""Typed configuration tree with YAML loading, env interpolation and overrides.

Replaces the reference's OmegaConf + ``${env:VAR}`` resolver (sbgm/utils.py:1626-1640)
with a plain dataclass tree: every run option has a declared type and default, a
config loads from YAML whose section names match the reference's schema
(highres/lowres/sampler/training/... — see sbgm/config/default_config.yaml), and a
frozen copy is dumped per run (the trial-YAML pattern of sbgm/sweep/run_optuna.py:190-192).

Extras over the reference:
- dot-key overrides (``training.learning_rate=1e-4``) for sweeps and CLIs,
  mirroring run_optuna.py's deep_update (:102-108);
- unknown-key detection at load time instead of silent cfg.get fallbacks.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Tuple

import yaml

_ENV_RE = re.compile(r"\$\{env:([A-Za-z_][A-Za-z0-9_]*)\}")


def resolve_env(value: Any) -> Any:
    """Recursively substitute ``${env:VAR}`` in strings (reference sbgm/utils.py:1626-1640)."""
    if isinstance(value, str):

        def _sub(m: re.Match) -> str:
            var = m.group(1)
            if var not in os.environ:
                raise KeyError(f"Config references undefined environment variable: {var}")
            return os.environ[var]

        return _ENV_RE.sub(_sub, value)
    if isinstance(value, Mapping):
        return {k: resolve_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_env(v) for v in value]
    return value


def deep_update(base: Dict[str, Any], updates: Mapping[str, Any]) -> Dict[str, Any]:
    """Apply dot-keyed updates in place (reference sweep/run_optuna.py:102-108)."""
    for dotted, val in updates.items():
        node = base
        keys = dotted.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = val
    return base


# ---------------------------------------------------------------------------
# Dataclass tree — section names match the reference YAML schema.
# ---------------------------------------------------------------------------


@dataclass
class ExperimentConfig:
    name: str = "sbgm_run"
    config_name: str = "sbgm_run"


@dataclass
class PathsConfig:
    data_dir: str = "./data"
    checkpoint_dir: str = "./checkpoints"
    checkpoint_name: str = "sbgm_run"
    sample_dir: str = "./samples"
    path_save: str = "./samples"
    specific_fig_name: str = "plot"
    lsm_path: str = ""
    topo_path: str = ""
    stats_load_dir: str = "./stats"


@dataclass
class HighresConfig:
    model: str = "DANRA"
    variable: str = "temp"
    data_size: Tuple[int, int] = (128, 128)
    scaling_method: str = "zscore"
    full_domain_dims: Tuple[int, int] = (589, 789)
    cutout_domains: Optional[Tuple[int, int, int, int]] = (170, 350, 340, 520)
    buffer_frac: float = 0.5
    # Legacy inline scaling params (default_config.yaml:23-46); stats files win
    # when stats_load_dir has them.
    scaling_params: Optional[Dict[str, float]] = None


@dataclass
class LowresConfig:
    model: str = "ERA5"
    condition_variables: Tuple[str, ...] = ("temp",)
    scaling_methods: Tuple[str, ...] = ("zscore",)
    data_size: Optional[Tuple[int, int]] = None
    full_domain_dims: Tuple[int, int] = (589, 789)
    cutout_domains: Optional[Tuple[int, int, int, int]] = None
    resize_factor: int = 1
    buffer_frac: float = 0.5
    scaling_params: Optional[List[Dict[str, float]]] = None


@dataclass
class SamplerConfig:
    sampler_type: str = "pc_sampler"  # pc_sampler | em_sampler | ode_sampler | edm_sampler | dpmpp_sampler
    n_timesteps: int = 1000
    time_embedding: int = 256
    last_fmap_channels: int = 512
    num_heads: int = 4
    block_layers: Tuple[int, ...] = (2, 2, 2, 2)
    snr: float = 0.16  # corrector signal-to-noise (reference score_sampling.py:132)
    t_eps: float = 1e-3
    # EDM (Karras) sampler knobs; n_timesteps doubles as the node count
    edm_rho: float = 7.0
    s_churn: float = 0.0


@dataclass
class ModelConfig:
    """Decoder knobs (reference full_run_config_debug.yaml model: block)."""

    use_resize_conv: bool = True
    decoder_norm: str = "group"  # group | instance | none
    decoder_gn_groups: int = 8
    decoder_activation: str = "silu"  # relu | silu | gelu
    # TPU-specific: compute dtype for conv/matmul (params stay float32).
    compute_dtype: str = "float32"  # float32 | bfloat16
    # Attention backend: 'xla' (jax.nn.dot_product_attention) or 'pallas' (flash).
    attention_backend: str = "xla"


@dataclass
class DataHandlingConfig:
    cache_size: int = 0
    num_workers: int = 4
    n_gen_samples: int = 3
    prefetch_depth: int = 2  # device prefetch double-buffering depth
    # Device-resident dataset (data/device_data.py): load the whole split into
    # HBM once and assemble batches in a compiled program — no host loader in
    # the training loop. Requires resize_factor 1 + LR on the HR grid.
    device_dataset: bool = False
    # > 0 enables the rotating-window variant (data/windowed_data.py) for the
    # TRAIN split: archives larger than HBM keep only window_days days
    # resident (x2: active + staged), refilled by a background host thread.
    # The valid split stays fully resident.
    device_window_days: int = 0
    # Batches trained per window: 0 = swap as soon as the next window is
    # staged (throughput mode); k > 0 = exactly k (reproducible mode).
    device_window_steps: int = 0
    # Staging dtype for window buffers ("float32" | "bfloat16"). bfloat16
    # halves host upload bytes and resident HBM per window; quantization is
    # ~0.4% of a z-scored field's std — the same precision the forward pass
    # already uses when model.compute_dtype is bfloat16. Default bfloat16:
    # halving the staging upload bytes is the measured difference between
    # 0.46x and 0.76x of the fused resident ceiling on the remote-tunnel
    # host (BASELINE over-HBM table, r5) — fp32 staging collapses dispatch
    # to ~200-400 samples/s while a window uploads.
    device_window_dtype: str = "bfloat16"
    # Window composition: "consecutive" (contiguous archive days — sequential
    # host reads, but seasonally correlated windows) or "strided" (each
    # window spans the whole archive with stride n_windows — the per-step
    # distribution approximates the reference's global i.i.d. sampling;
    # same bytes read per window with daily zarr groups).
    device_window_layout: str = "consecutive"


@dataclass
class TransformsConfig:
    scaling: bool = True
    force_matching_scale: bool = False
    sample_w_cutouts: bool = True


@dataclass
class GeographicConfig:
    sample_w_geo: bool = True
    sample_w_sdf: bool = True
    geo_variables: Tuple[str, ...] = ("lsm", "topo")
    topo_min: float = -12.0
    topo_max: float = 12.0
    norm_min: float = 0.0
    norm_max: float = 1.0


@dataclass
class SeasonalConfig:
    sample_w_cond_season: bool = True
    n_seasons: int = 4


@dataclass
class StationaryConditionsConfig:
    geographic_conditions: GeographicConfig = field(default_factory=GeographicConfig)
    seasonal_conditions: SeasonalConfig = field(default_factory=SeasonalConfig)


@dataclass
class VisualizationConfig:
    transform_back_bf_plot: bool = True
    create_figs: bool = True
    save_figs: bool = True
    plot_losses: bool = True
    plot_initial_sample: bool = False
    show_figs: bool = False
    show_both_orig_scaled: bool = False
    show_geo: bool = True
    show_ocean: bool = True
    # per-epoch preview sampling cadence: 0 = off, N = every N epochs
    # (the reference previews every epoch, training.py:611-786)
    preview_every: int = 0


@dataclass
class LRSchedulerParams:
    factor: float = 0.5
    patience: int = 5
    threshold: float = 0.01
    min_lr: float = 1e-6
    step_size: int = 10
    gamma: float = 0.1
    t_max: int = 100
    eta_min: float = 1e-6


@dataclass
class EarlyStoppingParams:
    patience: int = 50
    min_delta: float = 1e-4


@dataclass
class TrainingConfig:
    seed: int = 42
    batch_size: int = 16
    learning_rate: float = 5e-4
    min_lr: float = 1e-6
    lr_scheduler: str = "ReduceLROnPlateau"  # | StepLR | CosineAnnealing | none
    lr_scheduler_params: LRSchedulerParams = field(default_factory=LRSchedulerParams)
    weight_init: bool = True
    with_ema: bool = True
    load_ema: bool = False
    ema_decay: float = 0.9999
    weight_decay: float = 1e-6
    epochs: int = 100
    steps_per_epoch: Optional[int] = None
    loss_type: str = "sdfweighted"
    sdf_weighted_loss: bool = True
    optimizer: str = "adam"  # adam | adamw | sgd
    momentum: float = 0.9
    load_checkpoint: bool = False
    early_stopping: bool = True
    early_stopping_params: EarlyStoppingParams = field(default_factory=EarlyStoppingParams)
    use_mixed_precision: bool = False
    verbose: bool = True
    device: str = "tpu"
    # Extreme-value sentinel on back-transformed precip (reference training.py:151-160).
    monitor_extremes: bool = True
    extreme_cap: float = 300.0
    # Anomaly detection analogue: finite-checks on loss/grads (reference
    # training.py:403-405 detect_anomaly).
    detect_anomaly: bool = False
    # jax.profiler trace directory for the first training epoch ('' = off).
    profile_dir: str = ""
    # Rematerialize the forward pass on backward (activation memory ~O(1)).
    remat: bool = False
    # Fused sample+train scan (training/fused.py): K > 0 runs K optimizer
    # steps per device dispatch when the train loader is device-resident,
    # amortizing the ~28 ms/dispatch remote-tunnel tax to ~28/K ms and
    # freeing the host core for windowed staging. 0 = eager (one dispatch
    # per step). Requires a device loader; incompatible with
    # monitor_extremes (batches never materialize on host).
    fused_steps: int = 0
    # In-graph elastic recovery: skip optimizer updates with non-finite grads.
    skip_nonfinite_updates: bool = False
    # Best-val checkpoint WRITES fire at most every N epochs; a rate-limited
    # improvement is never lost — its weights are held as a device-side
    # snapshot and flushed at the next eligible epoch or at loop exit
    # (incl. early stopping). 1 = write on every improvement (reference
    # training.py:477-482 parity). Raise it when the device is remote: a
    # full-state save pulls the entire state over the tunnel (~15-30 s for
    # the 803 MB flagship), and early training improves val nearly every
    # epoch. Costs one extra state copy of HBM while a snapshot is held.
    checkpoint_min_interval_epochs: int = 1
    # Non-blocking checkpoint saves: snapshot the state on device (one cheap
    # dispatch) and stream the full-state write from a worker thread while
    # training keeps stepping (training/checkpointing.py). Default OFF on
    # measurement: on a 1-core host with a remote-TPU tunnel the background
    # D2H contends with step dispatch for the same core/tunnel and the
    # overlapped total is SLOWER than save-then-step (perf_probe ckpt,
    # BASELINE r3: hidden_s -13.4 eager / -1.2 scan). Turn on for local-TPU
    # multi-core hosts, where D2H DMA + disk write overlap compute.
    async_checkpointing: bool = False


@dataclass
class CFGuidanceConfig:
    enabled: bool = True
    drop_prob: float = 0.1
    guidance_scale: float = 3.0
    guidance_scale_max: Optional[float] = None


@dataclass
class EvaluationConfig:
    n_gen_samples: int = 1
    n_steps: int = 1000
    batch_size: int = 1
    seed: int = 42
    gen_type: Tuple[str, ...] = ("multiple",)  # multiple | single | repeated | full_domain
    n_full_domain_samples: int = 1  # batch size for gen_type full_domain
    n_repeats: int = 8
    save_samples: bool = True
    save_figs: bool = True
    fig_name: str = "generated_samples"
    eval_stat_methods: Tuple[str, ...] = ("pixel_stats", "spatial_stats")
    mask_ocean: bool = False
    # optional ensemble inflation factor applied to repeated-mode members in
    # normalized space before back-transform (evaluate/calibration.py; fit it
    # with scripts/flagship_quality_eval.py --calibrate). None = raw members.
    spread_calibration: Optional[float] = None


@dataclass
class SplitsConfig:
    """Split creation (reference data_analysis_pipeline/configs/split_config.yaml)."""

    method: str = "Time"  # Time | Random
    # year ranges per split, inclusive (reference: 1990-2016/2016-2019/2019-2022)
    train_years: Tuple[int, int] = (1990, 2015)
    valid_years: Tuple[int, int] = (2016, 2018)
    test_years: Tuple[int, int] = (2019, 2022)
    # Random-method fractions
    fractions: Optional[Dict[str, float]] = None
    seed: int = 0


@dataclass
class ParallelConfig:
    """Device-mesh layout; absent from the reference (single-device only)."""

    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 8}
    data_axis: str = "data"
    model_axis: str = "model"
    shard_ensemble: bool = True


@dataclass
class Config:
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    highres: HighresConfig = field(default_factory=HighresConfig)
    lowres: LowresConfig = field(default_factory=LowresConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data_handling: DataHandlingConfig = field(default_factory=DataHandlingConfig)
    transforms: TransformsConfig = field(default_factory=TransformsConfig)
    stationary_conditions: StationaryConditionsConfig = field(
        default_factory=StationaryConditionsConfig
    )
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    classifier_free_guidance: CFGuidanceConfig = field(default_factory=CFGuidanceConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    splits: SplitsConfig = field(default_factory=SplitsConfig)

    # -- derived quantities ------------------------------------------------

    def in_channels(self) -> int:
        """Conditioning channels: n_lr + 2 per geo var (reference training_utils.py:588-595)."""
        n_lr = len(self.lowres.condition_variables or ())
        geo = self.stationary_conditions.geographic_conditions
        n_geo = 2 * len(geo.geo_variables) if geo.sample_w_geo else 0
        return n_lr + n_geo

    def num_classes(self) -> Optional[int]:
        sc = self.stationary_conditions.seasonal_conditions
        return sc.n_seasons if sc.sample_w_cond_season else None

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def dump(self, path: str) -> None:
        """Write the frozen resolved config next to run artifacts."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(_jsonify(self.to_dict()), f, sort_keys=False)


def _jsonify(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, list):
        return [_jsonify(v) for v in obj]
    # numpy scalars leak in from samplers/metrics; YAML needs Python natives
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return obj
    return obj


# ---------------------------------------------------------------------------
# Dict -> dataclass with unknown-key warnings
# ---------------------------------------------------------------------------


def _coerce(value: Any, typ: Any) -> Any:
    origin = getattr(typ, "__origin__", None)
    if dataclasses.is_dataclass(typ) and isinstance(value, Mapping):
        return _from_mapping(typ, value)
    if value is None:
        return None
    if origin is tuple:
        args = typ.__args__
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in value)
        return tuple(_coerce(v, t) for v, t in zip(value, args))
    if origin is list:
        return [_coerce(v, typ.__args__[0]) for v in value]
    if typ is float and isinstance(value, (int, str)):
        return float(value)
    if typ is int and isinstance(value, (float, str)):
        return int(value)
    if origin is not None and str(typ).startswith("typing.Optional"):
        return _coerce(value, typ.__args__[0])
    # typing.Union[..., None] (Optional) — try each member type.
    if origin is getattr(__import__("typing"), "Union", None):
        for t in typ.__args__:
            if t is type(None):
                continue
            try:
                return _coerce(value, t)
            except Exception:
                continue
        return value
    return value


def _from_mapping(cls, data: Mapping[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    unknown = []
    for key, val in data.items():
        if key not in fields:
            unknown.append(key)
            continue
        ftype = fields[key].type
        if isinstance(ftype, str):  # from __future__ annotations
            import typing

            ftype = typing.get_type_hints(cls)[key]
        kwargs[key] = _coerce(val, ftype)
    if unknown:
        import logging

        logging.getLogger(__name__).warning(
            "Unknown config keys in %s: %s", cls.__name__, unknown
        )
    return cls(**kwargs)


def from_dict(data: Mapping[str, Any]) -> Config:
    return _from_mapping(Config, data)


def load_config(path: str, overrides: Optional[Mapping[str, Any]] = None) -> Config:
    """Load YAML -> resolve ${env:} -> apply dot-key overrides -> typed Config."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    raw = resolve_env(raw)
    if overrides:
        deep_update(raw, overrides)
    return from_dict(raw)


def parse_override(s: str) -> Tuple[str, Any]:
    """Parse a 'a.b.c=value' CLI override; values parse as YAML scalars."""
    if "=" not in s:
        raise ValueError(f"Override must look like key.path=value, got: {s}")
    key, _, val = s.partition("=")
    return key.strip(), yaml.safe_load(val)
