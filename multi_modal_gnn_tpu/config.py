"""Typed configuration system.

Mirrors the YAML schema of the reference pipeline (reference:
conf/config.yaml, loaded by src/utils.py:27-56) so an existing config file
drops in unchanged, but validates it into frozen dataclasses at load time
instead of passing raw dicts around.  Every section the reference requires
(data / cohort / feature_space / graph / model / train) is required here too;
unknown keys are preserved in ``extras`` so user configs round-trip.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import yaml

REQUIRED_SECTIONS = ("data", "cohort", "feature_space", "graph", "model", "train")


class ConfigError(ValueError):
    """Raised when a config file is structurally invalid."""


def _take(d: Dict[str, Any], cls, **overrides):
    """Build dataclass ``cls`` from dict ``d``, keeping unknown keys in extras."""
    names = {f.name for f in dataclasses.fields(cls)} - {"extras"}
    kwargs = {k: v for k, v in d.items() if k in names}
    extras = {k: v for k, v in d.items() if k not in names}
    kwargs.update(overrides)
    obj = cls(**kwargs)
    if extras and hasattr(obj, "extras"):
        object.__setattr__(obj, "extras", extras)
    return obj


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "eicu"  # "eicu" | "mimic3" | "synthetic"
    raw_dir: str = "data/raw"
    interim_dir: str = "data/interim"
    output_dir: str = "outputs"
    # stream LABEVENTS in chunks of this many rows (None = whole-table load);
    # for MIMIC-scale ingest (27M rows) this bounds peak host memory
    # (reference src/io_mimic.py:205-250)
    labevents_chunksize: Optional[int] = None
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.dataset not in ("eicu", "mimic3", "synthetic"):
            raise ConfigError(f"data.dataset must be eicu|mimic3|synthetic, got {self.dataset!r}")


@dataclass(frozen=True)
class CohortConfig:
    age_min: int = 18
    age_max: Optional[int] = None
    use_first_icu_only: bool = True
    subject_limit: Optional[int] = None
    min_los_hours: Optional[float] = None
    exclude_deaths: bool = False
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class LabsConfig:
    top_k: int = 50
    aggregate: str = "last"  # last | mean | median | min | max
    normalize: str = "zscore"  # zscore | minmax | robust | none
    outlier_std_threshold: Optional[float] = 5.0
    min_patient_count: int = 10
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.aggregate not in ("last", "mean", "median", "min", "max"):
            raise ConfigError(f"labs.aggregate invalid: {self.aggregate!r}")
        if self.normalize not in ("zscore", "minmax", "robust", "none"):
            raise ConfigError(f"labs.normalize invalid: {self.normalize!r}")


@dataclass(frozen=True)
class DiagnosesConfig:
    collapse_to_3digit: bool = True
    top_k: int = 200
    min_patient_count: int = 5
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class MedicationsConfig:
    top_k: int = 100
    normalize_names: bool = True
    min_patient_count: int = 5
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class DemographicsConfig:
    include_age: bool = True
    include_gender: bool = True
    include_ethnicity: bool = False
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class FeatureSpaceConfig:
    labs: LabsConfig = field(default_factory=LabsConfig)
    diagnoses: DiagnosesConfig = field(default_factory=DiagnosesConfig)
    medications: MedicationsConfig = field(default_factory=MedicationsConfig)
    demographics: DemographicsConfig = field(default_factory=DemographicsConfig)
    extras: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "FeatureSpaceConfig":
        return _take(
            d,
            FeatureSpaceConfig,
            labs=_take(d.get("labs", {}), LabsConfig),
            diagnoses=_take(d.get("diagnoses", {}), DiagnosesConfig),
            medications=_take(d.get("medications", {}), MedicationsConfig),
            demographics=_take(d.get("demographics", {}), DemographicsConfig),
        )


@dataclass(frozen=True)
class EdgeTypeConfig:
    enabled: bool = True
    bidirectional: bool = True
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class GraphConfig:
    node_types: Tuple[str, ...] = ("patient", "lab", "diagnosis", "medication")
    edge_types: Dict[str, EdgeTypeConfig] = field(
        default_factory=lambda: {
            "patient_lab": EdgeTypeConfig(),
            "patient_diagnosis": EdgeTypeConfig(),
            "patient_medication": EdgeTypeConfig(),
        }
    )
    add_self_loops: bool = True
    # TPU-specific: pad edge arrays up to a multiple of this bucket so that
    # recompilation is bounded when graphs change size between runs.
    edge_pad_multiple: int = 1024
    # TPU-specific: per-relation budget for materializing the dense
    # mean-normalized adjacency (one MXU matmul beats sparse gather+segment
    # at EHR densities); 0 disables.  256 MB covers 100k x 500 relations.
    dense_adjacency_max_bytes: int = 268_435_456
    # TPU-specific layout knob (no semantic effect): index patients in
    # ascending lab-degree order so low-degree patients cluster into a few
    # leading windows — the degree-predicated head kernel then skips nearly
    # every tabular-head tile instead of ~70% (PERFORMANCE.md).  Off matches
    # the reference's first-seen order exactly.
    cluster_patients_by_degree: bool = True
    # TPU-specific layout knob (no semantic effect): index labs in DESCENDING
    # edge-frequency order so popular labs share the leading table blocks —
    # the span-bounded lab tiles (EdgeMasker lab_block_rows, auto-enabled at
    # >=512 padded labs) then address one narrow table slice per kernel tile
    # with near-zero slot inflation.  On by default since round 2's hardware
    # validation (PERFORMANCE.md "span-bounded lab tiles"); node indices are
    # internal, every artifact keys on entity IDs (like the patient ordering
    # above), so this never changes results — only layout.
    cluster_labs_by_frequency: bool = True
    # TPU-specific: span-DMA plan block height for relations whose SOURCE
    # side exceeds VMEM (10k+ patients) and has no dense adjacency — the
    # aggregation kernel DMAs one [src_span_rows, D] contiguous table block
    # per 1024-edge tile instead of an HBM row-gather of every edge
    # (ops/pallas_segment.span_dma_aggregate).  0 disables plan building.
    src_span_rows: int = 256
    extras: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "GraphConfig":
        ets = {
            name: _take(sub or {}, EdgeTypeConfig)
            for name, sub in d.get("edge_types", {}).items()
        }
        kwargs = {}
        if "node_types" in d:
            kwargs["node_types"] = tuple(d["node_types"])
        if ets:
            kwargs["edge_types"] = ets
        return _take(
            {k: v for k, v in d.items() if k not in ("node_types", "edge_types")},
            GraphConfig,
            **kwargs,
        )


@dataclass(frozen=True)
class EdgeHeadConfig:
    hidden_dims: Tuple[int, ...] = (64, 32)
    final_activation: Optional[str] = None
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))


@dataclass(frozen=True)
class ModelConfig:
    architecture: str = "RGCN"  # RGCN | HGT
    hidden_dim: int = 128
    num_layers: int = 2
    dropout: float = 0.2
    activation: str = "relu"  # relu | elu | leaky_relu
    use_batch_norm: bool = True
    aggregation: str = "mean"  # mean | sum | max
    num_heads: int = 4  # HGT only
    degree_threshold: int = 6  # hybrid head gate (reference: src/model.py:178)
    edge_head: EdgeHeadConfig = field(default_factory=EdgeHeadConfig)
    # TPU-specific: parameter/compute dtype for message passing matmuls.
    # "auto" probes the chip's f32-vs-bf16 MXU rate at model build
    # (utils/mxu_probe.py) and picks bfloat16 only where it measures faster.
    compute_dtype: str = "float32"  # float32 | bfloat16 | auto
    use_pallas: bool = False  # use fused Pallas gather/segment kernels
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.architecture not in ("RGCN", "HGT"):
            raise ConfigError(f"model.architecture must be RGCN|HGT, got {self.architecture!r}")
        if self.activation not in ("relu", "elu", "leaky_relu"):
            raise ConfigError(f"model.activation invalid: {self.activation!r}")
        if self.aggregation not in ("mean", "sum", "max"):
            raise ConfigError(f"model.aggregation invalid: {self.aggregation!r}")
        if self.compute_dtype not in ("float32", "bfloat16", "auto"):
            raise ConfigError(
                f"model.compute_dtype must be float32|bfloat16|auto, "
                f"got {self.compute_dtype!r}"
            )

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ModelConfig":
        return _take(
            {k: v for k, v in d.items() if k != "edge_head"},
            ModelConfig,
            edge_head=_take(d.get("edge_head", {}), EdgeHeadConfig),
        )


@dataclass(frozen=True)
class OptimizerConfig:
    type: str = "adam"  # adam | sgd
    lr: float = 1e-3
    weight_decay: float = 1e-5
    momentum: float = 0.9  # sgd only
    # extra L2 decay applied ONLY to the ID-embedding tables (embed_*) —
    # the SGD analogue of the per-entity ridge shrinkage that makes the ALS
    # baseline strong on noisy cohorts (evaluation/baselines.py ALSBaseline);
    # 0 keeps exact reference optimizer semantics
    embedding_weight_decay: float = 0.0
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class LRSchedulerConfig:
    enabled: bool = True
    type: str = "reduce_on_plateau"  # reduce_on_plateau | step
    factor: float = 0.5
    patience: int = 10
    threshold: float = 1e-4  # relative improvement threshold (torch default)
    min_lr: float = 0.0
    step_size: int = 30  # step scheduler only
    gamma: float = 0.1  # step scheduler only
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class TrainConfig:
    task: str = "edge_regression"
    mask_fraction: float = 0.2
    train_split: float = 0.7
    val_split: float = 0.15
    test_split: float = 0.15
    loss: str = "mae"  # mae | mse | huber
    epochs: int = 100
    batch_size: Optional[int] = None  # None = full batch
    early_stopping_patience: int = 15
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    seed: int = 42
    device: str = "auto"
    # TPU-specific: how many devices to data-parallel over (0 = all available).
    num_devices: int = 0
    donate_state: bool = True
    # TPU-specific: epochs per device dispatch in fit() (1 = reference-exact
    # per-epoch control; >1 scans and applies LR changes at chunk boundaries).
    scan_chunk: int = 1
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        total = self.train_split + self.val_split + self.test_split
        if abs(total - 1.0) > 1e-6:
            raise ConfigError(f"train/val/test splits must sum to 1.0, got {total}")
        if self.loss not in ("mae", "mse", "huber"):
            raise ConfigError(f"train.loss invalid: {self.loss!r}")

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainConfig":
        return _take(
            {k: v for k, v in d.items() if k not in ("optimizer", "lr_scheduler")},
            TrainConfig,
            optimizer=_take(d.get("optimizer", {}), OptimizerConfig),
            lr_scheduler=_take(d.get("lr_scheduler", {}), LRSchedulerConfig),
        )


@dataclass(frozen=True)
class EvaluationConfig:
    regression_metrics: Tuple[str, ...] = ("mae", "rmse", "r2", "mape")
    per_lab_metrics: bool = True
    baselines: Tuple[str, ...] = ("global_mean", "per_lab_mean", "nearest_neighbor")
    stratify_by: Tuple[str, ...] = ("num_labs", "lab_frequency")
    winsorize_sigma: float = 3.0  # post-hoc residual cap (reference: evaluate.py:429)
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "regression_metrics", tuple(self.regression_metrics))
        object.__setattr__(self, "baselines", tuple(self.baselines))
        object.__setattr__(self, "stratify_by", tuple(self.stratify_by))


@dataclass(frozen=True)
class VisualizationConfig:
    generate_embeddings: bool = True
    dim_reduction: str = "pca"
    embedding_color_by: Tuple[str, ...] = ("node_type",)
    generate_parity_plots: bool = True
    top_labs_to_plot: int = 10
    generate_subgraphs: bool = True
    num_example_subgraphs: int = 5
    missingness_heatmap: bool = True
    plot_degree_distribution: bool = True
    plot_edge_weight_distribution: bool = True
    extras: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "embedding_color_by", tuple(self.embedding_color_by))


@dataclass(frozen=True)
class LoggingConfig:
    level: str = "INFO"
    save_to_file: bool = True
    log_file: str = "outputs/training.log"
    use_wandb: bool = False
    wandb_project: str = "ehr-graph-impute"
    wandb_entity: Optional[str] = None
    log_interval: int = 1
    save_checkpoints: bool = True
    checkpoint_interval: int = 10
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ReproducibilityConfig:
    set_seeds: bool = True
    numpy_seed: int = 42
    torch_seed: int = 42  # accepted for config compatibility; unused
    random_seed: int = 42
    deterministic: bool = False
    debug_nans: bool = False  # TPU-specific: enable jax debug_nans
    extras: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    cohort: CohortConfig = field(default_factory=CohortConfig)
    feature_space: FeatureSpaceConfig = field(default_factory=FeatureSpaceConfig)
    graph: GraphConfig = field(default_factory=GraphConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    visualization: VisualizationConfig = field(default_factory=VisualizationConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    reproducibility: ReproducibilityConfig = field(default_factory=ReproducibilityConfig)
    extras: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_dict(raw: Dict[str, Any]) -> "Config":
        missing = [s for s in REQUIRED_SECTIONS if s not in raw]
        if missing:
            raise ConfigError(f"Config missing required sections: {missing}")
        return _take(
            {k: v for k, v in raw.items() if k not in _SECTION_BUILDERS},
            Config,
            **{name: build(raw.get(name, {}) or {}) for name, build in _SECTION_BUILDERS.items()},
        )

    def to_dict(self) -> Dict[str, Any]:
        def convert(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                out = {}
                for f in dataclasses.fields(obj):
                    if f.name == "extras":
                        out.update(convert(getattr(obj, f.name)))
                    else:
                        out[f.name] = convert(getattr(obj, f.name))
                return out
            if isinstance(obj, dict):
                return {k: convert(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [convert(v) for v in obj]
            return obj

        return convert(self)

    def content_hash(self) -> str:
        """Stable hash of the config, embedded into artifacts for provenance."""
        blob = json.dumps(self.to_dict(), sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def model_hash(self) -> str:
        """Hash of the sections that determine checkpoint *compatibility*
        (architecture, graph schema, feature space).  Run-length and
        optimizer knobs (``train.epochs``, LR, patience) may legitimately
        differ at resume — train-longer is the canonical resume — so the
        restore guard compares this, not :meth:`content_hash`."""
        d = self.to_dict()
        sub = {k: d.get(k) for k in ("model", "graph", "feature_space")}
        blob = json.dumps(sub, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


_SECTION_BUILDERS = {
    "data": lambda d: _take(d, DataConfig),
    "cohort": lambda d: _take(d, CohortConfig),
    "feature_space": FeatureSpaceConfig.from_dict,
    "graph": GraphConfig.from_dict,
    "model": ModelConfig.from_dict,
    "train": TrainConfig.from_dict,
    "evaluation": lambda d: _take(d, EvaluationConfig),
    "visualization": lambda d: _take(d, VisualizationConfig),
    "logging": lambda d: _take(d, LoggingConfig),
    "reproducibility": lambda d: _take(d, ReproducibilityConfig),
}


def load_config(path: str | Path = "conf/config.yaml") -> Config:
    """Load and validate a YAML config file (reference: src/utils.py:27-56)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return Config.from_dict(raw)


def save_config(config: Config, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, sort_keys=False)


def default_config() -> Config:
    return Config()
