"""Config system tests: schema compatibility, validation, round-trip."""

import pytest
import yaml

from multi_modal_gnn_tpu.config import Config, ConfigError, load_config, save_config


def test_default_config_valid():
    cfg = Config()
    assert cfg.model.hidden_dim == 128
    assert cfg.train.mask_fraction == 0.2
    assert abs(cfg.train.train_split + cfg.train.val_split + cfg.train.test_split - 1.0) < 1e-9


def test_load_repo_config():
    cfg = load_config("conf/config.yaml")
    assert cfg.model.architecture == "RGCN"
    assert cfg.feature_space.labs.top_k == 50
    assert cfg.train.optimizer.lr == pytest.approx(1e-3)
    assert cfg.train.lr_scheduler.type == "reduce_on_plateau"


def test_missing_required_section():
    with pytest.raises(ConfigError, match="missing required sections"):
        Config.from_dict({"data": {}, "cohort": {}})


def test_invalid_values_rejected():
    with pytest.raises(ConfigError):
        Config.from_dict(
            {
                "data": {"dataset": "nope"},
                "cohort": {},
                "feature_space": {},
                "graph": {},
                "model": {},
                "train": {},
            }
        )
    with pytest.raises(ConfigError, match="sum to 1.0"):
        Config.from_dict(
            {
                "data": {},
                "cohort": {},
                "feature_space": {},
                "graph": {},
                "model": {},
                "train": {"train_split": 0.9, "val_split": 0.2, "test_split": 0.2},
            }
        )


def test_unknown_keys_preserved(tmp_path):
    raw = {
        "data": {"dataset": "eicu", "my_custom_flag": 7},
        "cohort": {},
        "feature_space": {},
        "graph": {},
        "model": {},
        "train": {},
    }
    cfg = Config.from_dict(raw)
    assert cfg.data.extras["my_custom_flag"] == 7
    assert cfg.to_dict()["data"]["my_custom_flag"] == 7


def test_round_trip(tmp_path):
    cfg = load_config("conf/config.yaml")
    out = tmp_path / "cfg.yaml"
    save_config(cfg, out)
    cfg2 = load_config(out)
    assert cfg.content_hash() == cfg2.content_hash()


def test_reference_schema_compatible(tmp_path):
    """A config with the reference's key layout loads unchanged."""
    raw = {
        "data": {"dataset": "eicu", "raw_dir": "/x", "interim_dir": "i", "output_dir": "o"},
        "cohort": {"age_min": 18, "age_max": None, "use_first_icu_only": True,
                   "subject_limit": None, "min_los_hours": None, "exclude_deaths": False},
        "feature_space": {
            "labs": {"top_k": 50, "aggregate": "last", "normalize": "zscore",
                     "outlier_std_threshold": 5.0, "min_patient_count": 10},
            "diagnoses": {"collapse_to_3digit": True, "top_k": 200, "min_patient_count": 5},
            "medications": {"top_k": 100, "normalize_names": True, "min_patient_count": 5},
            "demographics": {"include_age": True, "include_gender": True,
                             "include_ethnicity": False},
        },
        "graph": {
            "node_types": ["patient", "lab", "diagnosis", "medication"],
            "edge_types": {
                "patient_lab": {"enabled": True, "bidirectional": True},
                "patient_diagnosis": {"enabled": True, "bidirectional": True},
                "patient_medication": {"enabled": True, "bidirectional": True},
            },
            "add_self_loops": True,
        },
        "model": {
            "architecture": "RGCN", "hidden_dim": 128, "num_layers": 2, "dropout": 0.2,
            "activation": "relu", "use_batch_norm": True, "aggregation": "mean",
            "edge_head": {"hidden_dims": [64, 32], "final_activation": None},
        },
        "train": {
            "task": "edge_regression", "mask_fraction": 0.2,
            "train_split": 0.7, "val_split": 0.15, "test_split": 0.15,
            "loss": "mae", "epochs": 100, "batch_size": None,
            "early_stopping_patience": 15,
            "optimizer": {"type": "adam", "lr": 0.001, "weight_decay": 0.00001},
            "lr_scheduler": {"enabled": True, "type": "reduce_on_plateau",
                             "factor": 0.5, "patience": 10},
            "seed": 42, "device": "auto",
        },
    }
    path = tmp_path / "ref_style.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
    cfg = load_config(path)
    assert cfg.model.edge_head.hidden_dims == (64, 32)
    assert cfg.train.lr_scheduler.patience == 10
    assert cfg.graph.edge_types["patient_lab"].bidirectional
