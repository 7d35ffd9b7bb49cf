"""MXU dtype probe + compute_dtype="auto" (VERDICT round-2 item 7).

The engagement decision is probed on real hardware (bench.py logs
``mxu_bf16_speedup``; .mxu_probe.json caches it per device kind).  Here we
pin the selection logic (mocked ratios — the real probe is minutes of MXU
work) and bf16 quality-neutrality on the realistic cohort, so wherever the
probe DOES engage bf16, the flagship quality number is already known to
survive the dtype.
"""

import dataclasses

import numpy as np
import pytest

from multi_modal_gnn_tpu.config import Config, ConfigError
from multi_modal_gnn_tpu.utils import mxu_probe


def test_config_validates_compute_dtype():
    with pytest.raises(ConfigError):
        dataclasses.replace(Config().model, compute_dtype="float16")
    # accepted spellings
    for v in ("float32", "bfloat16", "auto"):
        dataclasses.replace(Config().model, compute_dtype=v)


def _stats(median, lo=None, hi=None):
    lo = median if lo is None else lo
    hi = median if hi is None else hi
    return {"ratio": median, "ratio_min": lo, "ratio_max": hi, "repeats": 3,
            "t_f32_ms": [], "t_bf16_ms": []}


def test_resolution_logic(monkeypatch):
    import jax

    assert mxu_probe.resolve_compute_dtype("float32") == "float32"
    assert mxu_probe.resolve_compute_dtype("bfloat16") == "bfloat16"
    # off-TPU, "auto" short-circuits to float32 without probing
    def no_probe():
        raise AssertionError("probe must not run off-TPU")

    monkeypatch.setattr(mxu_probe, "probe_bf16_stats", no_probe)
    if jax.default_backend() != "tpu":
        assert mxu_probe.resolve_compute_dtype("auto") == "float32"
    # on (mocked) TPU the measured ratio decides
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mxu_probe, "probe_bf16_stats", lambda: _stats(0.98))
    assert mxu_probe.resolve_compute_dtype("auto") == "float32"
    monkeypatch.setattr(mxu_probe, "probe_bf16_stats", lambda: _stats(3.7))
    assert mxu_probe.resolve_compute_dtype("auto") == "bfloat16"
    # a probe crash must fall back to float32, not break model build
    def boom():
        raise RuntimeError("no device")

    monkeypatch.setattr(mxu_probe, "probe_bf16_stats", boom)
    assert mxu_probe.resolve_compute_dtype("auto") == "float32"


def test_conservative_end_decides(monkeypatch):
    """Round-3 item 5: a median above the engage threshold is NOT enough —
    every probe repeat must clear it, so one noisy draw (the observed
    0.839-vs-0.998 relay-weather spread) cannot flip the dtype."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # median clears 1.15 but the conservative end does not -> stay f32
    monkeypatch.setattr(
        mxu_probe, "probe_bf16_stats", lambda: _stats(1.3, lo=1.02, hi=1.4)
    )
    assert mxu_probe.resolve_compute_dtype("auto") == "float32"
    # the whole dispersion clears the bar -> engage
    monkeypatch.setattr(
        mxu_probe, "probe_bf16_stats", lambda: _stats(1.3, lo=1.18, hi=1.4)
    )
    assert mxu_probe.resolve_compute_dtype("auto") == "bfloat16"


def test_legacy_cache_without_dispersion_is_reprobed(monkeypatch, tmp_path):
    """Pre-round-4 .mxu_probe.json entries carry one ratio and no
    dispersion; they must not satisfy the new stats lookup."""
    import json as _json

    cache = tmp_path / ".mxu_probe.json"
    cache.write_text(_json.dumps({"FakeChip": {"ratio": 2.0, "t_f32_ms": 1.0,
                                               "t_bf16_ms": 0.5}}))
    monkeypatch.setattr(mxu_probe, "_CACHE_PATH", cache)
    monkeypatch.setattr(mxu_probe, "_memo", {})

    class FakeDev:
        device_kind = "FakeChip"

    import jax

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
    calls = []

    def fake_time(dtype, **kw):
        calls.append(dtype)
        return 1.0 if "float32" in str(dtype) else 0.8

    monkeypatch.setattr(mxu_probe, "_time_matmul", fake_time)
    stats = mxu_probe.probe_bf16_stats(repeats=2)
    assert calls, "legacy cache entry must trigger a fresh probe"
    assert stats["repeats"] == 2
    assert stats["ratio"] == pytest.approx(1.25)
    assert stats["ratio_min"] <= stats["ratio"] <= stats["ratio_max"]
    # the refreshed cache now round-trips without re-probing
    calls.clear()
    monkeypatch.setattr(mxu_probe, "_memo", {})
    again = mxu_probe.probe_bf16_stats()
    assert not calls and again["ratio"] == stats["ratio"]


def test_auto_routes_through_factory(monkeypatch):
    import jax
    import jax.numpy as jnp

    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle
    from multi_modal_gnn_tpu.models.factory import build_model

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mxu_probe, "probe_bf16_speedup", lambda: 4.0)
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="auto"))
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(), cfg)
    model = build_model(cfg, bundle.graph)
    assert model.dtype == jnp.bfloat16


def test_bf16_quality_neutral_on_realistic_cohort():
    """The flagship warm-start quality survives bfloat16 compute: measured
    R^2 = 0.178 in f32 (tests/test_quality.py); pinned >= 0.15 under bf16
    (dtype noise budget ~0.03)."""
    from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
    from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics
    from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer
    from multi_modal_gnn_tpu.training.warmstart import warm_start_trainer

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            compute_dtype="bfloat16",
            edge_head=dataclasses.replace(
                cfg.model.edge_head,
                extras={"bilinear_rank": 9, "bilinear_source": "embedding"},
            ),
        ),
        train=dataclasses.replace(cfg.train, loss="mse"),
    )
    spec = dataclasses.replace(SyntheticSpec.eicu_demo(), seed=0, signal_strength=0.6)
    tables = generate_synthetic_tables(spec)
    bundle = build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=cfg,
    )
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    warm_start_trainer(trainer, rank=8, reg=12.0)
    _, _, tev = masker.split_arrays("test")
    m = compute_regression_metrics(trainer.predict("test").astype(np.float64), tev)
    assert m["r2"] >= 0.15, f"bf16 warm-start quality: R^2={m['r2']:.4f}"
