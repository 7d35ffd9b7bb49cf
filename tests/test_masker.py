"""EdgeMasker: split proportions, disjointness, determinism, supervision."""

import jax
import numpy as np
import pytest

from multi_modal_gnn_tpu.training.masker import EdgeMasker


@pytest.fixture(scope="module")
def masker(tiny_graph):
    return EdgeMasker(tiny_graph, seed=42)


def test_split_sizes(masker, tiny_graph):
    sizes = masker.split_sizes()
    n = tiny_graph.patient_lab.num_valid
    assert sizes["train"] == int(0.7 * n)
    assert sizes["val"] == int(0.15 * n)
    assert sizes["train"] + sizes["val"] + sizes["test"] == n


def test_splits_disjoint_and_exhaustive(masker, tiny_graph):
    n = tiny_graph.patient_lab.num_valid
    all_idx = np.concatenate([masker.split_indices(s) for s in ("train", "val", "test")])
    assert len(all_idx) == n
    assert len(np.unique(all_idx)) == n


def test_deterministic_given_seed(tiny_graph):
    a = EdgeMasker(tiny_graph, seed=42)
    b = EdgeMasker(tiny_graph, seed=42)
    c = EdgeMasker(tiny_graph, seed=7)
    np.testing.assert_array_equal(a.split_indices("test"), b.split_indices("test"))
    assert not np.array_equal(a.split_indices("test"), c.split_indices("test"))


def test_batch_alignment(masker, tiny_graph):
    """Padded batch must carry the same (p, l, v) triples as the host arrays."""
    p, l, v = masker.split_arrays("val")
    batch = masker.get_split("val")
    k = batch.num_valid
    assert k == len(p)
    np.testing.assert_array_equal(np.asarray(batch.patient_idx)[:k], p)
    np.testing.assert_array_equal(np.asarray(batch.lab_idx)[:k], l)
    np.testing.assert_allclose(np.asarray(batch.values)[:k], v)
    assert np.all(np.asarray(batch.valid)[k:] == 0)


def test_supervision_mask_fraction(masker):
    batch = masker.get_split("train")
    key = jax.random.key(0)
    m = np.asarray(masker.supervision_mask(key, batch))
    frac = m.sum() / batch.num_valid
    assert 0.1 < frac < 0.3  # ~20%
    assert np.all(m[batch.num_valid :] == 0)  # never supervise padding
    m2 = np.asarray(masker.supervision_mask(jax.random.key(1), batch))
    assert not np.array_equal(m, m2)  # fresh mask per epoch
    m3 = np.asarray(masker.supervision_mask(jax.random.key(0), batch))
    np.testing.assert_array_equal(m, m3)  # but reproducible per key


def test_auto_lab_tile_rows_rule():
    """The measured v5e default: 256-row span tiles at >=512 padded labs."""
    from multi_modal_gnn_tpu.training.masker import auto_lab_tile_rows
    from multi_modal_gnn_tpu.training.trainer import _resolve_lab_tile_rows

    assert auto_lab_tile_rows(None) == 0
    assert auto_lab_tile_rows(0) == 0
    assert auto_lab_tile_rows(50) == 0  # eICU: labs_pad 128
    assert auto_lab_tile_rows(384) == 0  # labs_pad 384 < 512
    assert auto_lab_tile_rows(500) == 256  # scale config: labs_pad 512
    assert auto_lab_tile_rows(720) == 256  # MIMIC-shaped: labs_pad 768

    # explicit values (including 0) always win; auto needs the pallas path
    assert _resolve_lab_tile_rows(0, 720, True) == 0
    assert _resolve_lab_tile_rows(128, 720, True) == 128
    assert _resolve_lab_tile_rows(None, 720, True) == 256
    assert _resolve_lab_tile_rows("auto", 720, True) == 256
    assert _resolve_lab_tile_rows(None, 720, False) == 0


class TestMaskerFactory:
    """masker_from_config is THE config->masker derivation (round-5 VERDICT
    item 3): every entry point that must agree on split membership uses it,
    so a strict-conformal config carves the identical "cal" split at train,
    evaluate, audit, and pipeline-reload time."""

    def _strict_cfg_bundle(self):
        import dataclasses

        from multi_modal_gnn_tpu.config import Config
        from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle

        cfg = Config()
        ev = dataclasses.replace(
            cfg.evaluation, extras={**cfg.evaluation.extras, "conformal_split_fraction": 0.5}
        )
        cfg = cfg.replace(evaluation=ev)
        bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=3), cfg)
        return cfg, bundle

    def test_four_way_partition_identical_across_entry_points(self):
        from multi_modal_gnn_tpu.training.masker import masker_from_config

        cfg, bundle = self._strict_cfg_bundle()
        # two independent constructions (what train_pipeline and
        # evaluation_pipeline / run_pipeline._load_trainer / run_full_audit
        # each do) must agree on every split, including the carved "cal"
        a = masker_from_config(cfg, bundle)
        b = masker_from_config(cfg, bundle)
        assert a.has_calibration_split and b.has_calibration_split
        splits = ("train", "val", "cal", "test")
        for s in splits:
            np.testing.assert_array_equal(a.split_indices(s), b.split_indices(s))
        # the 4 splits partition the edge set (no overlap, full coverage)
        all_idx = np.concatenate([a.split_indices(s) for s in splits])
        assert len(all_idx) == a.num_edges == len(np.unique(all_idx))

    def test_entry_points_route_through_factory(self):
        """Source-level pin: the three formerly hand-rolled sites are gone
        (trainer.train_pipeline, evaluation.evaluation_pipeline,
        run_pipeline._load_trainer, audit.run_full_audit all call the
        factory rather than constructing EdgeMasker themselves)."""
        import inspect

        import run_pipeline as rp
        from multi_modal_gnn_tpu import audit
        from multi_modal_gnn_tpu.evaluation import evaluate as ev
        from multi_modal_gnn_tpu.training import trainer as tr

        for fn in (
            tr.train_pipeline,
            ev.evaluation_pipeline,
            rp._load_trainer,
            audit.run_full_audit,
        ):
            src = inspect.getsource(fn)
            assert "masker_from_config" in src, fn.__qualname__
            assert "EdgeMasker(" not in src, fn.__qualname__

    def test_strict_split_differs_from_legacy_no_cal_masker(self):
        """The defect the factory fixes: a masker built without
        calibration_split has a LARGER val split (no cal carve) — the
        round-4 evaluation entry silently calibrated on it."""
        from multi_modal_gnn_tpu.training.masker import EdgeMasker, masker_from_config

        cfg, bundle = self._strict_cfg_bundle()
        strict = masker_from_config(cfg, bundle)
        legacy = EdgeMasker(
            bundle.graph,
            seed=cfg.train.seed,
            host_edges=bundle.patient_lab_host(),
        )
        assert not legacy.has_calibration_split
        assert len(legacy.split_indices("val")) > len(strict.split_indices("val"))
        # train/test membership is bit-identical either way (the cal carve
        # draws AFTER the permutation, masker.__init__ contract)
        np.testing.assert_array_equal(
            legacy.split_indices("train"), strict.split_indices("train")
        )
        np.testing.assert_array_equal(
            legacy.split_indices("test"), strict.split_indices("test")
        )
