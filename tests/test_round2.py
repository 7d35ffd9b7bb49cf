"""Round-2 regression tests: ADVICE fixes, config-hash guard, eval-only
trainer, chunked LABEVENTS ingest, GSPMD masker isolation, quality yardsticks
(conditional ceiling + ALS baseline)."""

import dataclasses
import gzip
from pathlib import Path

import jax
import numpy as np
import pandas as pd
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, generate_synthetic_tables
from multi_modal_gnn_tpu.graph.build import build_heterogeneous_graph
from multi_modal_gnn_tpu.graph.schema import (
    DIAGNOSIS,
    PATIENT,
    PATIENT_DIAGNOSIS,
    PATIENT_LAB,
    PATIENT_MEDICATION,
)
from multi_modal_gnn_tpu.training.masker import EdgeMasker
from multi_modal_gnn_tpu.training.trainer import Trainer


def _build_bundle(config, spec=None):
    tables = generate_synthetic_tables(spec or SyntheticSpec.tiny())
    return build_heterogeneous_graph(
        labs=tables["labs_normalized"],
        diagnoses=tables["diagnoses"],
        medications=tables["medications"],
        cohort=tables["cohort"],
        labitems=tables["labitems"],
        config=config,
    )


def _make_trainer(config, bundle, **kwargs):
    from multi_modal_gnn_tpu.models.factory import build_model

    tc = config.train
    masker = EdgeMasker(bundle.graph, seed=tc.seed, host_edges=bundle.patient_lab_host())
    model = build_model(config, bundle.graph)
    return Trainer(model, bundle.graph, masker, config, **kwargs), masker


# ---------------------------------------------------------------------------
# ADVICE: EdgeTypeConfig.enabled gating
# ---------------------------------------------------------------------------

class TestEdgeTypeEnabled:
    def test_disabled_relation_not_built(self):
        cfg = Config()
        et = dict(cfg.graph.edge_types)
        et["patient_diagnosis"] = dataclasses.replace(
            et["patient_diagnosis"], enabled=False
        )
        cfg = dataclasses.replace(cfg, graph=dataclasses.replace(cfg.graph, edge_types=et))
        bundle = _build_bundle(cfg)
        assert PATIENT_DIAGNOSIS not in bundle.graph.edges
        # diagnosis became isolated -> dropped entirely
        assert DIAGNOSIS not in bundle.graph.node_count_map
        assert PATIENT_LAB in bundle.graph.edges
        assert PATIENT_MEDICATION in bundle.graph.edges

    def test_disabled_patient_lab_rejected(self):
        cfg = Config()
        et = dict(cfg.graph.edge_types)
        et["patient_lab"] = dataclasses.replace(et["patient_lab"], enabled=False)
        cfg = dataclasses.replace(cfg, graph=dataclasses.replace(cfg.graph, edge_types=et))
        with pytest.raises(ValueError, match="patient_lab"):
            _build_bundle(cfg)

    def test_model_trains_with_disabled_relation(self):
        cfg = Config()
        et = dict(cfg.graph.edge_types)
        et["patient_medication"] = dataclasses.replace(
            et["patient_medication"], enabled=False
        )
        cfg = dataclasses.replace(
            cfg,
            graph=dataclasses.replace(cfg.graph, edge_types=et),
            train=dataclasses.replace(cfg.train, epochs=2),
        )
        bundle = _build_bundle(cfg)
        trainer, _ = _make_trainer(cfg, bundle)
        loss = trainer.train_epoch()
        assert np.isfinite(loss)


# ---------------------------------------------------------------------------
# ADVICE: node types with no incoming relation carry through layers
# ---------------------------------------------------------------------------

def test_sage_layer_carries_isolated_node_types():
    """With bidirectional=false everywhere, patient receives no relation and
    must still be present (unchanged) in every layer's output."""
    cfg = Config()
    et = {
        name: dataclasses.replace(e, bidirectional=False)
        for name, e in cfg.graph.edge_types.items()
    }
    cfg = dataclasses.replace(cfg, graph=dataclasses.replace(cfg.graph, edge_types=et))
    bundle = _build_bundle(cfg)
    from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables

    model = build_model(cfg, bundle.graph)
    variables = init_model_variables(model, bundle.graph, jax.random.key(0))
    p = np.zeros(8, dtype=np.int32)
    l = np.zeros(8, dtype=np.int32)
    preds = model.apply(
        variables, bundle.graph, p, l, train=False, method=model.predict_lab_values
    )
    assert np.all(np.isfinite(np.asarray(preds)))


# ---------------------------------------------------------------------------
# ADVICE: inference denormalization honors the fitted normalizer
# ---------------------------------------------------------------------------

def test_denormalizer_minmax_roundtrip(tmp_path):
    from multi_modal_gnn_tpu.inference import Denormalizer
    from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer

    cfg = Config()
    bundle = _build_bundle(cfg)
    # fit a minmax normalizer on the raw values and persist its frame
    tables = generate_synthetic_tables(SyntheticSpec.tiny())
    labs = tables["labs_normalized"]
    norm = LabNormalizer(method="minmax")
    norm.fit_frame(labs, "VALUE", "ITEMID")
    frame = norm.to_frame()

    denorm = Denormalizer(bundle.meta, normalizer_frame=frame, method="minmax")
    lab_indexer = bundle.meta.indexers["lab"]
    item_id = lab_indexer.id_of(0)
    raw = labs[labs["ITEMID"] == item_id]["VALUE"].iloc[0]
    normalized = float(norm.transform_frame(
        pd.DataFrame({"ITEMID": [item_id], "VALUE": [raw]}), "VALUE", "ITEMID"
    ).iloc[0])
    assert denorm(0, normalized) == pytest.approx(float(raw), rel=1e-5)

    # zscore fallback path (no frame): uses GraphMeta.lab_stats
    fallback = Denormalizer(bundle.meta)
    stats = bundle.meta.lab_stats[0]
    assert fallback(0, 0.0) == pytest.approx(stats["mean"], rel=1e-5)


# ---------------------------------------------------------------------------
# ADVICE: huber training skips the lab weights (reference src/train.py:374-381)
# ---------------------------------------------------------------------------

def test_huber_ignores_lab_weights():
    import jax.numpy as jnp

    cfg = Config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, loss="huber"))
    bundle = _build_bundle(cfg)
    trainer, _ = _make_trainer(cfg, bundle)
    # identical trainers except one has wildly skewed lab weights
    skewed, _ = _make_trainer(cfg, bundle)
    skewed.lab_weights = jnp.asarray(
        np.linspace(0.01, 100.0, bundle.graph.num_nodes("lab")), dtype=np.float32
    )
    assert trainer.train_epoch() == pytest.approx(skewed.train_epoch(), rel=1e-6)


# ---------------------------------------------------------------------------
# ADVICE: first-stay selection keeps whole rows
# ---------------------------------------------------------------------------

def test_mimic_first_stay_not_chimeric():
    from multi_modal_gnn_tpu.data.mimic import select_cohort

    patients = pd.DataFrame(
        {"SUBJECT_ID": [1], "GENDER": ["F"], "DOB": ["1950-01-01"]}
    )
    admissions = pd.DataFrame(
        {
            "SUBJECT_ID": [1, 1],
            "HADM_ID": [10, 11],
            "ADMITTIME": ["2100-01-01", "2101-01-01"],
            "ETHNICITY": [None, "WHITE"],  # first stay has a null here
            "HOSPITAL_EXPIRE_FLAG": [0, 0],
        }
    )
    icustays = pd.DataFrame(
        {
            "SUBJECT_ID": [1, 1],
            "HADM_ID": [10, 11],
            "ICUSTAY_ID": [100, 101],
            "INTIME": ["2100-01-02", "2101-01-02"],
            "OUTTIME": ["2100-01-05", "2101-01-05"],
            "LOS": [3.0, 3.0],
        }
    )
    cohort = select_cohort(patients, admissions, icustays, age_min=18)
    assert len(cohort) == 1
    row = cohort.iloc[0]
    # the whole FIRST row must be kept: HADM_ID 10 with its null ethnicity —
    # groupby().first() would have grafted 'WHITE' from the second stay
    assert row["HADM_ID"] == 10
    assert pd.isna(row["ETHNICITY"])


def test_eicu_first_stay_not_chimeric():
    from multi_modal_gnn_tpu.data.eicu import select_cohort

    patients = pd.DataFrame(
        {
            "patientunitstayid": [1000, 1001],
            "patienthealthsystemstayid": [500, 501],
            "uniquepid": ["A", "A"],
            "age": ["50", "51"],
            "gender": ["Female", "Female"],
            "unitadmittime24": ["01:00:00", "09:00:00"],
            "unitdischargeoffset": [5000, 5000],
            "unitdischargestatus": ["Alive", "Alive"],
            "apacheadmissiondx": [None, "Sepsis"],  # first stay null
        }
    )
    cohort = select_cohort(patients, age_min=18, use_first_icu_only=True)
    assert len(cohort) == 1
    row = cohort.iloc[0]
    assert row["patientunitstayid"] == 1000
    assert pd.isna(row["apacheadmissiondx"])


# ---------------------------------------------------------------------------
# Chunked LABEVENTS ingest
# ---------------------------------------------------------------------------

class TestChunkedLabevents:
    def _write_raw(self, tmp_path: Path, n_rows: int = 250):
        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            {
                "SUBJECT_ID": rng.integers(1, 10, n_rows),
                "ITEMID": rng.integers(50800, 50810, n_rows),
                "VALUENUM": np.where(
                    rng.random(n_rows) < 0.1, np.nan, rng.normal(5, 2, n_rows)
                ),
                "CHARTTIME": "2100-01-01 10:00:00",
            }
        )
        df.to_csv(tmp_path / "LABEVENTS.csv", index=False)
        return df

    def test_chunked_equals_whole(self, tmp_path):
        from multi_modal_gnn_tpu.data.mimic import MIMICLoader

        df = self._write_raw(tmp_path)
        loader = MIMICLoader(tmp_path)
        cohort_ids = [1, 2, 3]
        # multi-chunk: 250 rows / 64 per chunk -> 4 chunks
        chunked = loader.load_labevents_for_cohort(cohort_ids, chunksize=64)
        whole = df[df["SUBJECT_ID"].isin(cohort_ids) & df["VALUENUM"].notna()]
        assert len(chunked) == len(whole)
        pd.testing.assert_frame_equal(
            chunked.reset_index(drop=True)[["SUBJECT_ID", "ITEMID"]],
            whole.reset_index(drop=True)[["SUBJECT_ID", "ITEMID"]],
        )

    def test_preprocess_uses_chunked_path(self, tmp_path, monkeypatch):
        """preprocess_pipeline routes through the chunked iterator when
        data.labevents_chunksize is set."""
        from multi_modal_gnn_tpu.data import mimic

        called = {}
        original = mimic.MIMICLoader.load_labevents_for_cohort

        def spy(self, ids, chunksize):
            called["chunksize"] = chunksize
            return original(self, ids, chunksize)

        monkeypatch.setattr(mimic.MIMICLoader, "load_labevents_for_cohort", spy)
        self._write_raw(tmp_path)
        # minimal companion tables
        pd.DataFrame(
            {"SUBJECT_ID": range(1, 10), "GENDER": "F", "DOB": "2050-01-01"}
        ).to_csv(tmp_path / "PATIENTS.csv", index=False)
        pd.DataFrame(
            {
                "SUBJECT_ID": range(1, 10),
                "HADM_ID": range(101, 110),
                "ADMITTIME": "2100-01-01",
                "ETHNICITY": "WHITE",
                "HOSPITAL_EXPIRE_FLAG": 0,
            }
        ).to_csv(tmp_path / "ADMISSIONS.csv", index=False)
        pd.DataFrame(
            {
                "SUBJECT_ID": range(1, 10),
                "HADM_ID": range(101, 110),
                "ICUSTAY_ID": range(201, 210),
                "INTIME": "2100-01-02",
                "OUTTIME": "2100-01-04",
                "LOS": 2.0,
            }
        ).to_csv(tmp_path / "ICUSTAYS.csv", index=False)
        pd.DataFrame(
            {"ITEMID": range(50800, 50810), "LABEL": [f"lab{i}" for i in range(10)]}
        ).to_csv(tmp_path / "D_LABITEMS.csv", index=False)
        pd.DataFrame(
            {"SUBJECT_ID": [1], "ICD9_CODE": ["25000"], "SEQ_NUM": [1]}
        ).to_csv(tmp_path / "DIAGNOSES_ICD.csv", index=False)
        pd.DataFrame({"SUBJECT_ID": [1], "DRUG": ["aspirin 81mg"]}).to_csv(
            tmp_path / "PRESCRIPTIONS.csv", index=False
        )

        from multi_modal_gnn_tpu.data.preprocess import preprocess_pipeline

        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, dataset="mimic3", labevents_chunksize=64
            ),
            feature_space=dataclasses.replace(
                cfg.feature_space,
                labs=dataclasses.replace(
                    cfg.feature_space.labs, top_k=10, min_patient_count=1
                ),
                diagnoses=dataclasses.replace(
                    cfg.feature_space.diagnoses, min_patient_count=1
                ),
                medications=dataclasses.replace(
                    cfg.feature_space.medications, min_patient_count=1
                ),
            ),
        )
        tables = preprocess_pipeline(cfg, interim_dir=None, raw_dir=tmp_path)
        assert called["chunksize"] == 64
        assert len(tables["labs_normalized"]) > 0

    def test_postgres_schema_path(self, monkeypatch):
        """Schema-level postgres test with a mocked engine: verifies the
        query shape and the uppercase-column contract without a server
        (reference equivalent: src/io_mimic.py:97-117)."""
        import sys
        import types

        from multi_modal_gnn_tpu.data import mimic

        queries = []
        fake_engine = object()
        fake_sqlalchemy = types.ModuleType("sqlalchemy")
        fake_sqlalchemy.create_engine = lambda conn: fake_engine
        monkeypatch.setitem(sys.modules, "sqlalchemy", fake_sqlalchemy)

        def fake_read_sql(query, engine, chunksize=None):
            assert engine is fake_engine
            queries.append(query)
            df = pd.DataFrame(
                {"subject_id": [1, 2], "itemid": [50800, 50801], "valuenum": [1.0, 2.0]}
            )
            if chunksize:
                return iter([df])
            return df

        monkeypatch.setattr(pd, "read_sql", fake_read_sql)
        loader = mimic.MIMICLoader(
            "/nonexistent", source="postgres", db_connection="postgresql://x"
        )
        df = loader.load_table("LABEVENTS")
        assert list(df.columns) == ["SUBJECT_ID", "ITEMID", "VALUENUM"]
        assert queries and "mimiciii.labevents" in queries[0]
        # chunked postgres path
        chunks = list(loader.load_labevents(chunksize=10))
        assert len(chunks) == 1


# ---------------------------------------------------------------------------
# Config-hash guard + eval-only trainer
# ---------------------------------------------------------------------------

class TestRestoreGuard:
    def test_mismatched_config_hash_rejected(self, tmp_path):
        cfg = Config()
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=1))
        bundle = _build_bundle(cfg)
        trainer, _ = _make_trainer(cfg, bundle)
        trainer._save(tmp_path / "ckpt")

        cfg2 = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dropout=0.35)
        )
        other, _ = _make_trainer(cfg2, bundle)
        with pytest.raises(ValueError, match="incompatible config"):
            other.restore(tmp_path / "ckpt")
        other.restore(tmp_path / "ckpt", force=True)  # escape hatch

        # run-length knobs are NOT part of the compatibility hash: resuming
        # with a larger epoch budget is the canonical resume
        cfg3 = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=7))
        longer, _ = _make_trainer(cfg3, bundle)
        longer.restore(tmp_path / "ckpt")

    def test_matching_hash_restores(self, tmp_path):
        cfg = Config()
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=1))
        bundle = _build_bundle(cfg)
        trainer, _ = _make_trainer(cfg, bundle)
        trainer.train_epoch()
        trainer.epoch = 1
        trainer._save(tmp_path / "ckpt")
        twin, _ = _make_trainer(cfg, bundle)
        twin.restore(tmp_path / "ckpt")
        assert twin.epoch == 1

    def test_eval_only_trainer(self, tmp_path):
        cfg = Config()
        bundle = _build_bundle(cfg)
        trainer, _ = _make_trainer(cfg, bundle)
        trainer._save(tmp_path / "ckpt")

        lean, _ = _make_trainer(cfg, bundle, eval_only=True)
        assert not hasattr(lean, "_train_step")  # no train step staged
        lean.restore(tmp_path / "ckpt")
        assert np.isfinite(lean.validate("test"))
        with pytest.raises(RuntimeError, match="eval_only"):
            lean.train_epoch()

    def test_evaluation_pipeline_lean(self, tmp_path):
        from multi_modal_gnn_tpu.evaluation.evaluate import evaluation_pipeline

        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, epochs=2),
            evaluation=dataclasses.replace(cfg.evaluation, baselines=["per_lab_mean"]),
        )
        bundle = _build_bundle(cfg)
        trainer, _ = _make_trainer(cfg, bundle)
        trainer.train_epoch()
        trainer._save(tmp_path / "best.ckpt")
        results = evaluation_pipeline(cfg, bundle, tmp_path / "best.ckpt", tmp_path)
        assert "overall_metrics" in results


# ---------------------------------------------------------------------------
# GSPMD: masker not mutated
# ---------------------------------------------------------------------------

def test_gspmd_does_not_mutate_masker():
    from multi_modal_gnn_tpu.parallel.gspmd import GSPMDTrainer, make_2d_mesh

    cfg = Config()
    spec = dataclasses.replace(SyntheticSpec.tiny(), num_patients=128)
    bundle = _build_bundle(cfg, spec)
    masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
    get_split_before = masker.get_split
    mesh = make_2d_mesh(num_devices=4, model_parallel=2)
    trainer = GSPMDTrainer(bundle.graph, masker, cfg, mesh=mesh)
    # the shared masker's method is untouched...
    assert masker.get_split == get_split_before
    batch = masker.get_split("train")
    # ...and still returns unsharded (addressable single-device) batches
    assert len(batch.patient_idx.sharding.device_set) == 1
    # while the trainer's own batches are mesh-placed
    sharded = trainer._get_batch("train")
    assert len(sharded.patient_idx.sharding.device_set) == 4


# ---------------------------------------------------------------------------
# Quality yardsticks: conditional ceiling + ALS
# ---------------------------------------------------------------------------

class TestQualityYardsticks:
    @pytest.fixture(scope="class")
    def cohort_setup(self):
        cfg = Config()
        spec = SyntheticSpec.tiny(seed=3)
        spec = dataclasses.replace(spec, num_patients=400, mean_labs_per_patient=8.0)
        tables, latents = generate_synthetic_tables(spec, return_latents=True)
        bundle = build_heterogeneous_graph(
            labs=tables["labs_normalized"],
            diagnoses=tables["diagnoses"],
            medications=tables["medications"],
            cohort=tables["cohort"],
            labitems=tables["labitems"],
            config=cfg,
        )
        masker = EdgeMasker(bundle.graph, seed=42, host_edges=bundle.patient_lab_host())
        return spec, latents, bundle, masker

    def _w_graph(self, bundle, latents):
        lab_indexer = bundle.meta.indexers["lab"]
        n = bundle.graph.num_nodes("lab")
        w = np.zeros((n, latents.w_lab.shape[1]))
        for g in range(n):
            w[g] = latents.w_lab[int(lab_indexer.id_of(g)) - 51000]
        return w

    def test_ceiling_beats_als_beats_mean(self, cohort_setup):
        from multi_modal_gnn_tpu.evaluation.baselines import ALSBaseline
        from multi_modal_gnn_tpu.evaluation.ceiling import gaussian_conditional_ceiling
        from multi_modal_gnn_tpu.evaluation.metrics import compute_regression_metrics

        spec, latents, bundle, masker = cohort_setup
        tr_p, tr_l, tr_v = masker.split_arrays("train")
        te_p, te_l, te_v = masker.split_arrays("test")
        w = self._w_graph(bundle, latents)
        num_p = bundle.graph.num_nodes("patient")

        ceil = gaussian_conditional_ceiling(
            w, latents.signal, tr_p, tr_l, tr_v, te_p, te_l, te_v, num_patients=num_p
        )
        # expected ceiling below the unconditional one, realized tracks expected
        assert 0.0 < ceil["expected"]["r2"] < ceil["unconditional_r2"]
        assert ceil["realized"]["r2"] == pytest.approx(
            ceil["expected"]["r2"], abs=0.08
        )

        als = ALSBaseline(
            num_p, bundle.graph.num_nodes("lab"), rank=spec.latent_dim, reg=10.0
        ).fit(tr_v, tr_p, tr_l)
        als_m = compute_regression_metrics(als.predict(te_p, te_l), te_v)
        # ALS is learnable (no oracle W) so it sits between mean and ceiling
        assert als_m["r2"] > 0.0
        assert als_m["r2"] <= ceil["realized"]["r2"] + 0.05

    def test_ceiling_no_observations_gives_prior(self):
        from multi_modal_gnn_tpu.evaluation.ceiling import gaussian_conditional_ceiling

        w = np.eye(4)
        empty = np.zeros(0, dtype=np.int32)
        out = gaussian_conditional_ceiling(
            w, 0.6, empty, empty, np.zeros(0), np.array([0, 1]), np.array([0, 1]),
            num_patients=2,
        )
        # with nothing observed the posterior is the prior -> expected R^2 = 0
        assert out["expected"]["r2"] == pytest.approx(0.0, abs=1e-9)
        np.testing.assert_allclose(out["predictions"], 0.0)


class TestConfigRoutedWarmStart:
    """train.extras.warm_start routes train_pipeline through the quality
    recipe (ALS / side-info plant) without touching the Python API."""

    def _cfg_bundle(self, ws, **extras):
        from multi_modal_gnn_tpu.data.synthetic import make_synthetic_bundle

        cfg = Config()
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train,
                epochs=3,
                extras={"warm_start": ws, "warm_start_rank": 4,
                        "warm_start_mem_rank": 3, **extras},
            )
        )
        bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
        return cfg, bundle

    @pytest.mark.parametrize("ws", ["als", "sideinfo"])
    def test_pipeline_warm_start_runs_and_wires_channel(self, ws, tmp_path):
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg, bundle = self._cfg_bundle(ws)
        trainer, results = train_pipeline(cfg, bundle, tmp_path / ws)
        assert np.isfinite(results["test_loss"])
        # the bilinear channel was auto-wired and planted
        assert "bilinear_u" in trainer.state.params
        need = 4 + 1 + (3 if ws == "sideinfo" else 0)
        assert trainer.state.params["bilinear_u"].shape[1] >= need
        assert trainer.best_state is not None

    def test_unknown_warm_start_rejected(self, tmp_path):
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg, bundle = self._cfg_bundle("bogus")
        with pytest.raises(ValueError, match="warm_start"):
            train_pipeline(cfg, bundle, tmp_path)

    def test_warm_start_with_parallel_composes(self, tmp_path):
        """Round 4 lifted the round-2 rejection: warm_start composes with
        the dp trainers (round 5: 2d/gspmd too — tests/test_warmstart.py,
        tests/test_round4.py); the config route must accept and train."""
        from multi_modal_gnn_tpu.parallel.dp import DataParallelTrainer
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg, bundle = self._cfg_bundle("als", parallel="dp")
        trainer, results = train_pipeline(cfg, bundle, tmp_path)
        assert isinstance(trainer, DataParallelTrainer)
        assert np.isfinite(results["test_loss"])

    def test_warm_start_with_minibatch_clusters(self, tmp_path):
        """warm_start composes with cluster training: the plant targets the
        GLOBAL embedding tables, which minibatch steps read through
        patient_id_base windows."""
        from multi_modal_gnn_tpu.training.minibatch import MiniBatchTrainer
        from multi_modal_gnn_tpu.training.trainer import train_pipeline

        cfg, bundle = self._cfg_bundle("sideinfo", num_clusters=2)
        trainer, results = train_pipeline(cfg, bundle, tmp_path)
        assert isinstance(trainer, MiniBatchTrainer)
        assert np.isfinite(results["test_loss"])
        assert trainer.best_state is not None
