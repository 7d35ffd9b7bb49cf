"""Data-ingest tests: eICU/MIMIC loaders on fabricated raw files, preprocess
transforms, and raw-to-graph end-to-end."""

import dataclasses
import gzip

import numpy as np
import pandas as pd
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.eicu import EICULoader, parse_eicu_age, select_cohort
from multi_modal_gnn_tpu.data.mimic import MIMICLoader, filter_labs_for_cohort
from multi_modal_gnn_tpu.data.mimic import select_cohort as mimic_select_cohort
from multi_modal_gnn_tpu.data.preprocess import (
    aggregate_lab_values,
    create_demographic_features,
    normalize_drug_name,
    normalize_drug_names,
    normalize_lab_values,
    process_diagnoses,
    process_medications,
    preprocess_pipeline,
)


# ---------------------------------------------------------------------------
# eICU fixtures
# ---------------------------------------------------------------------------

@pytest.fixture()
def eicu_dir(tmp_path):
    """Fabricate a miniature eICU raw directory (.csv.gz tables)."""
    def write(name, df):
        with gzip.open(tmp_path / f"{name}.csv.gz", "wt") as f:
            df.to_csv(f, index=False)

    patients = pd.DataFrame(
        {
            "patientunitstayid": [1001, 1002, 1003, 1004, 1005],
            "patienthealthsystemstayid": [2001, 2002, 2003, 2004, 2005],
            "uniquepid": ["A", "A", "B", "C", "D"],
            "gender": ["Male", "Male", "Female", "Male", "Female"],
            "age": ["45", "46", "> 89", "17", "70"],
            "ethnicity": ["Caucasian"] * 5,
            "unitdischargeoffset": [2880, 1440, 4320, 1440, 720],
            "unitdischargestatus": ["Alive", "Alive", "Alive", "Alive", "Expired"],
            "unitadmittime24": ["10:00:00", "08:00:00", "12:00:00", "09:00:00", "11:00:00"],
        }
    )
    write("patient", patients)

    rng = np.random.default_rng(0)
    rows = []
    for pid in [1001, 1002, 1003, 1005]:
        for lab, base in [("glucose", 100), ("sodium", 140), ("WBC x 1000", 8)]:
            for t in range(3):
                rows.append((pid, t * 60, lab, base + rng.normal(0, base * 0.05)))
    labs = pd.DataFrame(rows, columns=["patientunitstayid", "labresultoffset", "labname", "labresult"])
    write("lab", labs)

    diagnosis = pd.DataFrame(
        {
            "patientunitstayid": [1001, 1001, 1003, 1005],
            "diagnosisoffset": [10, 20, 30, 40],
            "diagnosisstring": [
                "cardiovascular|shock / hypotension|sepsis",
                "pulmonary|respiratory failure|ARDS",
                "cardiovascular|chest pain / ASHD|acute coronary syndrome",
                "renal|electrolyte imbalance|hyponatremia",
            ],
            "icd9code": ["785.52, 995.92", None, "411.1", "276.1"],
            "diagnosispriority": ["Primary", "Major", "Primary", "Other"],
        }
    )
    write("diagnosis", diagnosis)

    medication = pd.DataFrame(
        {
            "patientunitstayid": [1001, 1001, 1003, 1005, 1005],
            "drugstartoffset": [5, 10, 15, 20, 25],
            "drugname": [
                "ASPIRIN 81 MG PO TABS",
                "Heparin Sodium 5000 units",
                "aspirin ec 325mg",
                "NOREPINEPHRINE 8 MG",
                "Heparin 5000units injection",
            ],
            "dosage": ["81", "5000", "325", "8", "5000"],
            "routeadmin": ["PO", "SC", "PO", "IV", "SC"],
            "frequency": ["Daily"] * 5,
            "prn": ["No"] * 5,
            "drugivadmixture": ["No"] * 5,
        }
    )
    write("medication", medication)
    return tmp_path


class TestEICU:
    def test_age_parsing(self):
        ages = parse_eicu_age(pd.Series(["45", "> 89", "bad", None, " 30 "]))
        assert list(ages[:2]) == [45, 90]
        assert ages[2:4].isna().all()
        assert ages[4] == 30

    def test_cohort_selection(self, eicu_dir):
        loader = EICULoader(eicu_dir)
        cohort = select_cohort(loader.load_patients(), age_min=18, use_first_icu_only=True)
        # patient A: two stays -> earliest admit time kept (1002 @ 08:00)
        # 1004 excluded (age 17); '>89' kept as 90
        assert set(cohort["SUBJECT_ID"]) == {1002, 1003, 1005}
        assert cohort.loc[cohort["SUBJECT_ID"] == 1003, "AGE"].iloc[0] == 90

    def test_exclude_deaths_and_los(self, eicu_dir):
        loader = EICULoader(eicu_dir)
        cohort = select_cohort(
            loader.load_patients(), age_min=18, exclude_deaths=True, min_los_hours=30.0,
            use_first_icu_only=False,
        )
        assert set(cohort["SUBJECT_ID"]) == {1001, 1003}

    def test_mimic_format_views(self, eicu_dir):
        loader = EICULoader(eicu_dir)
        labs = loader.load_labevents()
        assert {"SUBJECT_ID", "ITEMID", "VALUENUM", "CHARTTIME"} <= set(labs.columns)
        assert labs["ITEMID"].iloc[0] == "glucose"

        dx = loader.load_diagnoses_icd()
        row = dx[dx["SUBJECT_ID"] == 1001].iloc[0]
        assert row["ICD9_CODE"] == "785.52"  # first of the comma list
        assert row["DIAGNOSIS_CATEGORY"] == "cardiovascular"
        # missing icd9code falls back to diagnosisstring
        ards = dx[dx["DIAGNOSIS_SUBCATEGORY"] == "respiratory failure"].iloc[0]
        assert "pulmonary" in ards["ICD9_CODE"]

        rx = loader.load_prescriptions()
        assert {"SUBJECT_ID", "HADM_ID", "DRUG", "ROUTE"} <= set(rx.columns)

        items = loader.load_d_labitems()
        assert set(items["ITEMID"]) == {"glucose", "sodium", "WBC x 1000"}


# ---------------------------------------------------------------------------
# MIMIC fixtures
# ---------------------------------------------------------------------------

@pytest.fixture()
def mimic_dir(tmp_path):
    (pd.DataFrame(
        {
            "SUBJECT_ID": [1, 2, 3],
            "GENDER": ["M", "F", "M"],
            "DOB": ["1950-06-15", "2100-01-01", "1980-03-01"],  # 2 is obfuscated-old
        }
    )).to_csv(tmp_path / "PATIENTS.csv", index=False)
    (pd.DataFrame(
        {
            "SUBJECT_ID": [1, 2, 3],
            "HADM_ID": [10, 20, 30],
            "ADMITTIME": ["2000-06-20", "2195-01-05", "2010-02-25"],
            "ETHNICITY": ["WHITE", "BLACK", "WHITE"],
            "HOSPITAL_EXPIRE_FLAG": [0, 0, 1],
        }
    )).to_csv(tmp_path / "ADMISSIONS.csv", index=False)
    (pd.DataFrame(
        {
            "SUBJECT_ID": [1, 2, 3],
            "HADM_ID": [10, 20, 30],
            "ICUSTAY_ID": [100, 200, 300],
            "INTIME": ["2000-06-20", "2195-01-05", "2010-02-25"],
            "OUTTIME": ["2000-06-25", "2195-01-09", "2010-03-01"],
            "LOS": [5.0, 4.0, 4.0],
        }
    )).to_csv(tmp_path / "ICUSTAYS.csv", index=False)
    rng = np.random.default_rng(1)
    rows = []
    for sid in (1, 2, 3):
        for item in (50809, 50912):
            for t in range(2):
                rows.append((sid, item, f"2001-01-0{t+1}", rng.normal(100, 10)))
    pd.DataFrame(rows, columns=["SUBJECT_ID", "ITEMID", "CHARTTIME", "VALUENUM"]).to_csv(
        tmp_path / "LABEVENTS.csv", index=False
    )
    pd.DataFrame(
        {"ITEMID": [50809, 50912], "LABEL": ["Glucose", "Creatinine"]}
    ).to_csv(tmp_path / "D_LABITEMS.csv", index=False)
    pd.DataFrame(
        {"SUBJECT_ID": [1, 3], "HADM_ID": [10, 30], "ICD9_CODE": ["4280", "5849"]}
    ).to_csv(tmp_path / "DIAGNOSES_ICD.csv", index=False)
    pd.DataFrame(
        {"SUBJECT_ID": [1, 2], "HADM_ID": [10, 20], "DRUG": ["Aspirin 81mg", "Heparin"]}
    ).to_csv(tmp_path / "PRESCRIPTIONS.csv", index=False)
    return tmp_path


class TestMIMIC:
    def test_cohort_age_obfuscation(self, mimic_dir):
        loader = MIMICLoader(mimic_dir)
        cohort = mimic_select_cohort(
            loader.load_patients(), loader.load_admissions(), loader.load_icustays(),
            age_min=18,
        )
        a = dict(zip(cohort["SUBJECT_ID"], cohort["AGE"]))
        assert a[1] == pytest.approx(50.0)
        assert a[2] == pytest.approx(91.4)  # >89 remap
        assert a[3] == pytest.approx(29.0)  # birthday not yet reached

    def test_exclude_deaths(self, mimic_dir):
        loader = MIMICLoader(mimic_dir)
        cohort = mimic_select_cohort(
            loader.load_patients(), loader.load_admissions(), loader.load_icustays(),
            age_min=18, exclude_deaths=True,
        )
        assert 3 not in set(cohort["SUBJECT_ID"])

    def test_filter_labs(self, mimic_dir):
        loader = MIMICLoader(mimic_dir)
        cohort = mimic_select_cohort(
            loader.load_patients(), loader.load_admissions(), loader.load_icustays(), age_min=18
        )
        labs, items = filter_labs_for_cohort(
            loader.load_labevents(), cohort, loader.load_d_labitems(),
            top_k=1, min_patient_count=2,
        )
        assert labs["ITEMID"].nunique() == 1
        assert len(items) == 1 and "NUM_PATIENTS" in items.columns


# ---------------------------------------------------------------------------
# Preprocess transforms
# ---------------------------------------------------------------------------

class TestPreprocess:
    def test_drug_normalization(self):
        cases = {
            "Aspirin 81mg": "aspirin",
            "ASPIRIN EC 325MG": "aspirin",
            "Metoprolol Tartrate 25 mg oral tablet": "metoprolol",
            "Heparin Sodium 5000 units injection": "heparin",
            "0.9% Sodium Chloride": "sodium",
        }
        out = normalize_drug_names(pd.Series(list(cases)))
        assert list(out) == list(cases.values())
        assert normalize_drug_name("Aspirin 81mg") == "aspirin"
        assert normalize_drug_name(None) == ""

    def test_aggregate_last(self):
        labs = pd.DataFrame(
            {
                "SUBJECT_ID": [1, 1, 1, 2],
                "ITEMID": [9, 9, 9, 9],
                "VALUENUM": [5.0, 6.0, 7.0, 100.0],
                "CHARTTIME": [1, 3, 2, 1],
            }
        )
        cohort = pd.DataFrame({"SUBJECT_ID": [1, 2]})
        agg = aggregate_lab_values(labs, cohort, method="last", remove_outliers_flag=False)
        assert agg.loc[agg["SUBJECT_ID"] == 1, "VALUE"].iloc[0] == 6.0  # latest charttime

    def test_aggregate_outlier_removal(self):
        vals = [10.0] * 30 + [10000.0]
        labs = pd.DataFrame(
            {
                "SUBJECT_ID": np.arange(31),
                "ITEMID": 1,
                "VALUENUM": vals,
                "CHARTTIME": np.arange(31),
            }
        )
        cohort = pd.DataFrame({"SUBJECT_ID": np.arange(31)})
        agg = aggregate_lab_values(labs, cohort, outlier_threshold=5.0)
        assert 10000.0 not in set(agg["VALUE"])

    def test_normalize_per_lab(self):
        labs = pd.DataFrame(
            {
                "SUBJECT_ID": [1, 2, 3, 1, 2, 3],
                "ITEMID": [7, 7, 7, 8, 8, 8],
                "VALUE": [10.0, 20.0, 30.0, 100.0, 200.0, 300.0],
            }
        )
        out, normalizer = normalize_lab_values(labs)
        for item in (7, 8):
            z = out.loc[out["ITEMID"] == item, "VALUE_NORMALIZED"]
            assert z.mean() == pytest.approx(0, abs=1e-9)
        # fitted stats usable for inverse transform
        back = normalizer.inverse_transform(
            out.loc[out["ITEMID"] == 7, "VALUE_NORMALIZED"], 7
        )
        np.testing.assert_allclose(back, [10.0, 20.0, 30.0])

    def test_process_diagnoses_icd3(self):
        dx = pd.DataFrame(
            {
                "SUBJECT_ID": [1, 1, 2, 3],
                "HADM_ID": [10, 10, 20, 30],
                "ICD9_CODE": ["4280", "4281", "4289", "5849"],
            }
        )
        cohort = pd.DataFrame({"SUBJECT_ID": [1, 2, 3], "HADM_ID": [10, 20, 30]})
        out = process_diagnoses(dx, cohort, collapse_to_3digit=True, min_patient_count=1)
        # 4280/4281 both collapse to 428 and dedupe per patient
        assert set(out["ICD3_CODE"]) == {"428", "584"}
        assert len(out[out["SUBJECT_ID"] == 1]) == 1

    def test_process_medications_filtering(self):
        rx = pd.DataFrame(
            {
                "SUBJECT_ID": [1, 2, 3, 1],
                "HADM_ID": [10, 20, 30, 10],
                "DRUG": ["Aspirin 81mg", "aspirin", "Rare Drug 5mg", "ASPIRIN EC"],
            }
        )
        cohort = pd.DataFrame({"SUBJECT_ID": [1, 2, 3], "HADM_ID": [10, 20, 30]})
        out = process_medications(rx, cohort, min_patient_count=2)
        assert set(out["DRUG"]) == {"aspirin"}
        assert len(out) == 2  # deduped per patient

    def test_demographics(self):
        cohort = pd.DataFrame(
            {"SUBJECT_ID": [1, 2], "AGE": [40.0, 60.0], "GENDER": ["M", "F"]}
        )
        demo = create_demographic_features(cohort)
        assert demo["GENDER_M"].tolist() == [1.0, 0.0]
        assert demo["AGE_NORM"].mean() == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Raw -> graph end-to-end
# ---------------------------------------------------------------------------

def test_eicu_raw_to_graph(eicu_dir, tmp_path):
    """Full stage chain on fabricated raw files: preprocess -> parquet ->
    graph build -> validation."""
    import dataclasses as dc

    from multi_modal_gnn_tpu.graph.build import build_graph_from_preprocessed
    from multi_modal_gnn_tpu.graph.stats import validate_graph

    cfg = Config()
    cfg = cfg.replace(
        data=dc.replace(cfg.data, dataset="eicu", raw_dir=str(eicu_dir)),
        feature_space=dc.replace(
            cfg.feature_space,
            labs=dc.replace(cfg.feature_space.labs, min_patient_count=1, top_k=10),
            diagnoses=dc.replace(cfg.feature_space.diagnoses, min_patient_count=1),
            medications=dc.replace(cfg.feature_space.medications, min_patient_count=1),
        ),
    )
    interim = tmp_path / "interim"
    tables = preprocess_pipeline(cfg, interim_dir=interim)
    assert (interim / "labs_normalized.parquet").exists()
    assert (interim / "cohort.parquet").exists()
    assert len(tables["labs_normalized"]) > 0

    bundle = build_graph_from_preprocessed(interim, cfg, output_path=tmp_path / "graph")
    validate_graph(bundle.graph)
    assert bundle.graph.num_nodes("patient") == 3
    assert bundle.graph.patient_lab.num_valid > 0
    assert (tmp_path / "graph.npz").exists()


def test_map_eicu_to_mimic_format(eicu_dir):
    from multi_modal_gnn_tpu.data.eicu import EICULoader, map_eicu_to_mimic_format

    tables = map_eicu_to_mimic_format(EICULoader(eicu_dir))
    assert set(tables) == {"patients", "admissions", "labevents", "labitems",
                           "diagnoses", "prescriptions"}
    assert "SUBJECT_ID" in tables["patients"].columns
    assert tables["patients"]["AGE"].max() == 90  # '> 89' remap
    assert "HADM_ID" in tables["admissions"].columns


class TestMIMICDatabaseSource:
    """The postgres source path (data/mimic.py _load_postgres / the chunked
    labevents query; reference src/io_mimic.py:97-117) exercised against a
    real database engine: a sqlite DB with an attached ``mimiciii`` schema
    stands in for the postgres server (``db_connection`` accepts any open
    DBAPI connection; a URL string still routes through sqlalchemy)."""

    @pytest.fixture()
    def mimic_db(self, mimic_dir):
        import sqlite3

        conn = sqlite3.connect(":memory:")
        conn.execute("ATTACH DATABASE ':memory:' AS mimiciii")
        for table in (
            "PATIENTS", "ADMISSIONS", "ICUSTAYS", "LABEVENTS",
            "D_LABITEMS", "DIAGNOSES_ICD", "PRESCRIPTIONS",
        ):
            df = pd.read_csv(mimic_dir / f"{table}.csv")
            # postgres exposes lowercase identifiers — mirror that, so the
            # loader's uppercase normalization is what the test exercises
            df.columns = df.columns.str.lower()
            # pandas' sqlite fallback ignores schema=; stage in main and
            # move into the attached mimiciii schema
            df.to_sql(table.lower(), conn, index=False)
            conn.execute(
                f"CREATE TABLE mimiciii.{table.lower()} AS "
                f"SELECT * FROM main.{table.lower()}"
            )
            conn.execute(f"DROP TABLE main.{table.lower()}")
        yield conn
        conn.close()

    def test_tables_roundtrip_uppercase(self, mimic_db):
        loader = MIMICLoader("/nonexistent", source="postgres", db_connection=mimic_db)
        pats = loader.load_patients()
        assert {"SUBJECT_ID", "GENDER", "DOB"} <= set(pats.columns)
        assert len(pats) == 3
        items = loader.load_d_labitems()
        assert set(items["ITEMID"]) == {50809, 50912}

    def test_cohort_selection_from_db(self, mimic_db):
        loader = MIMICLoader("/nonexistent", source="postgres", db_connection=mimic_db)
        cohort = mimic_select_cohort(
            loader.load_patients(), loader.load_admissions(), loader.load_icustays(),
            age_min=18, age_max=95, exclude_deaths=True, min_los_hours=24.0,
        )
        # subject 3 died in hospital; 1 and 2 survive the filters
        assert set(cohort["SUBJECT_ID"]) == {1, 2}
        # the '>89' DOB obfuscation remap lands on 91.4 via the DB path too
        assert cohort.loc[cohort["SUBJECT_ID"] == 2, "AGE"].iloc[0] == pytest.approx(91.4)

    def test_chunked_labevents_from_db(self, mimic_db):
        loader = MIMICLoader("/nonexistent", source="postgres", db_connection=mimic_db)
        labs = loader.load_labevents_for_cohort([1, 2], chunksize=3)
        assert set(labs["SUBJECT_ID"]) == {1, 2}
        assert len(labs) == 8  # 2 subjects x 2 items x 2 timestamps
        assert labs["VALUENUM"].notna().all()

    def test_missing_source_validation(self):
        with pytest.raises(ValueError):
            MIMICLoader("/nonexistent", source="postgres", db_connection=None)
