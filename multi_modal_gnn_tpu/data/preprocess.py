"""Preprocess / feature-engineering stage.

Functional parity with the reference preprocess (src/preprocess.py): per-lab
outlier removal + aggregation to one value per patient-lab pair, per-lab
normalization, ICD-9 3-digit collapse with top-K/min-count filtering, drug
name normalization, demographic features, and the six-parquet interim
contract (SURVEY.md section 2.3).  Differences are purely about speed: the
per-lab Python loops (src/preprocess.py:69-79, :143-150) and per-row regex
``.apply`` (:362) become grouped transforms and vectorized ``.str`` chains.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional, Tuple

import pandas as pd

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.utils.io import save_dataframe
from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer, remove_outliers_grouped

logger = logging.getLogger(__name__)


# ============================================================================
# Labs
# ============================================================================

def aggregate_lab_values(
    labs: pd.DataFrame,
    cohort: pd.DataFrame,
    method: str = "last",
    remove_outliers_flag: bool = True,
    outlier_threshold: float = 5.0,
) -> pd.DataFrame:
    """One value per (patient, lab): outlier-clean then aggregate.

    "last" keeps the most recent CHARTTIME value (the reference default,
    capturing current clinical state); mean/median/min/max are grouped
    statistics.  Outliers beyond ``outlier_threshold`` per-lab standard
    deviations are dropped first (src/preprocess.py:28-110).
    """
    ids = set(cohort["SUBJECT_ID"])
    labs = labs[labs["SUBJECT_ID"].isin(ids)].copy()

    if remove_outliers_flag and len(labs):
        cleaned = remove_outliers_grouped(labs, "VALUENUM", "ITEMID", outlier_threshold)
        labs["VALUENUM"] = cleaned
        labs = labs[labs["VALUENUM"].notna()]

    if method == "last":
        labs = labs.sort_values(["SUBJECT_ID", "ITEMID", "CHARTTIME"])
        agg = labs.groupby(["SUBJECT_ID", "ITEMID"]).tail(1)
        agg = agg[["SUBJECT_ID", "ITEMID", "VALUENUM"]].copy()
    elif method in ("mean", "median", "min", "max"):
        agg = labs.groupby(["SUBJECT_ID", "ITEMID"])["VALUENUM"].agg(method).reset_index()
    else:
        raise ValueError(f"Unknown aggregation method: {method}")

    agg = agg.rename(columns={"VALUENUM": "VALUE"})
    logger.info(
        "Aggregated to %d patient-lab pairs (%d patients, %d labs)",
        len(agg), agg["SUBJECT_ID"].nunique(), agg["ITEMID"].nunique(),
    )
    return agg


def normalize_lab_values(
    labs_agg: pd.DataFrame, method: str = "zscore"
) -> Tuple[pd.DataFrame, LabNormalizer]:
    """Per-lab normalization; returns the fitted normalizer for inverse
    transforms at inference time (src/preprocess.py:113-164)."""
    normalizer = LabNormalizer(method=method)
    out = labs_agg.copy()
    out["VALUE_NORMALIZED"] = normalizer.fit_transform_frame(out, "VALUE", "ITEMID")
    out = out[out["VALUE_NORMALIZED"].notna()]
    out["SUBJECT_ID"] = out["SUBJECT_ID"].astype("int64")
    try:
        out["ITEMID"] = out["ITEMID"].astype("int64")
    except (ValueError, TypeError):
        pass  # string lab names (eICU)
    logger.info("Normalized %d lab values", len(out))
    return out, normalizer


# ============================================================================
# Diagnoses
# ============================================================================

def process_diagnoses(
    diagnoses: pd.DataFrame,
    cohort: pd.DataFrame,
    collapse_to_3digit: bool = True,
    top_k: Optional[int] = None,
    min_patient_count: int = 5,
) -> pd.DataFrame:
    """ICD-9 -> 3-digit collapse, unique patient-diagnosis pairs, frequency
    filtering (src/preprocess.py:171-266)."""
    dx = diagnoses
    if "HADM_ID" in dx.columns and "HADM_ID" in cohort.columns:
        dx = dx[dx["HADM_ID"].isin(set(cohort["HADM_ID"]))]
    dx = dx.copy()
    dx["ICD9_CODE"] = dx["ICD9_CODE"].astype(str).str.strip()
    dx = dx[(dx["ICD9_CODE"] != "") & dx["ICD9_CODE"].notna() & (dx["ICD9_CODE"] != "nan")]

    dx["ICD3_CODE"] = dx["ICD9_CODE"].str[:3] if collapse_to_3digit else dx["ICD9_CODE"]
    code_col = "ICD3_CODE"

    dx = dx[dx["SUBJECT_ID"].isin(set(cohort["SUBJECT_ID"]))]
    keep = ["SUBJECT_ID", code_col] + [
        c for c in ("DIAGNOSIS_CATEGORY", "DIAGNOSIS_SUBCATEGORY", "DIAGNOSIS_PRIORITY")
        if c in dx.columns
    ]
    pairs = dx[keep].drop_duplicates(subset=["SUBJECT_ID", code_col])

    counts = pairs[code_col].value_counts()
    counts = counts[counts >= min_patient_count]
    if top_k is not None:
        counts = counts.head(top_k)
    pairs = pairs[pairs[code_col].isin(set(counts.index))]
    logger.info(
        "Diagnoses: %d codes, %d pairs, %d patients",
        len(counts), len(pairs), pairs["SUBJECT_ID"].nunique(),
    )
    return pairs


# ============================================================================
# Medications
# ============================================================================

_DOSE_RE = r"\d+\.?\d*\s*(?:mg|mcg|ml|g|%|units?)"
_FORM_RE = r"\b(?:tablet|capsule|injection|solution|suspension|syrup|cream|ointment)\b"
_ROUTE_RE = r"\b(?:oral|topical|iv|intravenous|subcutaneous)\b"


def normalize_drug_names(drugs: pd.Series) -> pd.Series:
    """Vectorized drug-name normalization: lowercase, strip doses/forms/
    routes/punctuation, keep the first word (usually the generic name).
    Same transform chain as the reference's per-row function
    (src/preprocess.py:273-312), applied as pandas .str ops."""
    s = drugs.astype("string").str.lower()
    s = s.str.replace(_DOSE_RE, "", regex=True)
    s = s.str.replace(_FORM_RE, "", regex=True)
    s = s.str.replace(_ROUTE_RE, "", regex=True)
    s = s.str.replace(r"[^\w\s]", " ", regex=True)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()
    return s.str.split(" ").str[0].fillna("")


def normalize_drug_name(drug) -> str:
    """Scalar convenience wrapper over :func:`normalize_drug_names`."""
    if pd.isna(drug):
        return ""
    return str(normalize_drug_names(pd.Series([str(drug)])).iloc[0])


def process_medications(
    prescriptions: pd.DataFrame,
    cohort: pd.DataFrame,
    normalize_names: bool = True,
    top_k: Optional[int] = None,
    min_patient_count: int = 5,
) -> pd.DataFrame:
    """Drug normalization + unique patient-drug pairs + frequency filtering
    (src/preprocess.py:315-412)."""
    meds = prescriptions
    if "HADM_ID" in meds.columns and "HADM_ID" in cohort.columns:
        meds = meds[meds["HADM_ID"].isin(set(cohort["HADM_ID"]))]
    meds = meds.copy()
    meds["DRUG"] = meds["DRUG"].astype(str).str.strip()
    meds = meds[(meds["DRUG"] != "") & meds["DRUG"].notna() & (meds["DRUG"] != "nan")]

    if normalize_names:
        meds["DRUG_NORM"] = normalize_drug_names(meds["DRUG"])
        meds = meds[meds["DRUG_NORM"] != ""]
        drug_col = "DRUG_NORM"
    else:
        drug_col = "DRUG"

    meds = meds[meds["SUBJECT_ID"].isin(set(cohort["SUBJECT_ID"]))]
    keep = ["SUBJECT_ID", drug_col] + [
        c for c in ("ROUTE", "FREQUENCY", "PRN", "IV_ADMIXTURE") if c in meds.columns
    ]
    pairs = meds[keep].drop_duplicates(subset=["SUBJECT_ID", drug_col])

    counts = pairs[drug_col].value_counts()
    counts = counts[counts >= min_patient_count]
    if top_k is not None:
        counts = counts.head(top_k)
    pairs = pairs[pairs[drug_col].isin(set(counts.index))]
    pairs = pairs.rename(columns={drug_col: "DRUG"})
    logger.info(
        "Medications: %d drugs, %d pairs, %d patients",
        len(counts), len(pairs), pairs["SUBJECT_ID"].nunique(),
    )
    return pairs


# ============================================================================
# Demographics
# ============================================================================

def create_demographic_features(
    cohort: pd.DataFrame,
    include_age: bool = True,
    include_gender: bool = True,
    include_ethnicity: bool = False,
    apache: Optional[pd.DataFrame] = None,
) -> pd.DataFrame:
    """Per-patient demographic feature table (src/preprocess.py:419-546).
    Legacy in the reference's final model (pure ID embeddings) but kept for
    parity — HGT-style models and analyses consume it."""
    demo = pd.DataFrame({"SUBJECT_ID": cohort["SUBJECT_ID"].to_numpy()})
    if include_age and "AGE" in cohort.columns:
        age = pd.to_numeric(cohort["AGE"], errors="coerce")
        demo["AGE"] = age.to_numpy()
        std = age.std()
        demo["AGE_NORM"] = ((age - age.mean()) / std if std and std > 0 else age * 0).to_numpy()
    if include_gender and "GENDER" in cohort.columns:
        g = cohort["GENDER"].astype("string").str.upper().str[0]
        demo["GENDER_M"] = (g == "M").astype(float).to_numpy()
        demo["GENDER_F"] = (g == "F").astype(float).to_numpy()
    if include_ethnicity and "ETHNICITY" in cohort.columns:
        onehot = pd.get_dummies(cohort["ETHNICITY"], prefix="ETH").astype(float)
        demo = pd.concat([demo.reset_index(drop=True), onehot.reset_index(drop=True)], axis=1)
    if apache is not None and len(apache):
        cols = [c for c in ("SUBJECT_ID", "acutephysiologyscore", "apachescore") if c in apache.columns]
        demo = demo.merge(apache[cols].drop_duplicates("SUBJECT_ID"), on="SUBJECT_ID", how="left")
    return demo


# ============================================================================
# Pipeline
# ============================================================================

def preprocess_pipeline(
    config: Config,
    interim_dir: Optional[str | Path] = None,
    raw_dir: Optional[str | Path] = None,
) -> Dict[str, pd.DataFrame]:
    """End-to-end preprocess stage: load raw data (eICU / MIMIC-III /
    synthetic per config), select the cohort, process all modalities, and
    write the six-parquet interim contract (src/preprocess.py:553-727)."""
    from multi_modal_gnn_tpu.data.synthetic import (
        generate_synthetic_tables,
        spec_from_config,
    )

    dataset = config.data.dataset
    fs = config.feature_space
    cohort_cfg = {
        "age_min": config.cohort.age_min,
        "age_max": config.cohort.age_max,
        "use_first_icu_only": config.cohort.use_first_icu_only,
        "subject_limit": config.cohort.subject_limit,
        "min_los_hours": config.cohort.min_los_hours,
        "exclude_deaths": config.cohort.exclude_deaths,
    }
    raw_dir = Path(raw_dir or config.data.raw_dir)

    if dataset == "synthetic":
        # config-routed spec: data.synthetic.preset selects the generator
        # (flat eicu_demo default, or the VALIDATED eicu_real phenomenology)
        # with per-field overrides — see synthetic.spec_from_config
        tables = generate_synthetic_tables(spec_from_config(config))
        _write_interim(tables, interim_dir)
        return tables

    if dataset == "eicu":
        from multi_modal_gnn_tpu.data import eicu as io

        loader = io.EICULoader(raw_dir)
        cohort = io.select_cohort(loader.load_patients(), **cohort_cfg)
        labevents = loader.load_labevents()
        d_labitems = loader.load_d_labitems()
        diagnoses = loader.load_diagnoses_icd()
        prescriptions = loader.load_prescriptions()
        apache = loader.load_apache_for_cohort(cohort) if _has_apache(loader) else None
    elif dataset == "mimic3":
        from multi_modal_gnn_tpu.data import mimic as io

        loader = io.MIMICLoader(raw_dir)
        cohort = io.select_cohort(
            loader.load_patients(), loader.load_admissions(), loader.load_icustays(),
            **cohort_cfg,
        )
        if config.data.labevents_chunksize:
            # stream + pre-filter to the cohort: peak memory is one chunk,
            # not the whole 27M-row table (reference src/io_mimic.py:205-250)
            labevents = loader.load_labevents_for_cohort(
                cohort["SUBJECT_ID"], chunksize=config.data.labevents_chunksize
            )
        else:
            labevents = loader.load_labevents()
        d_labitems = loader.load_d_labitems()
        diagnoses = loader.load_diagnoses_icd()
        prescriptions = loader.load_prescriptions()
        apache = None
    else:
        raise ValueError(f"Unknown dataset: {dataset}")

    from multi_modal_gnn_tpu.data.mimic import filter_labs_for_cohort

    labs, labitems = filter_labs_for_cohort(
        labevents, cohort, d_labitems,
        top_k=fs.labs.top_k, min_patient_count=fs.labs.min_patient_count,
    )
    labs_agg = aggregate_lab_values(
        labs, cohort,
        method=fs.labs.aggregate,
        remove_outliers_flag=fs.labs.outlier_std_threshold is not None,
        outlier_threshold=fs.labs.outlier_std_threshold or 5.0,
    )
    labs_norm, normalizer = normalize_lab_values(labs_agg, method=fs.labs.normalize)

    dx = process_diagnoses(
        diagnoses, cohort,
        collapse_to_3digit=fs.diagnoses.collapse_to_3digit,
        top_k=fs.diagnoses.top_k,
        min_patient_count=fs.diagnoses.min_patient_count,
    )
    rx = process_medications(
        prescriptions, cohort,
        normalize_names=fs.medications.normalize_names,
        top_k=fs.medications.top_k,
        min_patient_count=fs.medications.min_patient_count,
    )
    demo = create_demographic_features(
        cohort,
        include_age=fs.demographics.include_age,
        include_gender=fs.demographics.include_gender,
        include_ethnicity=fs.demographics.include_ethnicity,
        apache=apache,
    )

    cohort_out = cohort[
        [c for c in ("SUBJECT_ID", "HADM_ID", "AGE", "GENDER", "ETHNICITY") if c in cohort.columns]
    ].copy()
    tables = {
        "cohort": cohort_out,
        "labs_normalized": labs_norm,
        "diagnoses": dx,
        "medications": rx,
        "demographics": demo,
        "labitems": labitems,
        "normalizer": normalizer.to_frame(),
    }
    _write_interim(tables, interim_dir)
    return tables


def _has_apache(loader) -> bool:
    try:
        loader.load_apache()
        return True
    except FileNotFoundError:
        return False


def _write_interim(tables: Dict[str, pd.DataFrame], interim_dir) -> None:
    if interim_dir is None:
        return
    interim = Path(interim_dir)
    interim.mkdir(parents=True, exist_ok=True)
    for name, df in tables.items():
        if isinstance(df, pd.DataFrame):
            save_dataframe(df, interim / f"{name}.parquet")
    logger.info("Wrote interim tables to %s", interim)
