"""eICU Collaborative Research Database adapter.

Functional parity with the reference eICU loader (src/io_eicu.py): loads the
gzipped CSV tables, maps the eICU schema onto the MIMIC-compatible column
contract the rest of the pipeline consumes (SUBJECT_ID / ITEMID / VALUENUM /
ICD9_CODE / DRUG ...), synthesizes a lab dictionary, and selects the cohort.
All row transforms are vectorized pandas string/numeric ops — the reference
applies per-row Python functions (e.g. src/io_eicu.py:217-224 first-ICD9
extraction, :455-464 age parsing).

Schema notes (mirroring the reference's choices):
  * SUBJECT_ID := patientunitstayid (one graph node per ICU stay);
  * ITEMID := labname (eICU has no numeric lab IDs);
  * HADM_ID := patienthealthsystemstayid;
  * age '> 89' parses to 90 (src/io_eicu.py:459-460);
  * diagnoses: first code of the comma-separated icd9code list, falling back
    to the hierarchical diagnosisstring when absent (src/io_eicu.py:226-229).
"""

from __future__ import annotations

import gzip
import logging
from pathlib import Path
from typing import Dict, Optional, Union

import pandas as pd

logger = logging.getLogger(__name__)


class EICULoader:
    """Loads eICU .csv.gz tables and exposes MIMIC-format views."""

    def __init__(self, data_dir: Union[str, Path]):
        self.data_dir = Path(data_dir)
        if not self.data_dir.exists():
            raise FileNotFoundError(f"Data directory not found: {self.data_dir}")
        self._cache: Dict[str, pd.DataFrame] = {}

    def _load_csv(self, table_name: str) -> pd.DataFrame:
        if table_name in self._cache:
            return self._cache[table_name]
        path = self.data_dir / f"{table_name}.csv.gz"
        if not path.exists():
            # accept uncompressed files too
            alt = self.data_dir / f"{table_name}.csv"
            if not alt.exists():
                raise FileNotFoundError(f"CSV file not found: {path}")
            df = pd.read_csv(alt, low_memory=False)
        else:
            with gzip.open(path, "rt") as f:
                df = pd.read_csv(f, low_memory=False)
        logger.info("Loaded %s: %s rows", table_name, f"{len(df):,}")
        self._cache[table_name] = df
        return df

    def load_table(self, table_name: str) -> pd.DataFrame:
        return self._load_csv(table_name)

    def load_patients(self) -> pd.DataFrame:
        return self._load_csv("patient")

    def load_lab(self) -> pd.DataFrame:
        return self._load_csv("lab")

    def load_diagnosis(self) -> pd.DataFrame:
        return self._load_csv("diagnosis")

    def load_medication(self) -> pd.DataFrame:
        return self._load_csv("medication")

    def load_apache(self) -> pd.DataFrame:
        return self._load_csv("apachePatientResult")

    # -- MIMIC-format views -------------------------------------------------

    def load_labevents(self) -> pd.DataFrame:
        """Lab results with SUBJECT_ID / ITEMID / VALUENUM / CHARTTIME."""
        labs = self.load_lab()
        return pd.DataFrame(
            {
                "SUBJECT_ID": labs["patientunitstayid"],
                "ITEMID": labs["labname"],
                "VALUENUM": pd.to_numeric(labs["labresult"], errors="coerce"),
                "CHARTTIME": labs["labresultoffset"],
            }
        )

    def _stay_to_hospital_stay(self) -> pd.DataFrame:
        p = self.load_patients()
        return p[["patientunitstayid", "patienthealthsystemstayid"]].drop_duplicates()

    def load_diagnoses_icd(self) -> pd.DataFrame:
        """Diagnoses with SUBJECT_ID / HADM_ID / ICD9_CODE (+ hierarchy)."""
        dx = self.load_diagnosis()
        out = pd.DataFrame({"SUBJECT_ID": dx["patientunitstayid"]})
        out = out.assign(
            # vectorized first-code extraction from the comma-separated list
            ICD9_CODE=dx["icd9code"].astype("string").str.split(",").str[0].str.strip(),
            diagnosisstring=dx["diagnosisstring"],
            patientunitstayid=dx["patientunitstayid"],
        )
        out["ICD9_CODE"] = out["ICD9_CODE"].fillna(out["diagnosisstring"])
        # hierarchy levels from "category|subcategory|specific"
        parts = dx["diagnosisstring"].astype("string").str.split("|")
        out["DIAGNOSIS_CATEGORY"] = parts.str[0].str.strip().fillna("Unknown")
        # rows with fewer than two levels yield <NA> -> "Unknown"
        out["DIAGNOSIS_SUBCATEGORY"] = parts.str[1].str.strip().fillna("Unknown")
        if "diagnosispriority" in dx.columns:
            out["DIAGNOSIS_PRIORITY"] = dx["diagnosispriority"].fillna("Other")
        out = out.merge(self._stay_to_hospital_stay(), on="patientunitstayid", how="left")
        out["HADM_ID"] = out["patienthealthsystemstayid"]
        return out.drop(columns=["patientunitstayid", "patienthealthsystemstayid"])

    def load_prescriptions(self) -> pd.DataFrame:
        """Medications with SUBJECT_ID / HADM_ID / DRUG (+ admin metadata)."""
        rx = self.load_medication()
        out = pd.DataFrame(
            {
                "SUBJECT_ID": rx["patientunitstayid"],
                "DRUG": rx["drugname"],
                "patientunitstayid": rx["patientunitstayid"],
            }
        )
        for src, dst, default in (
            ("routeadmin", "ROUTE", "Unknown"),
            ("frequency", "FREQUENCY", "Unknown"),
            ("prn", "PRN", "No"),
            ("drugivadmixture", "IV_ADMIXTURE", "No"),
            ("dosage", "DOSAGE", ""),
        ):
            out[dst] = rx[src].fillna(default) if src in rx.columns else default
        out = out.merge(self._stay_to_hospital_stay(), on="patientunitstayid", how="left")
        out["HADM_ID"] = out["patienthealthsystemstayid"]
        return out.drop(columns=["patientunitstayid", "patienthealthsystemstayid"])

    def load_apache_for_cohort(self, cohort: pd.DataFrame) -> pd.DataFrame:
        apache = self.load_apache()
        cols = [
            "patientunitstayid",
            "acutephysiologyscore",
            "apachescore",
            "predictedicumortality",
            "predictedhospitalmortality",
        ]
        out = apache[[c for c in cols if c in apache.columns]].copy()
        out["SUBJECT_ID"] = out["patientunitstayid"]
        return out

    def load_d_labitems(self) -> pd.DataFrame:
        """Synthesized lab dictionary — eICU embeds lab names in the lab
        table (reference src/io_eicu.py:346-364)."""
        names = self.load_lab()["labname"].dropna().unique()
        return pd.DataFrame(
            {"ITEMID": names, "LABEL": names, "FLUID": "Blood", "CATEGORY": "Chemistry"}
        )


def map_eicu_to_mimic_format(loader: EICULoader) -> Dict[str, pd.DataFrame]:
    """All eICU tables mapped to the MIMIC-III-style contract in one call
    (reference src/io_eicu.py:420-509)."""
    patients = loader.load_patients().copy()
    patients["SUBJECT_ID"] = patients["patientunitstayid"]
    patients["GENDER"] = patients.get("gender")
    patients["AGE"] = parse_eicu_age(patients["age"])

    admissions = loader.load_patients().copy()
    admissions["SUBJECT_ID"] = admissions["patientunitstayid"]
    admissions["HADM_ID"] = admissions["patienthealthsystemstayid"]

    return {
        "patients": patients,
        "admissions": admissions,
        "labevents": loader.load_labevents(),
        "labitems": loader.load_d_labitems(),
        "diagnoses": loader.load_diagnoses_icd(),
        "prescriptions": loader.load_prescriptions(),
    }


def parse_eicu_age(age: pd.Series) -> pd.Series:
    """Vectorized age parser: '> 89' -> 90, numeric strings -> int, else NaN."""
    s = age.astype("string").str.strip()
    s = s.mask(s.eq("> 89").fillna(False), "90")
    return pd.to_numeric(s, errors="coerce")


def select_cohort(
    patients: pd.DataFrame,
    age_min: int = 18,
    age_max: Optional[int] = None,
    use_first_icu_only: bool = True,
    subject_limit: Optional[int] = None,
    min_los_hours: Optional[float] = None,
    exclude_deaths: bool = False,
    **_unused,
) -> pd.DataFrame:
    """Cohort selection on the eICU patient table (src/io_eicu.py:516-607)."""
    cohort = patients.copy()
    cohort["AGE"] = parse_eicu_age(cohort["age"])

    mask = cohort["AGE"] >= age_min
    if age_max is not None:
        mask &= cohort["AGE"] <= age_max
    cohort = cohort[mask]
    logger.info("After age filter [%s, %s]: %d stays", age_min, age_max, len(cohort))

    # unit discharge offset is minutes from unit admission
    if "unitdischargeoffset" in cohort.columns:
        cohort["LOS_HOURS"] = cohort["unitdischargeoffset"] / 60.0
        if min_los_hours is not None:
            cohort = cohort[cohort["LOS_HOURS"] >= min_los_hours]
            logger.info("After LOS >= %sh: %d stays", min_los_hours, len(cohort))

    if exclude_deaths and "unitdischargestatus" in cohort.columns:
        cohort = cohort[cohort["unitdischargestatus"] == "Alive"]
        logger.info("After excluding deaths: %d stays", len(cohort))

    if use_first_icu_only:
        admit = pd.to_datetime(
            cohort.get("unitadmittime24"), format="%H:%M:%S", errors="coerce"
        )
        # drop_duplicates keeps WHOLE rows — groupby().first() would take the
        # first non-null value per column independently, assembling chimeric
        # rows mixing fields from different stays when the earliest has nulls
        cohort = cohort.assign(_admit=admit).sort_values(["uniquepid", "_admit"])
        cohort = (
            cohort.drop_duplicates("uniquepid", keep="first")
            .drop(columns=["_admit"])
            .reset_index(drop=True)
        )
        logger.info("After first-stay-per-patient: %d patients", len(cohort))

    if subject_limit is not None and subject_limit < len(cohort):
        cohort = cohort.head(subject_limit)

    cohort["SUBJECT_ID"] = cohort["patientunitstayid"]
    cohort["HADM_ID"] = cohort["patienthealthsystemstayid"]
    cohort["GENDER"] = cohort.get("gender")
    logger.info("Final eICU cohort: %d", len(cohort))
    return cohort


def validate_eicu_data(loader: EICULoader) -> Dict[str, int]:
    """Completeness statistics (reference src/io_eicu.py:371-413)."""
    patients = loader.load_patients()
    labs = loader.load_lab()
    dx = loader.load_diagnosis()
    rx = loader.load_medication()
    stats = {
        "n_patient_stays": len(patients),
        "n_unique_patients": int(patients["uniquepid"].nunique()),
        "missing_gender": int(patients["gender"].isna().sum()),
        "missing_age": int(patients["age"].isna().sum()),
        "n_lab_results": len(labs),
        "n_unique_lab_types": int(labs["labname"].nunique()),
        "missing_lab_values": int(labs["labresult"].isna().sum()),
        "n_diagnoses": len(dx),
        "n_unique_diagnosis_strings": int(dx["diagnosisstring"].nunique()),
        "n_medications": len(rx),
        "n_unique_drugs": int(rx["drugname"].nunique()),
    }
    for k, v in stats.items():
        logger.info("  %s: %s", k, f"{v:,}")
    return stats
