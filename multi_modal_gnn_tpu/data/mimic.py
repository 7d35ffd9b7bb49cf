"""MIMIC-III adapter.

Functional parity with the reference MIMIC-III loader (src/io_mimic.py):
CSV (or PostgreSQL via sqlalchemy, gated) table loaders with uppercase column
normalization, cohort selection with DOB-based age (>89 obfuscation remapped
to 91.4, src/io_mimic.py:378-390), and top-K lab filtering for the cohort
(src/io_mimic.py:442-516).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


class MIMICLoader:
    """Loads MIMIC-III tables from CSV files or a PostgreSQL database."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        source: str = "csv",
        db_connection: Optional[str] = None,
    ):
        self.data_dir = Path(data_dir)
        self.source = source
        self.db_connection = db_connection
        if source == "csv" and not self.data_dir.exists():
            raise FileNotFoundError(f"Data directory not found: {self.data_dir}")
        if source == "postgres" and db_connection is None:
            raise ValueError("db_connection required for postgres source")

    def _load_csv(self, table_name: str) -> pd.DataFrame:
        for candidate in (table_name, table_name.lower(), table_name.upper()):
            for suffix in (".csv", ".csv.gz"):
                path = self.data_dir / f"{candidate}{suffix}"
                if path.exists():
                    df = pd.read_csv(path, low_memory=False)
                    df.columns = df.columns.str.upper()
                    logger.info("Loaded %s: %d rows", table_name, len(df))
                    return df
        raise FileNotFoundError(f"CSV file not found for table: {table_name}")

    def _db_engine(self):
        """Resolve ``db_connection`` to something ``pd.read_sql`` accepts.

        A string is a sqlalchemy URL (the reference's configuration surface,
        src/io_mimic.py:97-117 — sqlalchemy stays an optional extra); any
        non-string is used directly, so an open DBAPI connection (e.g. a
        sqlite3 database laid out with a ``mimiciii`` schema — see
        tests/test_data.py's fixture) exercises the identical query path
        without the postgres server."""
        if isinstance(self.db_connection, str):
            import sqlalchemy  # optional dependency, gated

            return sqlalchemy.create_engine(self.db_connection)
        return self.db_connection

    def _load_postgres(self, table_name: str) -> pd.DataFrame:
        df = pd.read_sql(
            f"SELECT * FROM mimiciii.{table_name.lower()}", self._db_engine()
        )
        df.columns = df.columns.str.upper()
        logger.info("Loaded %s from postgres: %d rows", table_name, len(df))
        return df

    def load_table(self, table_name: str) -> pd.DataFrame:
        if self.source == "csv":
            return self._load_csv(table_name)
        return self._load_postgres(table_name)

    def load_patients(self) -> pd.DataFrame:
        return self.load_table("PATIENTS")

    def load_admissions(self) -> pd.DataFrame:
        return self.load_table("ADMISSIONS")

    def load_icustays(self) -> pd.DataFrame:
        return self.load_table("ICUSTAYS")

    def load_labevents(self, chunksize: Optional[int] = None):
        """Whole-table load, or a chunk iterator when ``chunksize`` is set
        (the reference streams the 27M-row LABEVENTS this way,
        src/io_mimic.py:205-250)."""
        if chunksize:
            if self.source == "csv":
                for candidate in ("LABEVENTS", "labevents"):
                    for suffix in (".csv", ".csv.gz"):
                        path = self.data_dir / f"{candidate}{suffix}"
                        if path.exists():
                            return pd.read_csv(path, chunksize=chunksize, low_memory=False)
                raise FileNotFoundError("LABEVENTS.csv(.gz) not found")
            return pd.read_sql(
                "SELECT * FROM mimiciii.labevents", self._db_engine(),
                chunksize=chunksize,
            )
        df = self.load_table("LABEVENTS")
        if "CHARTTIME" in df.columns:
            df["CHARTTIME"] = pd.to_datetime(df["CHARTTIME"], errors="coerce")
        return df

    def load_labevents_for_cohort(
        self, cohort_subject_ids, chunksize: int = 1_000_000
    ) -> pd.DataFrame:
        """Stream LABEVENTS in chunks, keeping only numeric events of cohort
        patients — bounds peak memory to one chunk instead of the whole 27M-row
        table (reference's chunked path, src/io_mimic.py:205-250).

        With the native library built (``make -C native``) and a CSV source,
        the whole scan runs in C++ (zlib-streamed, quote-aware, cohort- and
        notna-filtered in one pass) and only the kept rows ever materialize.
        """
        ids = set(int(s) for s in cohort_subject_ids)
        if not ids:
            # the native scanner treats an empty id set as "keep all rows"
            # (useful for unfiltered scans); for a cohort filter an empty
            # cohort must keep nothing, on both the native and pandas paths
            return pd.DataFrame(columns=["SUBJECT_ID", "ITEMID", "VALUENUM"])
        native_df = self._native_labevents_scan(ids) if self.source == "csv" else None
        if native_df is not None:
            return native_df
        kept = []
        total = 0
        for chunk in self.load_labevents(chunksize=chunksize):
            chunk.columns = chunk.columns.str.upper()
            total += len(chunk)
            sel = chunk[chunk["SUBJECT_ID"].isin(ids) & chunk["VALUENUM"].notna()]
            if len(sel):
                kept.append(sel)
        out = (
            pd.concat(kept, ignore_index=True)
            if kept
            else pd.DataFrame(columns=["SUBJECT_ID", "ITEMID", "VALUENUM"])
        )
        logger.info(
            "Chunked LABEVENTS ingest: kept %d/%d rows for %d cohort patients",
            len(out), total, len(ids),
        )
        return out

    def _native_labevents_scan(self, ids) -> Optional[pd.DataFrame]:
        """C++ one-pass LABEVENTS scan (native/graphcore.cpp labevents_scan);
        None when the library or the file is unavailable (pandas fallback)."""
        from multi_modal_gnn_tpu import native

        if not native.available():
            return None
        path = None
        for candidate in ("LABEVENTS", "labevents"):
            for suffix in (".csv", ".csv.gz"):
                p = self.data_dir / f"{candidate}{suffix}"
                if p.exists():
                    path = p
                    break
            if path:
                break
        if path is None:
            return None
        import gzip

        opener = gzip.open if path.suffix == ".gz" else open
        with opener(path, "rt") as f:
            header = [c.strip().strip('"').upper() for c in f.readline().strip().split(",")]
        try:
            cols = {c: header.index(c) for c in ("SUBJECT_ID", "ITEMID", "VALUENUM")}
        except ValueError:
            return None  # unexpected schema; let pandas handle it
        col_time = header.index("CHARTTIME") if "CHARTTIME" in header else -1
        res = native.labevents_scan(
            path, cols["SUBJECT_ID"], cols["ITEMID"], cols["VALUENUM"],
            col_time, np.fromiter(ids, dtype=np.int64, count=len(ids)),
        )
        if res is None:
            return None
        subj, item, val, time_s = res
        # int64 ids: match the pandas chunk path's dtypes exactly (callers
        # merge on these columns; mixed int32/int64 keys silently upcast)
        out = pd.DataFrame(
            {
                "SUBJECT_ID": subj.astype(np.int64),
                "ITEMID": item.astype(np.int64),
                "VALUENUM": val,
            }
        )
        if col_time >= 0:
            out["CHARTTIME"] = pd.to_datetime(
                np.where(time_s >= 0, time_s, 0), unit="s"
            )
            out.loc[time_s < 0, "CHARTTIME"] = pd.NaT
        logger.info(
            "Native LABEVENTS scan: kept %d rows for %d cohort patients (%s)",
            len(out), len(ids), path.name,
        )
        return out

    def load_d_labitems(self) -> pd.DataFrame:
        return self.load_table("D_LABITEMS")

    def load_diagnoses_icd(self) -> pd.DataFrame:
        return self.load_table("DIAGNOSES_ICD")

    def load_prescriptions(self) -> pd.DataFrame:
        return self.load_table("PRESCRIPTIONS")


def select_cohort(
    patients: pd.DataFrame,
    admissions: pd.DataFrame,
    icustays: pd.DataFrame,
    age_min: int = 18,
    age_max: Optional[int] = None,
    use_first_icu_only: bool = True,
    subject_limit: Optional[int] = None,
    min_los_hours: Optional[float] = None,
    exclude_deaths: bool = False,
    **_unused,
) -> pd.DataFrame:
    """MIMIC-III cohort selection (reference src/io_mimic.py:315-440)."""
    cohort = icustays.merge(
        admissions[["SUBJECT_ID", "HADM_ID", "ADMITTIME", "ETHNICITY", "HOSPITAL_EXPIRE_FLAG"]],
        on=["SUBJECT_ID", "HADM_ID"],
        how="inner",
    ).merge(patients[["SUBJECT_ID", "GENDER", "DOB"]], on="SUBJECT_ID", how="inner")
    logger.info("After merge: %d ICU stays", len(cohort))

    admit = pd.to_datetime(cohort["ADMITTIME"], errors="coerce")
    dob = pd.to_datetime(cohort["DOB"], errors="coerce")
    # year arithmetic avoids datetime overflow on obfuscated DOBs
    age = admit.dt.year - dob.dt.year
    not_yet = (admit.dt.month < dob.dt.month) | (
        (admit.dt.month == dob.dt.month) & (admit.dt.day < dob.dt.day)
    )
    age = age - not_yet.astype(int)
    # >89 is date-obfuscated in MIMIC; remap to the conventional 91.4 median
    cohort["AGE"] = age.astype(float).mask(age > 89, 91.4)

    cohort = cohort[cohort["AGE"] >= age_min]
    if age_max is not None:
        cohort = cohort[cohort["AGE"] <= age_max]
    logger.info("After age filter: %d", len(cohort))

    if min_los_hours is not None:
        cohort = cohort[cohort["LOS"] >= min_los_hours / 24.0]
        logger.info("After LOS filter: %d", len(cohort))

    if exclude_deaths:
        cohort = cohort[cohort["HOSPITAL_EXPIRE_FLAG"] == 0]
        logger.info("After excluding deaths: %d", len(cohort))

    if use_first_icu_only:
        # whole-row dedup (not groupby().first(), which mixes fields across
        # stays when the earliest stay has nulls in some columns)
        cohort = cohort.sort_values(["SUBJECT_ID", "INTIME"])
        cohort = cohort.drop_duplicates("SUBJECT_ID", keep="first").reset_index(drop=True)
        logger.info("After first ICU stay only: %d", len(cohort))

    if subject_limit is not None:
        cohort = cohort.head(subject_limit)

    cols = [
        c
        for c in ("SUBJECT_ID", "HADM_ID", "ICUSTAY_ID", "AGE", "GENDER", "ETHNICITY",
                  "INTIME", "OUTTIME", "LOS")
        if c in cohort.columns
    ]
    cohort = cohort[cols]
    logger.info("Final MIMIC cohort: %d", len(cohort))
    return cohort


def filter_labs_for_cohort(
    labevents: pd.DataFrame,
    cohort: pd.DataFrame,
    d_labitems: pd.DataFrame,
    top_k: Optional[int] = None,
    min_patient_count: int = 10,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Keep numeric labs of cohort patients for the top-K most widely
    ordered tests (reference src/io_mimic.py:442-516)."""
    ids = set(cohort["SUBJECT_ID"])
    labs = labevents[labevents["SUBJECT_ID"].isin(ids)].copy()
    labs = labs[labs["VALUENUM"].notna()]
    logger.info("Numeric cohort labs: %d events", len(labs))

    counts = (
        labs.groupby("ITEMID")
        .agg(NUM_PATIENTS=("SUBJECT_ID", "nunique"), NUM_MEASUREMENTS=("VALUENUM", "count"))
    )
    counts = counts[counts["NUM_PATIENTS"] >= min_patient_count]
    if top_k is not None:
        counts = counts.nlargest(top_k, "NUM_PATIENTS")
    logger.info("Selected %d lab tests", len(counts))

    selected = set(counts.index)
    labs = labs[labs["ITEMID"].isin(selected)]
    labitems = d_labitems[d_labitems["ITEMID"].isin(selected)].copy()
    labitems = labitems.merge(counts, left_on="ITEMID", right_index=True)
    return labs, labitems
