"""Native graphcore (C++) vs numpy fallback parity, and speed sanity."""

import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

from multi_modal_gnn_tpu import native
from multi_modal_gnn_tpu.graph.hetero import WINDOW, TILE_E, build_window_plan

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    """Build the shared library if the toolchain is available."""
    if not (NATIVE_DIR / "libgraphcore.so").exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("native toolchain unavailable")
    # force a (re)load attempt now that the lib exists
    native._load_attempted = False
    native._lib = None
    if not native.available():
        pytest.skip("libgraphcore.so failed to load")
    yield


def test_sort_matches_numpy(rng):
    e, num_dst = 100_000, 777
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    src = rng.integers(0, 5000, e).astype(np.int32)
    perm, counts, row_ptr = native.sort_edges_by_dst(dst, num_dst)
    # sorted and stable
    sorted_dst = dst[perm]
    assert np.all(np.diff(sorted_dst) >= 0)
    want_perm = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(perm, want_perm)
    np.testing.assert_array_equal(counts, np.bincount(dst, minlength=num_dst))
    np.testing.assert_array_equal(row_ptr[1:], np.cumsum(counts))
    assert row_ptr[0] == 0
    _ = src


def test_factorize_matches_pandas(rng):
    import pandas as pd

    ids = rng.integers(0, 500, 20_000).astype(np.int64) * 13 + 7
    codes, uniques = native.factorize(ids)
    want_codes, want_uniques = pd.factorize(ids, sort=False)
    np.testing.assert_array_equal(codes, want_codes)
    np.testing.assert_array_equal(uniques, want_uniques)


def test_factorize_string_fallback():
    codes, uniques = native.factorize(np.array(["b", "a", "b", "c"]))
    np.testing.assert_array_equal(codes, [0, 1, 0, 2])
    assert list(uniques) == ["b", "a", "c"]


def test_window_plan_matches_numpy(rng):
    e, num_dst = 20_000, 300
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    src = rng.integers(0, 1000, e).astype(np.int32)
    row_ptr = np.zeros(num_dst + 1, dtype=np.int32)
    row_ptr[1:] = np.cumsum(np.bincount(dst, minlength=num_dst))

    got = native.window_plan(src, dst, row_ptr, num_dst, WINDOW, TILE_E)
    assert got is not None
    g_src, g_local, g_map, g_windows = got

    w_src, w_local, w_map, w_windows = _numpy_plan(src, dst, num_dst)

    np.testing.assert_array_equal(g_src, w_src)
    np.testing.assert_array_equal(g_local, w_local)
    np.testing.assert_array_equal(g_map, w_map)
    assert g_windows == w_windows


def _numpy_plan(src, dst, num_dst):
    """Inline copy of the pure-numpy window plan for comparison."""
    num_windows = max((num_dst + WINDOW - 1) // WINDOW, 1)
    boundaries = np.searchsorted(dst, np.arange(num_windows + 1) * WINDOW)
    src_parts, local_parts, tile_map = [], [], []
    for w in range(num_windows):
        lo, hi = int(boundaries[w]), int(boundaries[w + 1])
        n = hi - lo
        n_pad = max(TILE_E, ((n + TILE_E - 1) // TILE_E) * TILE_E)
        pad = n_pad - n
        src_parts.append(np.concatenate([src[lo:hi], np.zeros(pad, np.int32)]))
        local_parts.append(
            np.concatenate([dst[lo:hi] - w * WINDOW, np.full(pad, WINDOW, np.int32)]).astype(
                np.int32
            )
        )
        tile_map.extend([w] * (n_pad // TILE_E))
    return (
        np.concatenate(src_parts).astype(np.int32),
        np.concatenate(local_parts).astype(np.int32),
        np.asarray(tile_map, np.int32),
        num_windows,
    )


@pytest.mark.parametrize(
    "num_src,num_dst,e,block_rows",
    [
        (5_000, 300, 60_000, 256),   # dense: few tile splits
        (5_000, 300, 6_000, 256),    # sparse: heavy splitting
        (40, 300, 9_000, 64),        # tiny table: bases clamp to 0..pad-64
        (5_000, 1, 2_000, 256),      # single window
        (1_000, 2_000, 2_500, 128),  # many empty windows (padding tiles)
    ],
)
def test_span_plan_matches_numpy(rng, num_src, num_dst, e, block_rows):
    """The native span packer must be BIT-IDENTICAL to the numpy packer:
    plans are derived (not stored), so a machine with the library built must
    produce the same graph layout as one without."""
    from multi_modal_gnn_tpu.graph.hetero import _regroup_slots_by_lab_span_numpy

    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    win_src, win_local, win_tile_map, _ = build_window_plan(src, dst, num_dst)

    got = native.span_plan(
        win_local, win_tile_map, win_src, num_src, block_rows, WINDOW, TILE_E, 16
    )
    assert got is not None
    want = _regroup_slots_by_lab_span_numpy(
        win_local, win_tile_map, win_src, num_src, block_rows
    )
    assert got[1] == want[1]  # new_len
    np.testing.assert_array_equal(got[0], want[0])  # slot_moves
    np.testing.assert_array_equal(got[2], want[2])  # local2
    np.testing.assert_array_equal(got[3], want[3])  # tile_map2
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(want[4]))  # bases


def test_span_plan_native_faster_at_scale(rng):
    from multi_modal_gnn_tpu.graph.hetero import _regroup_slots_by_lab_span_numpy

    num_src, num_dst, e = 50_000, 512, 1_500_000
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    win_src, win_local, win_tile_map, _ = build_window_plan(src, dst, num_dst)
    t0 = time.perf_counter()
    native.span_plan(win_local, win_tile_map, win_src, num_src, 256, WINDOW, TILE_E, 16)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    _regroup_slots_by_lab_span_numpy(win_local, win_tile_map, win_src, num_src, 256)
    numpy_t = time.perf_counter() - t0
    assert native_t < numpy_t, (native_t, numpy_t)


def test_native_sort_faster_at_scale(rng):
    e = 3_000_000
    dst = rng.integers(0, 100_000, e).astype(np.int32)
    t0 = time.perf_counter()
    perm, _, _ = native.sort_edges_by_dst(dst, 100_000)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.argsort(dst, kind="stable")
    numpy_t = time.perf_counter() - t0
    # counting sort should comfortably beat comparison sort at this size
    assert native_t < numpy_t, (native_t, numpy_t)


class TestLabeventsScan:
    """Native one-pass LABEVENTS CSV scanner vs the pandas chunk path."""

    def _write_csv(self, path, gz=False):
        import gzip

        rows = [
            "ROW_ID,SUBJECT_ID,HADM_ID,ITEMID,CHARTTIME,VALUE,VALUENUM,VALUEUOM,FLAG",
            '1,10,100,50,2101-03-02 08:15:30,"7.4",7.4,pH,',
            '2,10,100,51,2101-03-02 09:00:00,"GREATER, THAN 50",,mg/dL,abnormal',
            "3,11,101,50,2101-03-03 10:30:00,5.5,5.5,pH,",
            "4,99,102,52,2101-03-04 11:00:00,3.3,3.3,,",
            "5,11,101,52,,2.2,2.2,,",
            "6,10,100,50,2101-03-05 01:02:03,8.1,8.1,pH,",
        ]
        data = ("\n".join(rows) + "\n").encode()
        if gz:
            with gzip.open(path, "wb") as f:
                f.write(data)
        else:
            path.write_bytes(data)

    @pytest.mark.parametrize("gz", [False, True])
    def test_matches_pandas_path(self, tmp_path, gz):
        if not native.available():
            pytest.skip("native library not built")
        import pandas as pd

        from multi_modal_gnn_tpu.data.mimic import MIMICLoader

        name = "LABEVENTS.csv.gz" if gz else "LABEVENTS.csv"
        self._write_csv(tmp_path / name, gz=gz)
        loader = MIMICLoader(data_dir=tmp_path)
        cohort = [10, 11]

        got = loader.load_labevents_for_cohort(cohort)
        # force the pandas fallback for comparison
        import unittest.mock as mock

        with mock.patch.object(loader, "_native_labevents_scan", return_value=None):
            want = loader.load_labevents_for_cohort(cohort, chunksize=2)

        assert len(got) == 4  # row 2 dropped (empty VALUENUM), row 4 (id 99)
        for col in ("SUBJECT_ID", "ITEMID"):
            np.testing.assert_array_equal(
                got[col].to_numpy(), want[col].to_numpy().astype(np.int64)
            )
        np.testing.assert_allclose(
            got["VALUENUM"].to_numpy(), want["VALUENUM"].to_numpy()
        )
        # CHARTTIME parsed to the same instants (NaT where missing)
        w = pd.to_datetime(want["CHARTTIME"])
        assert got["CHARTTIME"].isna().tolist() == w.isna().tolist()
        ok = ~w.isna()
        assert (got["CHARTTIME"][ok] == w[ok]).all()


class TestLabeventsQuotedFields:
    """All-quoted CSV exports (e.g. '"123","50","5.0"') must parse, not be
    silently dropped — the quote chars are stripped per field."""

    def test_fully_quoted_rows(self, tmp_path):
        if not native.available():
            pytest.skip("native library not built")
        from multi_modal_gnn_tpu.data.mimic import MIMICLoader

        rows = [
            '"ROW_ID","SUBJECT_ID","HADM_ID","ITEMID","CHARTTIME","VALUE","VALUENUM","VALUEUOM","FLAG"',
            '"1","10","100","50","2101-03-02 08:15:30","7.4","7.4","pH",""',
            '"2","11","101","51","2101-03-03 09:00:00","5.5","5.5","mg/dL",""',
            '"3","99","102","50","2101-03-04 10:00:00","3.3","3.3","",""',
        ]
        (tmp_path / "LABEVENTS.csv").write_text("\n".join(rows) + "\n")
        loader = MIMICLoader(data_dir=tmp_path)
        got = loader.load_labevents_for_cohort([10, 11])
        assert len(got) == 2
        np.testing.assert_array_equal(got["SUBJECT_ID"].to_numpy(), [10, 11])
        np.testing.assert_array_equal(got["ITEMID"].to_numpy(), [50, 51])
        np.testing.assert_allclose(got["VALUENUM"].to_numpy(), [7.4, 5.5])
        assert str(got["CHARTTIME"].iloc[0]).startswith("2101-03-02 08:15:30")
