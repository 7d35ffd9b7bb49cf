"""ctypes bindings for the native graph-assembly core (native/graphcore.cpp).

Loads ``native/libgraphcore.so`` when present (``make -C native``); every
entry point has a numpy fallback so the framework works without the build
step.  The native path swaps O(E log E) comparison sorts for O(E + N)
counting sorts and a linear-probing factorizer — the host-side graph build
is what feeds the TPU, so it must not become the bottleneck at the
5M-edge benchmark scale.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / "libgraphcore.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        logger.debug("native graphcore not built (%s missing); using numpy", _LIB_PATH)
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sort_edges_by_dst.restype = ctypes.c_int
        lib.sort_edges_by_dst.argtypes = [
            _i32p, ctypes.c_int64, ctypes.c_int32, _i32p, _i32p, _i32p,
        ]
        lib.factorize_i64.restype = ctypes.c_int64
        lib.factorize_i64.argtypes = [
            _i64p, ctypes.c_int64, _i32p, _i64p, ctypes.c_int64,
        ]
        lib.window_plan_sizes.restype = ctypes.c_int64
        lib.window_plan_sizes.argtypes = [
            _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.window_plan.restype = ctypes.c_int
        lib.window_plan.argtypes = [
            _i32p, _i32p, _i32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, _i32p, _i32p, _i32p,
        ]
        lib.span_plan_sizes.restype = ctypes.c_int64
        lib.span_plan_sizes.argtypes = [
            _i32p, _i32p, _i32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.span_plan.restype = ctypes.c_int
        lib.span_plan.argtypes = [
            _i32p, _i32p, _i32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, _i64p, _i32p, _i32p, _i32p,
        ]
        lib.labevents_scan.restype = ctypes.c_void_p
        lib.labevents_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, _i64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.labevents_fetch.restype = None
        lib.labevents_fetch.argtypes = [
            ctypes.c_void_p, _i32p, _i32p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"), _i64p,
        ]
        lib.labevents_free.restype = None
        lib.labevents_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        logger.info("Loaded native graphcore from %s", _LIB_PATH)
    except OSError as exc:  # pragma: no cover - load failure fallback
        logger.warning("Failed to load native graphcore (%s); using numpy", exc)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def sort_edges_by_dst(
    dst: np.ndarray, num_dst: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable counting sort by destination.

    Returns (perm, counts[num_dst], row_ptr[num_dst + 1]) with
    ``sorted = arr[perm]``.  Numpy fallback: stable argsort + bincount.
    """
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    e = len(dst)
    lib = _load()
    if lib is not None:
        perm = np.empty(e, dtype=np.int32)
        counts = np.empty(num_dst, dtype=np.int32)
        row_ptr = np.empty(num_dst + 1, dtype=np.int32)
        rc = lib.sort_edges_by_dst(dst, e, num_dst, perm, counts, row_ptr)
        if rc == 0:
            return perm, counts, row_ptr
        logger.warning("native sort_edges_by_dst failed rc=%d; numpy fallback", rc)
    perm = np.argsort(dst, kind="stable").astype(np.int32)
    counts = np.bincount(dst, minlength=num_dst).astype(np.int32) if e else np.zeros(
        num_dst, np.int32
    )
    row_ptr = np.zeros(num_dst + 1, dtype=np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    return perm, counts, row_ptr


def factorize(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dense first-seen-order codes for int64 IDs.

    Returns (codes[n] int32, uniques int64).  Non-integer inputs always use
    the pandas fallback.
    """
    arr = np.asarray(ids)
    lib = _load()
    if lib is not None and np.issubdtype(arr.dtype, np.integer):
        arr64 = np.ascontiguousarray(arr, dtype=np.int64)
        n = len(arr64)
        codes = np.empty(n, dtype=np.int32)
        uniques = np.empty(max(n, 1), dtype=np.int64)
        n_unique = lib.factorize_i64(arr64, n, codes, uniques, max(n, 1))
        if n_unique >= 0:
            return codes, uniques[:n_unique].copy()
        logger.warning("native factorize failed; pandas fallback")
    import pandas as pd

    codes, uniques = pd.factorize(arr, sort=False)
    return codes.astype(np.int32), np.asarray(uniques)


def window_plan(
    src_sorted: np.ndarray,
    dst_sorted: np.ndarray,
    row_ptr: np.ndarray,
    num_dst: int,
    window: int,
    tile_e: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """Native windowed layout (graph/hetero.py contract); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src_sorted = np.ascontiguousarray(src_sorted, dtype=np.int32)
    dst_sorted = np.ascontiguousarray(dst_sorted, dtype=np.int32)
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int32)
    total = lib.window_plan_sizes(row_ptr, num_dst, window, tile_e)
    win_src = np.empty(total, dtype=np.int32)
    win_local = np.empty(total, dtype=np.int32)
    tile_map = np.empty(total // tile_e, dtype=np.int32)
    n_tiles = lib.window_plan(
        src_sorted, dst_sorted, row_ptr, len(src_sorted), num_dst, window, tile_e,
        win_src, win_local, tile_map,
    )
    if n_tiles < 0:
        return None
    num_windows = max((num_dst + window - 1) // window, 1)
    return win_src, win_local, tile_map[:n_tiles], num_windows


def span_plan(
    win_local: np.ndarray,
    win_tile_map: np.ndarray,
    row_idx: np.ndarray,
    num_rows: int,
    block_rows: int,
    window: int,
    tile_e: int,
    align: int,
) -> Optional[Tuple[np.ndarray, int, np.ndarray, np.ndarray, np.ndarray]]:
    """Native span-bounded tile packer (graph/hetero.py
    regroup_slots_by_lab_span contract, bit-identical by test_native.py).
    Returns (slot_moves, new_len, local2, tile_map2, base) or None when the
    library is unavailable — callers fall back to the numpy packer."""
    lib = _load()
    if lib is None:
        return None
    win_local = np.ascontiguousarray(win_local, dtype=np.int32)
    win_tile_map = np.ascontiguousarray(win_tile_map, dtype=np.int32)
    row_idx = np.ascontiguousarray(row_idx, dtype=np.int32)
    e_win = len(win_local)
    e_span = lib.span_plan_sizes(
        win_local, win_tile_map, row_idx, e_win, num_rows,
        block_rows, window, tile_e, align,
    )
    if e_span < 0:
        logger.warning("native span_plan_sizes failed rc=%d; numpy fallback", e_span)
        return None
    slot_moves = np.empty(e_win, dtype=np.int64)
    local2 = np.empty(e_span, dtype=np.int32)
    tile_map2 = np.empty(e_span // tile_e, dtype=np.int32)
    base = np.empty(e_span // tile_e, dtype=np.int32)
    rc = lib.span_plan(
        win_local, win_tile_map, row_idx, e_win, num_rows,
        block_rows, window, tile_e, align,
        e_span, slot_moves, local2, tile_map2, base,
    )
    if rc != 0:
        logger.warning("native span_plan failed rc=%d; numpy fallback", rc)
        return None
    return slot_moves, int(e_span), local2, tile_map2, base


def labevents_scan(path, col_subj: int, col_item: int, col_val: int,
                   col_time: int, ids) -> Optional[tuple]:
    """Single-pass native scan of a LABEVENTS CSV(.gz): rows with numeric
    VALUENUM and SUBJECT_ID in ``ids`` (empty = all).  Returns
    (subject int32, item int32, value float64, charttime_epoch_s int64 with
    -1 = missing), or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(np.sort(np.asarray(ids, dtype=np.int64)))
    n_out = ctypes.c_int64()
    handle = lib.labevents_scan(
        str(path).encode(), col_subj, col_item, col_val, col_time,
        ids, len(ids), ctypes.byref(n_out),
    )
    n = n_out.value
    if handle is None or n < 0:
        if handle is not None:
            lib.labevents_free(handle)
        return None
    try:
        subj = np.empty(n, dtype=np.int32)
        item = np.empty(n, dtype=np.int32)
        val = np.empty(n, dtype=np.float64)
        time = np.empty(n, dtype=np.int64)
        if n:
            lib.labevents_fetch(handle, subj, item, val, time)
    finally:
        lib.labevents_free(handle)
    return subj, item, val, time
