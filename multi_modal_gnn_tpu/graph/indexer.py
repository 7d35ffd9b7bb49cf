"""Entity-ID <-> contiguous node index mapping.

Capability-parity with the reference ``NodeIndexer`` (src/graph_build.py:34-97)
including ID canonicalization (so ``1``, ``1.0`` and ``"1"`` map to the same
node), plus a vectorized bulk path built on pandas factorization instead of
per-row dictionary inserts.
"""

from __future__ import annotations

import math
from typing import Dict, Hashable, Iterable, List, Optional

import numpy as np
import pandas as pd

# Process-wide NaN singleton: all NaN ids canonicalize to THIS object, so
# dict lookups hit via identity (distinct float('nan') objects compare
# unequal and would otherwise mint a duplicate node per occurrence).
_NAN = float("nan")


def _canonical_int_values(arr: np.ndarray) -> Optional[np.ndarray]:
    """Array-wise ``canonical_id`` for the common case: every element
    canonicalizes to an int.  Returns int64 values, or None when the array
    holds non-integral floats / NaN / strings (element-wise fallback)."""
    if np.issubdtype(arr.dtype, np.integer):
        if arr.dtype.kind == "u" and arr.size and int(arr.max()) > np.iinfo(np.int64).max:
            return None  # would wrap under astype(int64); element-wise path
        return arr.astype(np.int64, copy=False)
    if np.issubdtype(arr.dtype, np.floating):
        with np.errstate(invalid="ignore"):
            as_int = arr.astype(np.int64)  # NaN/inf/overflow -> garbage,
            eq = as_int == arr  # caught by the round-trip comparison
        if bool(np.all(eq)):
            return as_int
    return None


def canonical_id(entity_id) -> Hashable:
    """Normalize an entity identifier: float-integers -> int, strip strings."""
    if isinstance(entity_id, (np.integer, int)):
        return int(entity_id)
    if isinstance(entity_id, (np.floating, float)):
        f = float(entity_id)
        if f != f:
            return _NAN
        return int(f) if f.is_integer() else f
    if isinstance(entity_id, str):
        s = entity_id.strip()
        # "123" and "123.0" style numeric strings normalize to ints;
        # "nan"/"inf" strings stay strings (a float-nan key is unfindable)
        try:
            f = float(s)
        except ValueError:
            return s
        if not math.isfinite(f):
            return s
        return int(f) if f.is_integer() else f
    return entity_id


class NodeIndexer:
    """Bidirectional entity-ID <-> dense-index map for one node type."""

    def __init__(self, node_type: str = "node"):
        self.node_type = node_type
        self.id_to_index: Dict[Hashable, int] = {}
        self.index_to_id: List[Hashable] = []
        # (len, pd.Index|None) — int64 hashtable over index_to_id for the
        # vectorized lookup path; rebuilt whenever the map has grown
        self._int_cache: Optional[tuple] = None

    def _int_table(self) -> Optional[pd.Index]:
        """Cached int64 pd.Index over the stored ids, or None if any stored
        id is not a Python int (canonical ids are int, float or str)."""
        n = len(self.index_to_id)
        if self._int_cache is not None and self._int_cache[0] == n:
            return self._int_cache[1]
        table = None
        if n and all(type(i) is int for i in self.index_to_id):
            try:
                table = pd.Index(np.asarray(self.index_to_id, dtype=np.int64))
            except OverflowError:
                table = None
        self._int_cache = (n, table)
        return table

    def __len__(self) -> int:
        return len(self.index_to_id)

    def __contains__(self, entity_id) -> bool:
        return canonical_id(entity_id) in self.id_to_index

    def add(self, entity_id) -> int:
        """Add one entity (idempotent); returns its dense index."""
        cid = canonical_id(entity_id)
        idx = self.id_to_index.get(cid)
        if idx is None:
            idx = len(self.index_to_id)
            self.id_to_index[cid] = idx
            self.index_to_id.append(cid)
        return idx

    def add_many(self, entity_ids: Iterable) -> np.ndarray:
        """Vectorized bulk add preserving first-seen order; returns indices."""
        arr = np.asarray(entity_ids) if not isinstance(entity_ids, np.ndarray) else entity_ids
        ints = _canonical_int_values(arr) if arr.dtype != object else None
        if ints is not None:
            # int (or integral-float) IDs canonicalize to ints array-wise —
            # native O(n) factorizer
            from multi_modal_gnn_tpu import native

            codes, uniques = native.factorize(ints)
            uniques = [int(u) for u in uniques]
        else:
            # factorize RAW values first, canonicalize only the uniques
            # (duplicate canonical ids across raw uniques — e.g. '1' and 1.0
            # — still collapse via the id_to_index consult below)
            codes, raw_uniques = pd.factorize(
                pd.Series(arr), sort=False, use_na_sentinel=False
            )
            uniques = [canonical_id(u) for u in raw_uniques]
        base = len(self.index_to_id)
        remap = np.empty(len(uniques), dtype=np.int64)
        for u_pos, uid in enumerate(uniques):
            existing = self.id_to_index.get(uid)
            if existing is None:
                existing = len(self.index_to_id)
                self.id_to_index[uid] = existing
                self.index_to_id.append(uid)
            remap[u_pos] = existing
        del base
        return remap[codes].astype(np.int32)

    def index_of(self, entity_id) -> int:
        return self.id_to_index[canonical_id(entity_id)]

    def get(self, entity_id, default: Optional[int] = None) -> Optional[int]:
        return self.id_to_index.get(canonical_id(entity_id), default)

    def lookup_many(self, entity_ids: Iterable) -> np.ndarray:
        """Vectorized lookup; unknown IDs map to -1."""
        if isinstance(entity_ids, np.ndarray) or hasattr(entity_ids, "__len__"):
            arr = np.asarray(entity_ids)
        else:  # bare iterator/generator
            arr = np.asarray(list(entity_ids))
        ints = _canonical_int_values(arr) if arr.dtype != object else None
        if ints is not None:
            table = self._int_table()
            if table is not None:
                return table.get_indexer(ints).astype(np.int32)
            if not self.index_to_id:
                return np.full(arr.shape[0], -1, dtype=np.int32)
        if arr.size > 64:  # factorize + canonicalize uniques only
            codes, raw_uniques = pd.factorize(
                pd.Series(arr.ravel()), sort=False, use_na_sentinel=False
            )
            u_idx = np.asarray(
                [self.id_to_index.get(canonical_id(u), -1) for u in raw_uniques],
                dtype=np.int32,
            )
            return u_idx[codes]
        return np.asarray(
            [self.id_to_index.get(canonical_id(e), -1) for e in arr],
            dtype=np.int32,
        )

    def id_of(self, index: int):
        return self.index_to_id[index]

    # -- (de)serialization -------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "node_type": self.node_type,
            "ids": [str(i) if not isinstance(i, (int, float)) else i for i in self.index_to_id],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NodeIndexer":
        idx = cls(node_type=d.get("node_type", "node"))
        for entity_id in d["ids"]:
            idx.add(entity_id)
        return idx
