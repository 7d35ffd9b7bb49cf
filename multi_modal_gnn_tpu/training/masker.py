"""Edge-level train/val/test splits and mask-and-recover supervision.

Reproduces the reference ``EdgeMasker`` semantics (src/train.py:37-177):

  * the patient->lab edge list is permuted once with a seeded RNG and cut
    into train/val/test by fraction (70/15/15);
  * message passing always sees the *full* graph — the split only selects
    which edges receive supervision/evaluation (src/train.py:131-176: the
    model's forward uses ``data.edge_index_dict`` unchanged);
  * each training epoch supervises a fresh Bernoulli(mask_fraction) subset
    of the train edges.

Differences (deliberate, TPU-first):
  * the per-epoch supervision mask is keyed by (seed, epoch) through
    ``jax.random`` instead of the reference's wall-clock ``time.time()``
    re-seed (src/train.py:156), making training bit-reproducible;
  * split batches are padded to a static shape with a validity mask so the
    jitted train step never recompiles;
  * the reference's torch RNG permutation cannot be replayed bit-exactly in
    JAX — split membership differs by RNG, statistical parity is the target
    (SURVEY.md section 7.3).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multi_modal_gnn_tpu.graph.hetero import SPAN_BASE_ALIGN, HeteroGraph


# below this many train rows the slot-major layout's window padding costs
# more than the backward gather it eliminates (measured on v5e: eICU's 38k
# rows regress, 3.5M rows win 1.5x)
SLOT_MAJOR_MIN_ROWS = 262_144


def auto_lab_tile_rows(num_labs: Optional[int]) -> int:
    """Default narrow-lab-tile setting for a given lab vocabulary size.

    256-row span tiles are a measured net win on v5e once the padded lab
    table reaches 512 rows: scale config (500 labs -> pad 512) 70.5M ->
    75.3M edges/s, MIMIC-shaped (720 labs -> pad 768) 91.6M -> 105.3M
    (PERFORMANCE.md "span-bounded lab tiles").  128-row tiles LOSE on both
    (slot inflation outweighs the extra narrowing), and below 512 padded
    rows there is nothing to narrow — so: 256 when the padded table has
    >= 512 rows, else off.  Only consulted where the caller left the knob
    unset; explicit values (including 0 = off) always win.
    """
    if not num_labs:
        return 0
    labs_pad = ((int(num_labs) + 127) // 128) * 128
    return 256 if labs_pad >= 512 else 0


class SplitBatch(struct.PyTreeNode):
    """A padded, static-shape batch of supervised patient-lab edges.

    ``patient_plan`` / ``lab_plan`` (optional) are windowed layouts that let
    the backward of the batch's embedding gathers run on the MXU segment
    kernel instead of an XLA scatter (ops/pallas_segment.take_with_plan) —
    at the 5M-edge scale those scatters dominate the gradient wall time.
    """

    patient_idx: jax.Array  # int32 [B_pad]
    lab_idx: jax.Array  # int32 [B_pad]
    values: jax.Array  # float32 [B_pad] normalized lab values (targets)
    valid: jax.Array  # float32 [B_pad] 1.0 = real edge, 0.0 = padding
    patient_plan: Optional[object] = None  # GatherPlan
    lab_plan: Optional[object] = None  # GatherPlan
    # per-slot precomputes (Trainer._augment_batch): the degree-gate and
    # lab-weight gathers are loop-invariant across epochs, but as in-step
    # gathers they cost ~73 ms per scan dispatch at the 3.96M-row scale
    # (random row gathers are latency-bound — PERFORMANCE.md device trace).
    # Hoisting them to batch-build time removes them from the step entirely.
    degrees: Optional[jax.Array] = None  # int32 [B_pad] patient lab-degree
    sample_weights: Optional[jax.Array] = None  # f32 [B_pad] lab inv-var weight
    # value-context knockout positions for THIS batch's rows: position of each
    # row inside the edge array the step's graph carries (cluster-local for
    # mini-batch training).  None -> the trainer's global train_positions().
    vis_positions: Optional[jax.Array] = None  # int32 [B_pad]
    num_valid: int = struct.field(pytree_node=False, default=0)


def _pad_batch(
    p: np.ndarray,
    l: np.ndarray,
    v: np.ndarray,
    pad_multiple: int,
    num_patients: Optional[int] = None,
    num_labs: Optional[int] = None,
    slot_major: bool = False,
    lab_block_rows: int = 0,
    lab_tile_mode: str = "block",
) -> Tuple[SplitBatch, Optional[np.ndarray]]:
    """Pad (and optionally slot-reorder) a supervised batch.

    ``slot_major``: lay the batch out in the PATIENT gather plan's window-slot
    order.  The batch grows to E_win rows (window runs padded to the kernel
    tile), but the patient-side backward — a ~45 ms random gather of B x 64
    pair cotangents at the 3.5M-pair scale (PERFORMANCE.md device trace) —
    disappears entirely: the cotangent is already slot-ordered, so it feeds
    the windowed segment kernel directly (GatherPlan.identity).  The lab side
    falls back to XLA's scatter (num_labs is small — the scatter into
    [500, 64] is cheaper than a second 4M-row reorder gather).

    Returns (batch, row_slots) where ``row_slots[i]`` is the slot holding
    original row ``i`` (None unless slot_major) — callers use it to read
    per-edge predictions back in split order.
    """
    n = len(p)
    n_pad = max(pad_multiple, ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)
    pad = n_pad - n
    p_pad = np.concatenate([p, np.zeros(pad, np.int32)])
    l_pad = np.concatenate([l, np.zeros(pad, np.int32)])
    v_pad = np.concatenate([v, np.zeros(pad, np.float32)])
    valid_pad = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    patient_plan = lab_plan = None
    row_slots = None
    if num_patients is not None and num_labs is not None:
        from multi_modal_gnn_tpu.graph.hetero import (
            WINDOW,
            GatherPlan,
            build_gather_plan,
        )

        # padding rows point at row 0; their cotangents are exactly zero
        # (masked loss), so including them in the plan is harmless
        patient_plan = build_gather_plan(p_pad, num_patients)
        if slot_major:
            win_src = np.asarray(patient_plan.win_src)
            win_local = np.asarray(patient_plan.win_local)
            real_slot = win_local < WINDOW
            p_pad = np.where(real_slot, p_pad[win_src], 0).astype(np.int32)
            l_pad = np.where(real_slot, l_pad[win_src], 0).astype(np.int32)
            v_pad = np.where(real_slot, v_pad[win_src], 0.0).astype(np.float32)
            valid_pad = np.where(real_slot, valid_pad[win_src], 0.0).astype(np.float32)
            row_slots = np.zeros(n_pad, dtype=np.int32)
            row_slots[win_src[real_slot]] = np.nonzero(real_slot)[0]
            if lab_block_rows:
                # span-bounded lab tiles: regroup each window's slots by lab
                # block so the pair-head kernel gathers from ONE narrow block
                # of the lab table per tile (graph/hetero.py regroup doc).
                # mode "span": arbitrary 16-aligned per-tile bases (near-zero
                # slot inflation); mode "block": aligned lbr-row blocks.
                from multi_modal_gnn_tpu.graph.hetero import (
                    regroup_slots_by_lab_block,
                    regroup_slots_by_lab_span,
                )

                wl = np.asarray(patient_plan.win_local)
                wtm = np.asarray(patient_plan.win_tile_map)
                span = lab_tile_mode == "span"
                regroup = (
                    regroup_slots_by_lab_span if span else regroup_slots_by_lab_block
                )
                moves, e2, local2, tmap2, lbm = regroup(
                    wl, wtm, l_pad, num_labs, lab_block_rows
                )

                def _relay(a, fill, dtype):
                    out = np.full(e2, fill, dtype=dtype)
                    m = moves >= 0
                    out[moves[m]] = a[m]
                    return out

                p_pad = _relay(p_pad, 0, np.int32)
                l_pad = _relay(l_pad, 0, np.int32)
                v_pad = _relay(v_pad, 0.0, np.float32)
                valid_pad = _relay(valid_pad, 0.0, np.float32)
                row_slots = moves[row_slots].astype(np.int32)
                patient_plan = GatherPlan(
                    win_src=jnp.zeros(e2, jnp.int32),  # unused under identity
                    win_local=jnp.asarray(local2),
                    win_tile_map=jnp.asarray(tmap2),
                    num_windows=patient_plan.num_windows,
                    num_rows=patient_plan.num_rows,
                    identity=True,
                    lab_block_map=jnp.asarray(lbm),
                    lab_block_rows=int(lab_block_rows),
                    lab_span_mode=span,
                )
            else:
                patient_plan = GatherPlan(
                    win_src=patient_plan.win_src,  # unused under identity
                    win_local=patient_plan.win_local,
                    win_tile_map=patient_plan.win_tile_map,
                    num_windows=patient_plan.num_windows,
                    num_rows=patient_plan.num_rows,
                    identity=True,
                )
            # lab_plan stays None -> plain take, XLA scatter backward
        else:
            lab_plan = build_gather_plan(l_pad, num_labs)
    return SplitBatch(
        patient_idx=jnp.asarray(p_pad),
        lab_idx=jnp.asarray(l_pad),
        values=jnp.asarray(v_pad),
        valid=jnp.asarray(valid_pad),
        patient_plan=patient_plan,
        lab_plan=lab_plan,
        num_valid=n,
    ), row_slots


class EdgeMasker:
    """Seeded edge-level splits over the patient->lab relation."""

    def __init__(
        self,
        graph: HeteroGraph,
        train_split: float = 0.7,
        val_split: float = 0.15,
        test_split: float = 0.15,
        mask_fraction: float = 0.2,
        seed: int = 42,
        pad_multiple: int = 256,
        host_edges: Optional[tuple] = None,
        slot_major_train: bool = False,
        slot_major_min_rows: int = SLOT_MAJOR_MIN_ROWS,
        lab_block_rows: int = 0,
        lab_tile_mode: str = "block",
        calibration_split: float = 0.0,
    ):
        """``host_edges``: optional (src, dst, val) numpy arrays of the valid
        patient->lab edges in device order (GraphBundle.patient_lab_host()) —
        avoids a device->host readback, which is expensive on remote TPUs.

        ``slot_major_train``: lay the TRAIN batch out in patient-window slot
        order (see ``_pad_batch``) — eliminates the dominant backward gather
        at large batch sizes under the Pallas head path.  Only engages for
        train batches of at least ``SLOT_MAJOR_MIN_ROWS`` rows: the layout
        adds window-padding slots (~10-30%), a net loss on small
        dispatch-bound batches (eICU-sized bench regressed 14.5M -> 11.0M
        edges/s with it forced on) and a 1.5x win at 3.5M rows.  Eval
        batches stay row-major (no backward).  Note the per-epoch
        supervision draw is shaped by the slot layout, so losses differ in
        RNG realization (not distribution) from row-major maskers."""
        total = train_split + val_split + test_split
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"Splits must sum to 1.0, got {total}")
        self.mask_fraction = float(mask_fraction)
        self.seed = int(seed)
        self.pad_multiple = int(pad_multiple)
        self.slot_major_train = bool(slot_major_train)
        self.slot_major_min_rows = int(slot_major_min_rows)
        # span-bounded lab tiles for the slot-major layout (0 = off): every
        # kernel tile's labs address one lab_block_rows-row table block.
        # lab_tile_mode "span" (vs "block"): arbitrary 16-aligned per-tile
        # table bases — same FLOP cut with (almost) no slot inflation
        # (graph/hetero.py regroup_slots_by_lab_span).  Hardware-measured
        # (v5e, round 2): span@256 WINS at >=512 padded labs (scale 70.5M ->
        # 75.3M edges/s, MIMIC-shaped 91.6M -> 105.3M); 128-row tiles lose
        # on both (inflation > narrowing), and the original aligned-BLOCK
        # mode loses everywhere (PERFORMANCE.md).  auto_lab_tile_rows()
        # encodes the measured rule; train_pipeline/bench consult it when
        # the knob is unset.
        self.lab_block_rows = int(lab_block_rows)
        if lab_tile_mode not in ("block", "span"):
            raise ValueError(f"lab_tile_mode must be 'block' or 'span', got {lab_tile_mode!r}")
        if lab_tile_mode == "span" and self.lab_block_rows % SPAN_BASE_ALIGN:
            raise ValueError(
                f"span-mode lab_block_rows must be a multiple of "
                f"{SPAN_BASE_ALIGN}, got {self.lab_block_rows}"
            )
        self.lab_tile_mode = lab_tile_mode
        self._row_slots: Dict[str, Optional[np.ndarray]] = {}
        counts = graph.node_count_map if graph is not None else {}
        self._num_patients = counts.get("patient")
        self._num_labs = counts.get("lab")

        if host_edges is not None:
            src, dst, val = host_edges
            if val is None:
                raise ValueError("patient->lab edges carry no values to supervise")
            self._p = np.asarray(src, dtype=np.int32)
            self._l = np.asarray(dst, dtype=np.int32)
            self._v = np.asarray(val, dtype=np.float32)
        else:
            es = graph.patient_lab
            if es.val is None:
                raise ValueError("patient->lab edges carry no values to supervise")
            mask = np.asarray(es.mask) > 0
            self._p = np.asarray(es.src)[mask].astype(np.int32)
            self._l = np.asarray(es.dst)[mask].astype(np.int32)
            self._v = np.asarray(es.val)[mask].astype(np.float32)
        self.num_edges = int(len(self._p))

        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(self.num_edges)
        n_train = int(train_split * self.num_edges)
        n_val = int(val_split * self.num_edges)
        self._split_indices: Dict[str, np.ndarray] = {
            "train": np.sort(perm[:n_train]),
            "val": np.sort(perm[n_train : n_train + n_val]),
            "test": np.sort(perm[n_train + n_val :]),
        }
        # strict conformal calibration split: carve ``calibration_split`` of
        # the VAL edges into a dedicated "cal" split BEFORE training, so the
        # conformal guarantee no longer leans on the split that steers early
        # stopping / LR plateaus (evaluation.conformal_split_fraction;
        # conformal.calibrate_from_trainer prefers it when present).  Drawn
        # from the same rng stream AFTER the permutation, so train/test
        # membership is bit-identical to calibration_split=0.
        self.calibration_split = float(calibration_split)
        if not 0.0 <= self.calibration_split < 1.0:
            raise ValueError(
                f"calibration_split must be in [0, 1), got {calibration_split}"
            )
        if self.calibration_split > 0:
            val_idx = self._split_indices["val"]
            n_cal = int(round(self.calibration_split * len(val_idx)))
            pick = rng.permutation(len(val_idx))[:n_cal]
            cal_mask = np.zeros(len(val_idx), dtype=bool)
            cal_mask[pick] = True
            self._split_indices["cal"] = val_idx[cal_mask]
            self._split_indices["val"] = val_idx[~cal_mask]
        self._batches: Dict[str, SplitBatch] = {}

    def split_sizes(self) -> Dict[str, int]:
        return {k: len(v) for k, v in self._split_indices.items()}

    @property
    def has_calibration_split(self) -> bool:
        return "cal" in self._split_indices

    def split_indices(self, split: str) -> np.ndarray:
        """Positions (into the valid patient-lab edge list) of this split."""
        return self._split_indices[split]

    def get_split(self, split: str) -> SplitBatch:
        """Padded device batch for a split (cached)."""
        if split not in self._batches:
            idx = self._split_indices[split]
            self._batches[split], self._row_slots[split] = _pad_batch(
                self._p[idx], self._l[idx], self._v[idx], self.pad_multiple,
                num_patients=self._num_patients, num_labs=self._num_labs,
                slot_major=(
                    self.slot_major_train
                    and split == "train"
                    and len(idx) >= self.slot_major_min_rows
                ),
                lab_block_rows=self.lab_block_rows,
                lab_tile_mode=self.lab_tile_mode,
            )
        return self._batches[split]

    def slot_map(self, split: str) -> Optional[np.ndarray]:
        """int32[B_pad] slot holding each original row (None for row-major
        batches) — invert slot-major predictions back to split order."""
        self.get_split(split)
        return self._row_slots.get(split)

    def split_arrays(self, split: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host (patient_idx, lab_idx, values) without padding — for metrics."""
        idx = self._split_indices[split]
        return self._p[idx], self._l[idx], self._v[idx]

    def split_edge_positions(self, split: str) -> np.ndarray:
        """Global edge-array position (device order, 0..num_edges-1) of each
        of the split's rows — the key the mini-batch partitioner uses to map
        supervised rows onto cluster-local edge arrays (value context)."""
        return np.asarray(self._split_indices[split])

    def visibility_base(self, num_padded: int) -> np.ndarray:
        """float32[num_padded] value-visibility template over the padded
        patient->lab edge array: 1.0 at TRAIN edge positions, 0.0 for
        val/test/padding.  Valid edges occupy positions 0..num_edges-1 of the
        padded array in device order (graph/hetero.py pad_edge_set sorts the
        valid edges then appends padding), so split indices ARE padded-array
        positions.  Consumed by the trainer's value-context plumbing
        (EdgeSet.val_vis); at eval time this template is used as-is — the
        model conditions on every train observation and nothing else."""
        if num_padded < self.num_edges:
            raise ValueError(
                f"num_padded={num_padded} < {self.num_edges} valid edges"
            )
        base = np.zeros(num_padded, dtype=np.float32)
        base[self._split_indices["train"]] = 1.0
        return base

    def train_positions(self) -> np.ndarray:
        """int32[B_pad] padded-edge-array position of each train-batch row
        (padding rows point at 0 — their knockout multiplier is 1, a no-op;
        supervision there is always 0).  Lets the train step map the epoch's
        supervision draw (batch-shaped) onto the edge array:
        visible = base.at[pos].multiply(1 - sup).  Slot-major batches place
        each row's position at its slot."""
        batch = self.get_split("train")
        idx = self._split_indices["train"]
        out = np.zeros(batch.valid.shape[0], dtype=np.int32)
        slots = self._row_slots.get("train")
        if slots is None:
            out[: len(idx)] = idx
        else:
            out[slots[: len(idx)]] = idx
        return out

    def supervision_mask(self, key: jax.Array, batch: Optional[SplitBatch] = None) -> jax.Array:
        """Per-epoch Bernoulli supervision mask over the train batch (float)."""
        batch = batch if batch is not None else self.get_split("train")
        if self.mask_fraction <= 0:
            return batch.valid
        draw = jax.random.bernoulli(
            key, p=self.mask_fraction, shape=batch.valid.shape
        ).astype(jnp.float32)
        return draw * batch.valid


def resolve_lab_tile_rows(raw, num_labs, use_pallas: bool) -> int:
    """Config knob -> lab_block_rows: explicit values (incl. 0) win; unset
    (None or "auto") falls back to the hardware-measured default
    (:func:`auto_lab_tile_rows`), which only applies on the Pallas head path
    (the plans are kernel layouts)."""
    if raw is not None and str(raw) != "auto":
        return int(raw)
    if not use_pallas:
        return 0
    return auto_lab_tile_rows(num_labs)


def masker_from_config(config, bundle) -> "EdgeMasker":
    """THE config->masker factory — the single place the split partition is
    derived from a :class:`~multi_modal_gnn_tpu.config.Config`.

    Every entry point that must agree on split membership (train_pipeline,
    evaluation_pipeline, run_pipeline._load_trainer, run_full_audit) builds
    its masker here, so a strict-conformal config (``evaluation.extras.
    conformal_split_fraction``) carves the identical "cal" split everywhere.
    Before this factory, the evaluation entry omitted ``calibration_split``
    and silently calibrated on the full val split — reintroducing the
    optimism the strict split exists to eliminate (round-4 verdict, weak 5).

    ``bundle`` is a GraphBundle; host edges come from it so no device
    readback happens on remote TPUs.
    """
    tc = config.train
    graph = bundle.graph
    return EdgeMasker(
        graph,
        train_split=tc.train_split,
        val_split=tc.val_split,
        test_split=tc.test_split,
        mask_fraction=tc.mask_fraction,
        seed=tc.seed,
        host_edges=bundle.patient_lab_host(),
        # slot-major train batches pay off exactly when the Pallas head path
        # consumes the plans (see EdgeMasker doc)
        slot_major_train=config.model.use_pallas,
        # narrow lab tiles (PERFORMANCE.md "span-bounded lab tiles"):
        # train.extras.lab_tile_rows overrides; unset -> measured default
        lab_block_rows=resolve_lab_tile_rows(
            tc.extras.get("lab_tile_rows"),
            graph.node_count_map.get("lab"),
            config.model.use_pallas,
        ),
        lab_tile_mode=str(tc.extras.get("lab_tile_mode", "span")),
        # strict conformal calibration: carve this fraction of val into a
        # dedicated "cal" split the optimizer never sees (class docstring)
        calibration_split=float(
            config.evaluation.extras.get("conformal_split_fraction", 0) or 0
        ),
    )
