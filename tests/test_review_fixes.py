"""Regression tests for the round-2 self-review findings.

Each test pins one fixed defect:
  * LabNormalizer/Denormalizer degenerate-scale inverse (zscore/robust with
    a single-observation train split persisted scale=0);
  * export-serving refusing to ship randomly-initialized weights;
  * serving from a TwoDTrainer (model-axis-sharded patient table) —
    previously crashed on an unbound-axis error;
  * native/pandas LABEVENTS cohort-scan agreement on an EMPTY cohort.

(The kernel's PRNG itself has no CPU lowering, but the dropout helper is
pure jnp + bitcast — its unsigned-threshold statistics ARE tested here
with synthetic int32 bits.)
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle


# ---------------------------------------------------------------------------
# Degenerate-scale inverse transforms
# ---------------------------------------------------------------------------


class TestDegenerateScaleInverse:
    def test_zscore_single_observation_roundtrip(self):
        from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer

        n = LabNormalizer("zscore")
        vals = pd.Series([7.5, 7.5, 7.5])  # std == 0 -> scale persisted as 0
        normalized = n.fit_transform(vals, "x")
        assert (normalized == 0).all()
        # transform shifted by center (scale treated as 1); inverse must undo
        # exactly that, not collapse every prediction to the center
        restored = n.inverse_transform(pd.Series([0.0, -1.0, 2.0]), "x")
        np.testing.assert_allclose(restored, [7.5, 6.5, 9.5])

    def test_robust_zero_iqr_roundtrip(self):
        from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer

        n = LabNormalizer("robust")
        vals = pd.Series([3.0, 3.0, 3.0, 3.0])  # IQR == 0
        n.fit(vals, "x")
        restored = n.inverse_transform(pd.Series([0.5]), "x")
        np.testing.assert_allclose(restored, [3.5])

    def test_minmax_zero_spread_inverse_is_center(self):
        from multi_modal_gnn_tpu.utils.normalizer import LabNormalizer

        n = LabNormalizer("minmax")
        n.fit(pd.Series([4.0, 4.0]), "x")
        # forward collapses to 0 (information destroyed); inverse maps
        # anything back to the constant
        np.testing.assert_allclose(
            n.inverse_transform(pd.Series([0.0, 0.7]), "x"), [4.0, 4.0]
        )

    def test_denormalizer_zero_scale_zscore(self, tiny_bundle):
        from multi_modal_gnn_tpu.inference import Denormalizer

        lab_indexer = tiny_bundle.meta.indexers["lab"]
        lab_id = lab_indexer.id_of(0)
        frame = pd.DataFrame(
            {"lab_id": [lab_id], "center": [7.5], "scale": [0.0], "method": ["zscore"]}
        )
        denorm = Denormalizer(tiny_bundle.meta, normalizer_frame=frame)
        # prediction 0.3 in normalized space -> 0.3 + center, NOT center
        assert denorm(0, 0.3) == pytest.approx(7.8)

    def test_denormalizer_zero_scale_minmax(self, tiny_bundle):
        from multi_modal_gnn_tpu.inference import Denormalizer

        lab_indexer = tiny_bundle.meta.indexers["lab"]
        lab_id = lab_indexer.id_of(0)
        frame = pd.DataFrame(
            {"lab_id": [lab_id], "center": [4.0], "scale": [0.0], "method": ["minmax"]}
        )
        denorm = Denormalizer(tiny_bundle.meta, normalizer_frame=frame)
        assert denorm(0, 0.9) == pytest.approx(4.0)


# ---------------------------------------------------------------------------
# Fused-kernel dropout: unsigned threshold compare
# ---------------------------------------------------------------------------


def test_kernel_dropout_keep_fraction():
    """pltpu.prng_random_bits yields int32; before the fix the threshold
    compare ran signed, dropping every negative bit pattern (keep was
    0.5 - rate instead of 1 - rate).  The helper is pure jnp + bitcast, so
    its statistics are testable on CPU with synthetic int32 bits."""
    import jax
    import jax.numpy as jnp

    from multi_modal_gnn_tpu.ops.pallas_pairhead import _dropout

    rng = np.random.default_rng(0)
    bits = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(4096, 128), dtype=np.int32)
    )
    x = jnp.ones((4096, 128), jnp.float32)
    for rate in (0.2, 0.5, 0.7):
        out = np.asarray(jax.jit(lambda x, b: _dropout(x, b, rate))(x, bits))
        keep = (out != 0).mean()
        assert abs(keep - (1.0 - rate)) < 0.01, (rate, keep)
        np.testing.assert_allclose(out[out != 0], 1.0 / (1.0 - rate), rtol=1e-6)


# ---------------------------------------------------------------------------
# export-serving must not ship untrained weights
# ---------------------------------------------------------------------------


def test_load_trainer_requires_checkpoint(tmp_path, tiny_bundle, config):
    import run_pipeline

    cfg = config.replace(
        data=dataclasses.replace(config.data, output_dir=str(tmp_path))
    )
    with pytest.raises(FileNotFoundError, match="train step first"):
        run_pipeline._load_trainer(cfg, tiny_bundle, require_checkpoint=True)
    # without the flag the permissive behavior is preserved (evaluate/audit
    # can run against an in-memory trainer in tests)
    trainer = run_pipeline._load_trainer(cfg, tiny_bundle)
    assert trainer is not None


# ---------------------------------------------------------------------------
# Serving from the explicit 2-D trainer
# ---------------------------------------------------------------------------


def test_serving_from_two_d_trainer():
    from multi_modal_gnn_tpu import serving
    from multi_modal_gnn_tpu.models.factory import build_model
    from multi_modal_gnn_tpu.parallel.dp2d import TwoDTrainer, make_2d_mesh
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, hidden_dim=32, dropout=0.0),
        train=dataclasses.replace(cfg.train, donate_state=False),
    )
    bundle = make_synthetic_bundle(SyntheticSpec.tiny(seed=5), cfg)
    graph = bundle.graph

    mesh = make_2d_mesh(8, model_parallel=2)
    two = TwoDTrainer(graph, EdgeMasker(graph, seed=42), cfg, mesh=mesh)
    two.train_epoch()
    assert not two.state.params["embed_patient"]["embedding"].sharding.is_fully_replicated

    # previously: jax error "unbound axis name: model" from _prepare_params
    state = serving.compute_node_state(two)
    for v in state.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # parity: a single-device trainer carrying the SAME trained params must
    # serve identical predictions (the 2-D table is a global array)
    single = Trainer(
        build_model(cfg, graph), graph, EdgeMasker(graph, seed=42), cfg, eval_only=True
    )
    import jax

    single.state = single.state.replace(
        params=jax.tree.map(lambda x: np.asarray(x), two.state.params),
        batch_stats=jax.tree.map(lambda x: np.asarray(x), two.state.batch_stats),
    )
    rng = np.random.default_rng(0)
    p = rng.integers(0, graph.num_nodes("patient"), 64).astype(np.int32)
    l = rng.integers(0, graph.num_nodes("lab"), 64).astype(np.int32)
    fn, _ = serving.build_serving_fn(two, state=state)
    np.testing.assert_allclose(
        np.asarray(fn(p, l)),
        single.predict_pairs(p, l),
        rtol=2e-4,
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Empty-cohort LABEVENTS scan: native and pandas paths agree (keep nothing)
# ---------------------------------------------------------------------------


def test_labevents_empty_cohort_keeps_nothing(tmp_path):
    from multi_modal_gnn_tpu.data.mimic import MIMICLoader

    df = pd.DataFrame(
        {
            "SUBJECT_ID": [1, 2, 3],
            "ITEMID": [50800, 50801, 50802],
            "VALUENUM": [1.0, 2.0, 3.0],
            "CHARTTIME": "2100-01-01 10:00:00",
        }
    )
    df.to_csv(tmp_path / "LABEVENTS.csv", index=False)
    loader = MIMICLoader(tmp_path)
    out = loader.load_labevents_for_cohort([])
    assert len(out) == 0
    assert list(out.columns) == ["SUBJECT_ID", "ITEMID", "VALUENUM"]
    # non-empty still works on the same loader (native or pandas path)
    kept = loader.load_labevents_for_cohort([1, 3])
    assert sorted(kept["SUBJECT_ID"].tolist()) == [1, 3]


# ---------------------------------------------------------------------------
# Round-2 batch 3: indexer edge-case ids, chunked dense adjacency, HGT
# serving guard
# ---------------------------------------------------------------------------


def test_indexer_uint64_beyond_int64_no_wrap():
    """uint64 ids above 2**63 must not wrap: bulk add_many and scalar add
    agree on the node identity (previously add_many minted a duplicate node
    at the wrapped negative id)."""
    from multi_modal_gnn_tpu.graph.indexer import NodeIndexer

    big = 2**63 + 5
    ix = NodeIndexer("n")
    scalar_idx = ix.add(big)
    bulk = ix.add_many(np.array([big, 7], dtype=np.uint64))
    assert bulk[0] == scalar_idx
    assert len(ix) == 2  # big + 7, no wrapped duplicate
    assert ix.lookup_many(np.array([big], dtype=np.uint64))[0] == scalar_idx


def test_indexer_nan_ids_collapse_to_one_findable_node():
    """All NaN ids canonicalize to one singleton node, consistent across
    add_many calls and with scalar add/get (previously every NaN minted an
    unfindable duplicate)."""
    from multi_modal_gnn_tpu.graph.indexer import NodeIndexer

    ix = NodeIndexer("n")
    a = ix.add_many(np.array([1.0, float("nan"), 2.0, float("nan")]))
    assert a[1] == a[3]
    b = ix.add_many(pd.array([float("nan"), 3.0]))
    assert b[0] == a[1]  # same node across calls
    assert ix.get(float("nan")) == int(a[1])  # scalar path agrees
    assert ix.lookup_many(np.array([np.nan, 1.0]))[0] == a[1]
    # the literal string "nan" stays a distinct STRING id (a float-nan key
    # parsed from it would be unfindable)
    s = ix.add("nan")
    assert s != a[1]
    assert ix.index_of(" nan ") == s


def test_dense_adjacency_chunked_matches_one_shot():
    """dst_sorted chunked bincount (bounded int64 transient) is bit-identical
    to the one-shot path."""
    from multi_modal_gnn_tpu.graph.hetero import build_dense_adjacency

    rng = np.random.default_rng(0)
    num_src, num_dst, e = 3000, 4000, 20000  # 12M cells: >1 chunk at 8M-cell blocks
    src = rng.integers(0, num_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, num_dst, e)).astype(np.int32)
    counts = np.bincount(dst, minlength=num_dst).astype(np.float32)
    budget = num_src * num_dst * 4
    one = build_dense_adjacency(src, dst, num_src, num_dst, counts, budget)
    chunked = build_dense_adjacency(
        src, dst, num_src, num_dst, counts, budget, dst_sorted=True
    )
    # make sure the chunked branch actually engaged
    assert num_dst > (8 << 20) // num_src
    np.testing.assert_array_equal(one, chunked)


def test_hgt_serving_state_refuses_cluster_subgraph():
    """HGT.compute_node_state mirrors HeteroRGCN's guard: serving state on a
    mini-batch cluster subgraph (patient_id_base set) is a loud error, not a
    silently mislabeled cache."""
    import jax

    from multi_modal_gnn_tpu.models.factory import build_model, init_model_variables
    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.minibatch import build_patient_clusters

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, architecture="HGT", hidden_dim=16))
    # 2 clusters need 2 WINDOW-aligned patient ranges (>=129 patients after
    # the ADVICE-r4 cluster-count validation); tiny() has 120
    spec = dataclasses.replace(SyntheticSpec.tiny(seed=0), num_patients=300)
    bundle = make_synthetic_bundle(spec, cfg)
    masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
    cd = build_patient_clusters(bundle, masker, cfg, num_clusters=2)
    sub = cd.subgraphs[0]
    assert sub.patient_id_base is not None
    model = build_model(cfg, bundle.graph)
    variables = init_model_variables(model, bundle.graph, jax.random.key(0))
    with pytest.raises(ValueError, match="FULL graph"):
        model.apply(variables, sub, method=model.compute_node_state)
