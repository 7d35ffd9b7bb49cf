"""Graph construction tests: indexer, padding/CSR invariants, reverse edges,
serialization round-trip, statistics."""

import numpy as np
import pandas as pd
import pytest

from multi_modal_gnn_tpu.config import Config
from multi_modal_gnn_tpu.graph import (
    NodeIndexer,
    build_heterogeneous_graph,
    compute_graph_statistics,
    load_graph,
    save_graph,
    validate_graph,
)
from multi_modal_gnn_tpu.graph.hetero import pad_edge_set
from multi_modal_gnn_tpu.graph.schema import (
    PATIENT_DIAGNOSIS,
    PATIENT_LAB,
    PATIENT_MEDICATION,
    reverse_edge_type,
)


class TestNodeIndexer:
    def test_canonicalization(self):
        ix = NodeIndexer("patient")
        a = ix.add(42)
        assert ix.add(42.0) == a
        assert ix.add("42") == a
        assert ix.add("42.0") == a
        assert len(ix) == 1
        assert ix.add("abc ") == ix.add("abc")

    def test_roundtrip(self):
        ix = NodeIndexer("lab")
        ids = [10, "x", 3.5, 7]
        for i in ids:
            ix.add(i)
        for i, entity in enumerate([10, "x", 3.5, 7]):
            assert ix.index_of(entity) == i
            assert ix.id_of(i) == entity

    def test_add_many_matches_add(self):
        ids = [5, 3, 5, "a", 3.0, "5", "b", "a"]
        bulk = NodeIndexer()
        got = bulk.add_many(ids)
        seq = NodeIndexer()
        expect = np.array([seq.add(i) for i in ids])
        np.testing.assert_array_equal(got, expect)
        assert len(bulk) == len(seq)

    def test_lookup_many_unknown(self):
        ix = NodeIndexer()
        ix.add_many([1, 2, 3])
        np.testing.assert_array_equal(ix.lookup_many([2, 9, 1]), [1, -1, 0])

    def test_serialization(self):
        ix = NodeIndexer("diagnosis")
        ix.add_many(["428", "584", "038"])
        ix2 = NodeIndexer.from_dict(ix.to_dict())
        assert ix2.index_of("584") == 1
        assert len(ix2) == 3


class TestPadEdgeSet:
    def test_sorted_and_padded(self):
        src = np.array([3, 1, 2, 0], dtype=np.int32)
        dst = np.array([2, 0, 1, 0], dtype=np.int32)
        val = np.array([0.3, 0.1, 0.2, 0.0], dtype=np.float32)
        es = pad_edge_set(src, dst, num_src=4, num_dst=3, val=val, pad_multiple=8)
        assert es.num_padded == 8
        assert es.num_valid == 4
        d = np.asarray(es.dst)
        m = np.asarray(es.mask) > 0
        assert np.all(np.diff(d[m]) >= 0)
        assert np.all(d[~m] == 3)  # dummy segment
        # alignment preserved through the sort
        s, v = np.asarray(es.src), np.asarray(es.val)
        pairs = {(int(s[i]), round(float(v[i]), 5)) for i in range(4)}
        assert pairs == {(1, 0.1), (0, 0.0), (2, 0.2), (3, 0.3)}
        # CSR: counts per dst 2,1,1
        np.testing.assert_array_equal(np.asarray(es.row_ptr), [0, 2, 3, 4])
        np.testing.assert_array_equal(np.asarray(es.dst_count), [2, 1, 1])

    def test_empty_relation(self):
        es = pad_edge_set(np.zeros(0), np.zeros(0), num_src=5, num_dst=4, pad_multiple=16)
        assert es.num_valid == 0
        assert es.num_padded == 16
        assert np.all(np.asarray(es.dst) == 4)

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            pad_edge_set(np.array([5]), np.array([0]), num_src=5, num_dst=3)


class TestBuildGraph:
    def _tables(self):
        labs = pd.DataFrame(
            {
                "SUBJECT_ID": [1, 1, 2, 3, 3, 3],
                "ITEMID": [50, 51, 50, 50, 51, 52],
                "VALUE": [10.0, 1.0, 12.0, 9.0, 2.0, 100.0],
                "VALUE_NORMALIZED": [-0.5, 0.1, 0.7, -1.0, 0.9, 0.0],
            }
        )
        dx = pd.DataFrame({"SUBJECT_ID": [1, 2], "ICD3_CODE": ["428", "584"]})
        rx = pd.DataFrame({"SUBJECT_ID": [2, 3], "DRUG": ["aspirin", "heparin"]})
        cohort = pd.DataFrame({"SUBJECT_ID": [1, 2, 3]})
        labitems = pd.DataFrame({"ITEMID": [50, 51, 52], "LABEL": ["glucose", "wbc", "cpk"]})
        return labs, dx, rx, cohort, labitems

    def test_degree_clustering_is_pure_relabeling(self, config):
        """cluster_patients_by_degree changes only the index layout: the
        (patient_id, lab_id, value) edge set read back through index_to_id
        is identical with it on or off, and off reproduces first-seen
        (reference) order."""
        import dataclasses as _dc

        labs, dx, rx, cohort, labitems = self._tables()
        off = config.replace(
            graph=_dc.replace(config.graph, cluster_patients_by_degree=False)
        )

        def id_edges(bundle):
            es = bundle.graph.edges[PATIENT_LAB]
            n = es.num_valid
            src = np.asarray(es.src)[:n]
            dst = np.asarray(es.dst)[:n]
            val = np.asarray(es.val)[:n]
            pids = bundle.meta.indexers["patient"].index_to_id
            lids = bundle.meta.indexers["lab"].index_to_id
            return sorted(
                (pids[s_], lids[d], round(float(v), 5))
                for s_, d, v in zip(src, dst, val)
            )

        b_on = build_heterogeneous_graph(labs, dx, rx, cohort, labitems, config)
        b_off = build_heterogeneous_graph(labs, dx, rx, cohort, labitems, off)
        assert id_edges(b_on) == id_edges(b_off)
        assert b_off.meta.indexers["patient"].index_to_id == [1, 2, 3]  # first-seen
        assert b_on.meta.indexers["patient"].index_to_id == [2, 1, 3]  # by degree
        # degrees ascending under clustering
        deg = np.asarray(b_on.graph.patient_lab_degree)
        assert (np.diff(deg) >= 0).all()

    def test_build_and_validate(self, config):
        labs, dx, rx, cohort, labitems = self._tables()
        bundle = build_heterogeneous_graph(labs, dx, rx, cohort, labitems, config)
        g = bundle.graph
        validate_graph(g)
        assert g.num_nodes("patient") == 3
        assert g.num_nodes("lab") == 3
        assert g.edges[PATIENT_LAB].num_valid == 6
        # reverse relations exist with transposed endpoints
        rev = g.edges[reverse_edge_type(PATIENT_LAB)]
        assert rev.num_valid == 6
        assert rev.num_src == 3 and rev.num_dst == 3
        assert g.edges[reverse_edge_type(PATIENT_DIAGNOSIS)].num_valid == 2
        assert g.edges[reverse_edge_type(PATIENT_MEDICATION)].num_valid == 2
        # patients are indexed in ascending lab-degree order by default
        # (graph.cluster_patients_by_degree — a pure layout choice that lets
        # the degree-predicated head kernel skip whole windows), so degrees
        # come out sorted: the 1-lab patient first, the 3-lab patient last
        np.testing.assert_array_equal(np.asarray(g.patient_lab_degree), [1, 2, 3])
        # lab names resolved through labitems
        assert bundle.meta.lab_names[0] == "glucose"
        # raw-value stats present for denormalization
        assert bundle.meta.lab_stats[0]["mean"] == pytest.approx((10 + 12 + 9) / 3)

    def test_statistics(self, tiny_graph):
        stats = compute_graph_statistics(tiny_graph)
        assert stats["num_nodes"]["patient"] == 120
        assert stats["num_edges"]["patient__has_lab__lab"] > 0
        assert 0 < stats["patient_lab_density"] < 1

    def test_serialization_roundtrip(self, tiny_bundle, tmp_path):
        path = save_graph(tiny_bundle, tmp_path / "graph")
        loaded = load_graph(path)
        validate_graph(loaded.graph)
        g0, g1 = tiny_bundle.graph, loaded.graph
        assert g0.node_counts == g1.node_counts
        assert set(g0.edges) == set(g1.edges)
        for et in g0.edges:
            np.testing.assert_array_equal(np.asarray(g0.edges[et].src), np.asarray(g1.edges[et].src))
            np.testing.assert_array_equal(np.asarray(g0.edges[et].dst), np.asarray(g1.edges[et].dst))
        assert loaded.meta.lab_names == tiny_bundle.meta.lab_names
        assert loaded.meta.config_hash == tiny_bundle.meta.config_hash


def test_synthetic_shapes(tiny_graph):
    validate_graph(tiny_graph)
    counts = tiny_graph.node_count_map
    assert counts == {"patient": 120, "lab": 12, "diagnosis": 10, "medication": 8}
    assert len(tiny_graph.edges) == 6


def test_onehot_features(config):
    from multi_modal_gnn_tpu.graph.build import build_onehot_features
    from multi_modal_gnn_tpu.graph.indexer import NodeIndexer

    pats = NodeIndexer("patient"); pats.add_many([1, 2, 3])
    items = NodeIndexer("diagnosis"); items.add_many(["428", "584"])
    pairs = pd.DataFrame({"SUBJECT_ID": [1, 1, 3, 9], "ICD3_CODE": ["428", "584", "428", "428"]})
    mat = build_onehot_features(pairs, "SUBJECT_ID", "ICD3_CODE", pats, items)
    np.testing.assert_array_equal(mat, [[1, 1], [0, 0], [1, 0]])  # row 9 dropped


def test_empty_modality_graph_trains(config):
    """A cohort with no medications at all must build, validate, and train."""
    import dataclasses

    import jax

    from multi_modal_gnn_tpu.training.masker import EdgeMasker
    from multi_modal_gnn_tpu.training.trainer import Trainer
    from multi_modal_gnn_tpu.models.factory import build_model

    labs = pd.DataFrame(
        {
            "SUBJECT_ID": np.repeat(np.arange(1, 13), 4),
            "ITEMID": np.tile([50, 51, 52, 53], 12),
            "VALUE": np.random.default_rng(0).normal(10, 2, 48),
            "VALUE_NORMALIZED": np.random.default_rng(0).standard_normal(48).astype(np.float32),
        }
    )
    dx = pd.DataFrame({"SUBJECT_ID": [1, 2], "ICD3_CODE": ["428", "428"]})
    rx = pd.DataFrame(columns=["SUBJECT_ID", "DRUG"])  # empty modality
    cohort = pd.DataFrame({"SUBJECT_ID": np.arange(1, 13)})
    bundle = build_heterogeneous_graph(labs, dx, rx, cohort, None, config)
    validate_graph(bundle.graph)
    assert "medication" not in bundle.graph.node_types  # empty modality dropped

    cfg = config.replace(model=dataclasses.replace(config.model, hidden_dim=16))
    masker = EdgeMasker(bundle.graph, seed=0, host_edges=bundle.patient_lab_host())
    trainer = Trainer(build_model(cfg, bundle.graph), bundle.graph, masker, cfg)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)
