"""Adjacency builder vs the reference implementation (pure numpy, used as a
behavioral oracle)."""

import numpy as np
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu.ops import graph

from _reference_oracle import reference_graph

ref_graph = reference_graph()


CASES = [
    # (num_nodes, links, strategy, max_hop) — the two graphs the models use
    (C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "spatial", 2),
    (len(C.BODY_PARTS_EDGE_IDX), list(C.BODY_PARTS_EDGE_PAIRS), "spatial", 2),
    (C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "uniform", 1),
    (C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "distance", 2),
]


@pytest.mark.skipif(ref_graph is None, reason="reference graph not importable")
@pytest.mark.parametrize("num_nodes,links,strategy,max_hop", CASES)
def test_adjacency_matches_reference(num_nodes, links, strategy, max_hop):
    want = ref_graph.Graph(num_nodes, links, strategy=strategy, max_hop=max_hop).A
    got = graph.build_adjacency(num_nodes, links, strategy=strategy, max_hop=max_hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_model_graph_shapes():
    a1 = graph.build_adjacency(C.NUM_BONES, list(C.DIR_EDGE_PAIRS), "spatial", 2)
    a2 = graph.build_adjacency(
        len(C.BODY_PARTS_EDGE_IDX), list(C.BODY_PARTS_EDGE_PAIRS), "spatial", 2
    )
    assert a1.shape == (5, 9, 9)
    assert a2.shape == (5, 3, 3)
