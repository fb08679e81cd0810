"""Node-graph evaluator tests: topo order, dirty tracking, caching, math nodes."""
import numpy as np

from raytracevs_tpu.models import (
    AddNode,
    DivNode,
    FloatNode,
    MulNode,
    SphereNode,
    SubNode,
    Vector3Node,
)
from raytracevs_tpu.scene.graph import NodeGraph, SocketType, sockets_compatible


def _wire(graph, a, out_name, b, in_name):
    return graph.connect(a.find_output(out_name), b.find_input(in_name))


def test_add_floats():
    g = NodeGraph()
    a = g.add_node(FloatNode(2.0))
    b = g.add_node(FloatNode(3.0))
    add = g.add_node(AddNode())
    _wire(g, a, "Value", add, "A")
    _wire(g, b, "Value", add, "B")
    results = g.evaluate()
    assert results[add.id] == 5.0


def test_vector_math_polymorphism():
    # Math nodes evaluate polymorphically on Vector3 operands (AddNode.cs:24-28)
    # even though the editor only wires Float sockets into them.
    v1 = np.array([1.0, 2.0, 3.0])
    v2 = np.array([4.0, 5.0, 6.0])
    add, sub, mul, div = AddNode(), SubNode(), MulNode(), DivNode()

    def ev(node):
        iv = {node.find_input("A").id: v1, node.find_input("B").id: v2}
        return node.evaluate(iv)

    np.testing.assert_allclose(ev(add), [5, 7, 9])
    np.testing.assert_allclose(ev(sub), [-3, -3, -3])
    np.testing.assert_allclose(ev(mul), [4, 10, 18])
    np.testing.assert_allclose(ev(div), [0.25, 0.4, 0.5])
    # Vector3 * Float scaling (MulNode.cs:25-28)
    iv = {mul.find_input("A").id: v1, mul.find_input("B").id: 2.0}
    np.testing.assert_allclose(mul.evaluate(iv), [2, 4, 6])


def test_div_by_zero_returns_numerator():
    g = NodeGraph()
    a = g.add_node(FloatNode(7.0))
    b = g.add_node(FloatNode(0.0))
    div = g.add_node(DivNode())
    _wire(g, a, "Value", div, "A")
    _wire(g, b, "Value", div, "B")
    assert g.evaluate()[div.id] == 7.0


def test_incremental_evaluation_uses_cache():
    g = NodeGraph()
    a = g.add_node(FloatNode(2.0))
    add = g.add_node(AddNode())
    _wire(g, a, "Value", add, "A")
    g.evaluate()
    assert not add.is_dirty
    calls = {"n": 0}
    orig = AddNode.evaluate

    def spy(self, iv):
        calls["n"] += 1
        return orig(self, iv)

    AddNode.evaluate = spy
    try:
        g.evaluate()  # nothing dirty -> no re-eval
        assert calls["n"] == 0
        a.value = 10.0
        a.mark_dirty()
        assert add.is_dirty  # downstream dirty propagation
        r = g.evaluate()
        assert calls["n"] == 1
        assert r[add.id] == 10.0
    finally:
        AddNode.evaluate = orig


def test_dirty_propagation_is_transitive():
    g = NodeGraph()
    a = g.add_node(FloatNode(1.0))
    m1 = g.add_node(MulNode())
    m2 = g.add_node(MulNode())
    _wire(g, a, "Value", m1, "A")
    _wire(g, m1, "Result", m2, "A")
    g.evaluate()
    a.mark_dirty()
    assert m1.is_dirty and m2.is_dirty


def test_topological_order_respects_dependencies():
    g = NodeGraph()
    add = g.add_node(AddNode())  # added first but depends on floats
    a = g.add_node(FloatNode(1.0))
    b = g.add_node(FloatNode(2.0))
    _wire(g, a, "Value", add, "A")
    _wire(g, b, "Value", add, "B")
    order = g.topological_order()
    assert order.index(a) < order.index(add)
    assert order.index(b) < order.index(add)


def test_cycle_tolerance():
    g = NodeGraph()
    m1 = g.add_node(AddNode())
    m2 = g.add_node(AddNode())
    _wire(g, m1, "Result", m2, "A")
    _wire(g, m2, "Result", m1, "A")
    order = g.topological_order()
    assert len(order) == 2  # cycle members still appear
    g.evaluate()  # must not raise


def test_socket_compatibility():
    assert sockets_compatible(SocketType.FLOAT, SocketType.FLOAT)
    assert sockets_compatible(SocketType.COLOR, SocketType.VECTOR3)
    assert sockets_compatible(SocketType.VECTOR3, SocketType.COLOR)
    assert not sockets_compatible(SocketType.FLOAT, SocketType.VECTOR3)


def test_input_rewire_replaces_connection():
    g = NodeGraph()
    a = g.add_node(FloatNode(1.0))
    b = g.add_node(FloatNode(2.0))
    add = g.add_node(AddNode())
    _wire(g, a, "Value", add, "A")
    _wire(g, b, "Value", add, "A")  # rewire same input
    assert len(g.connections) == 1
    assert g.evaluate()[add.id] == 2.0


def test_sphere_radius_scale():
    from raytracevs_tpu.scene.transform import Transform

    g = NodeGraph()
    s = g.add_node(SphereNode())
    s.radius = 2.0
    s.object_transform = Transform(scale=np.array([1.0, 3.0, 2.0]))
    r = g.evaluate()[s.id]
    assert r.radius == 6.0  # radius * max scale component (SphereNode.cs:72)


def test_copy_paste_nodes():
    """Clipboard copy/paste duplicates nodes + intra-selection connections
    with fresh ids and an offset (NodeEditorView.xaml.cs:725-900)."""
    from raytracevs_tpu.scene.graph import NodeGraph
    from raytracevs_tpu.scene.nodes import MaterialBSDFNode, SphereNode
    from raytracevs_tpu.scene.rtvs import copy_nodes, paste_nodes

    g = NodeGraph()
    mat = MaterialBSDFNode()
    mat.transmission = 0.7
    sph = SphereNode()
    sph.radius = 2.5
    sph.position = (100.0, 50.0)
    g.add_node(mat)
    g.add_node(sph)
    g.connect(mat.find_output("Material"), sph.find_input("Material"))

    clip = copy_nodes(g, [mat, sph])
    new = paste_nodes(g, clip)
    assert len(new) == 2
    assert len(g.nodes) == 4
    assert len(g.connections) == 2
    ids = {n.id for n in g.nodes}
    assert len(ids) == 4  # fresh ids
    new_sph = next(n for n in new if isinstance(n, SphereNode))
    assert new_sph.radius == 2.5
    assert new_sph.position == (130.0, 80.0)  # +30 offset
    new_mat = next(n for n in new if isinstance(n, MaterialBSDFNode))
    # the pasted connection links the NEW pair, not the originals
    pasted_conn = [c for c in g.connections if c.output_node is new_mat]
    assert len(pasted_conn) == 1 and pasted_conn[0].input_node is new_sph

    # copying one node of a connected pair drops the dangling connection
    clip2 = copy_nodes(g, [sph])
    assert clip2["Connections"] == []
