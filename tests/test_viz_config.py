"""Moebius config/palette helpers + BaseClass estimator plumbing
(mirrors unit_tests/test_viz_moebius.py:41-66 and core/base.py:25-45)."""

import pytest

from mercury_graph_ray.pipelines.viz import (
    generate_color_palette,
    hsl_to_rgb,
    node_or_edge_config,
)


def test_node_or_edge_config_defaults():
    ec = node_or_edge_config()
    assert type(ec) == dict and len(ec) == 2
    assert type(ec["color_palette"]) == dict and len(ec["color_palette"]) == 0
    assert type(ec["size_thresholds"]) == list and len(ec["size_thresholds"]) == 0


def test_node_or_edge_config_full():
    ec = node_or_edge_config(
        text_is="one", color_is="two", colors={"lo": "#cc6633"},
        size_is="three", size_range=[1, 2], size_scale="sqrt",
    )
    assert type(ec) == dict and len(ec) == 6
    assert ec["label"] == "one"
    assert ec["color"] == "two"
    assert ec["color_palette"] == {"lo": "#cc6633"}
    assert ec["size"] == "three"
    assert ec["size_thresholds"] == [1, 2]
    assert ec["scale"] == "sqrt"


def test_node_or_edge_config_validation():
    with pytest.raises(AssertionError):
        node_or_edge_config(size_is="three", size_range=[])
    with pytest.raises(AssertionError):
        node_or_edge_config(size_is="three", size_scale="tan")


def test_generate_color_palette():
    pal = generate_color_palette(["a", "b", "c", "d"])
    assert set(pal) == {"a", "b", "c", "d"}
    assert len(set(pal.values())) == 4
    for v in pal.values():
        assert v.startswith("#") and len(v) == 7
        int(v[1:], 16)  # valid hex
    # hue shift moves every color (0.1 is not a multiple of 1/n, so the
    # shifted hue set cannot coincide with the original)
    pal2 = generate_color_palette(["a", "b", "c", "d"], hue=0.1)
    assert set(pal2.values()) != set(pal.values())


def test_hsl_to_rgb_range():
    for h in (0.0, 0.25, 0.5, 0.75):
        r, g, b = hsl_to_rgb(h, 0.7, 0.5)
        assert all(0 <= x <= 255 for x in (r, g, b))


def test_estimator_get_params_repr():
    from mercury_graph_ray.algos.pagerank import PageRank
    from mercury_graph_ray.algos.triangles import TriangleCount

    pr = PageRank(alpha=0.9, max_iter=7)
    params = pr.get_params()
    assert params["alpha"] == 0.9 and params["max_iter"] == 7
    assert sorted(params) == list(params)  # sorted by name
    assert repr(pr).startswith("PageRank(")
    assert "alpha=0.9" in repr(pr)
    assert str(pr).startswith("Object of class PageRank.")

    tc = TriangleCount(n_parts=3)
    assert tc.get_params() == {"n_parts": 3}
