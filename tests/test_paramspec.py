import numpy as np
import pytest
import jax.numpy as jnp

from sunode_tpu.paramspec import (
    ParamSpec,
    flatten_path_dict,
    nest_path_dict,
    count_items,
)


def test_flatten_nest_roundtrip():
    nested = {"a": 1, "b": {"c": 2, "d": {"e": 3}}}
    flat = flatten_path_dict(nested)
    assert flat == {("a",): 1, ("b", "c"): 2, ("b", "d", "e"): 3}
    assert nest_path_dict(flat) == nested


def test_count_items():
    assert count_items(()) == 1
    assert count_items((3,)) == 3
    assert count_items((2, 4)) == 8


def test_basic_spec():
    spec = ParamSpec({"alpha": (), "beta": (3,), "g": {"h": (2, 2)}})
    assert spec.n_items == 1 + 3 + 4
    assert spec.slices[("alpha",)] == slice(0, 1)
    assert spec.slices[("beta",)] == slice(1, 4)
    assert spec.slices[("g", "h")] == slice(4, 8)


def test_flatten_unflatten():
    spec = ParamSpec({"alpha": (), "beta": (3,)})
    vec = spec.flatten_dict({"alpha": 2.0, "beta": [1.0, 2.0, 3.0]})
    np.testing.assert_allclose(vec, [2.0, 1.0, 2.0, 3.0])
    nested = spec.unflatten(vec)
    assert nested["alpha"].shape == ()
    np.testing.assert_allclose(nested["beta"], [1.0, 2.0, 3.0])


def test_flatten_scalar_broadcast():
    spec = ParamSpec({"beta": (3,)})
    vec = spec.flatten_dict({"beta": 5.0})
    np.testing.assert_allclose(vec, [5.0, 5.0, 5.0])


def test_flatten_missing_and_extra():
    spec = ParamSpec({"a": ()})
    with pytest.raises(KeyError):
        spec.flatten_dict({})
    with pytest.raises(KeyError):
        spec.flatten_dict({"a": 1.0, "zz": 2.0})


def test_subset():
    spec = ParamSpec(
        {"alpha": (), "beta": (), "gamma": (2,), "nested": {"x": (2,)}},
        subset_paths=[("alpha",), ("nested", "x")],
    )
    assert spec.subset_n_items == 3
    full = np.arange(6.0)
    sub = spec.take_subset(full)
    np.testing.assert_allclose(sub, [0.0, 4.0, 5.0])
    rem = spec.take_remainder(full)
    np.testing.assert_allclose(rem, [1.0, 2.0, 3.0])
    back = spec.combine(sub, rem)
    np.testing.assert_allclose(back, full)


def test_subset_interior_node_selects_leaves():
    spec = ParamSpec(
        {"nested": {"x": (2,), "y": ()}, "other": ()},
        subset_paths=["nested"],
    )
    assert spec.subset_paths == [("nested", "x"), ("nested", "y")]
    assert spec.subset_n_items == 3


def test_subset_string_path():
    spec = ParamSpec({"alpha": (), "beta": ()}, subset_paths=["beta"])
    assert spec.subset_paths == [("beta",)]


def test_combine_jax():
    spec = ParamSpec({"a": (), "b": (), "c": ()}, subset_paths=["b"])
    out = spec.combine(jnp.array([9.0]), jnp.array([1.0, 2.0]), xp=jnp)
    np.testing.assert_allclose(np.asarray(out), [1.0, 9.0, 2.0])


def test_combine_batched():
    spec = ParamSpec({"a": (), "b": ()}, subset_paths=["a"])
    sub = jnp.ones((5, 1))
    rem = jnp.zeros((5, 1))
    out = spec.combine(sub, rem, xp=jnp)
    assert out.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 1.0)


def test_record():
    spec = ParamSpec({"alpha": (), "nested": {"x": (2,)}})
    vec = np.array([1.0, 2.0, 3.0])
    rec = spec.record(vec)
    assert rec.alpha == 1.0
    np.testing.assert_allclose(rec.nested.x, [2.0, 3.0])
    # callable form
    rec2 = spec.record(lambda path, shape: np.zeros(shape))
    assert rec2.nested.x.shape == (2,)


def test_named_dims_and_coords():
    coords = {"region": np.array(["a", "b", "c"])}
    spec = ParamSpec({"s": ("region",), "k": (2,)}, coords=coords)
    assert spec.shapes[("s",)] == (3,)
    assert spec.dims_for("s") == ("region",)
    assert spec.dims_for("k") == ("k_dim_0",)


def test_unknown_dim_raises():
    with pytest.raises(KeyError):
        ParamSpec({"s": ("nope",)})


def test_remainder_spec():
    spec = ParamSpec({"a": (), "b": (2,), "c": ()}, subset_paths=["b"])
    rem = spec.remainder
    assert rem.paths == [("a",), ("c",)]
    assert rem.n_items == 2


def test_empty_spec():
    spec = ParamSpec({})
    assert spec.n_items == 0
    vec = spec.flatten_dict({})
    assert vec.shape == (0,)


def test_subset_vector_roundtrip():
    spec = ParamSpec(
        {"a": (), "b": {"c": (2,)}}, subset_paths=[("b", "c")]
    )
    sv = spec.flatten_subset_dict({"b": {"c": [7.0, 8.0]}})
    np.testing.assert_allclose(sv, [7.0, 8.0])
    nested = spec.unflatten_subset(sv)
    np.testing.assert_allclose(nested["b"]["c"], [7.0, 8.0])
