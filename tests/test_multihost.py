import jax
import numpy as np
import pytest

from rebvio_tpu.parallel import multihost as MH


def test_pod_mesh_shapes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = MH.make_pod_mesh(seq_parallel=2, inner_axis="lm")
    assert mesh.shape == {"seq": 2, "lm": 4}
    start, size = MH.local_batch_slice(8, mesh)
    assert (start, size) == (0, 8)  # single process owns everything


def test_pod_mesh_default_single_process():
    mesh = MH.make_pod_mesh(inner_axis="kl")
    assert mesh.shape["seq"] == 1
