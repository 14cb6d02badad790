import numpy as np
import jax.numpy as jnp

from rebvio_tpu.ops import distance_field as DF
from tests import oracle
from tests.helpers import make_random_map


def test_distance_field_matches_oracle():
    rng = np.random.RandomState(0)
    H, W, K, kmax, R = 48, 64, 100, 128, 8
    em, d = make_random_map(rng, K, kmax, H, W)
    field = np.asarray(DF.build_distance_field(em, R, H, W))
    ids = np.asarray(DF.field_id(jnp.asarray(field), kmax))

    use = np.ones(K, bool)
    idf, dsf = oracle.build_distance_field(
        list(d["pos"]), d["grad"], d["grad_norm"], use, R, H, W
    )
    assert np.array_equal(ids, idf)


def test_distance_field_threshold_gate():
    rng = np.random.RandomState(1)
    H, W, K, kmax, R = 32, 40, 50, 64, 6
    em, d = make_random_map(rng, K, kmax, H, W)
    thr = float(np.median(d["grad_norm"]))
    em = em.replace(threshold=jnp.asarray(thr, jnp.float32))
    field = np.asarray(DF.build_distance_field(em, R, H, W))
    ids = np.asarray(DF.field_id(jnp.asarray(field), kmax))
    use = d["grad_norm"] >= thr
    idf, _ = oracle.build_distance_field(
        list(d["pos"]), d["grad"], d["grad_norm"], use, R, H, W
    )
    assert np.array_equal(ids, idf)


def test_tie_last_writer_wins():
    """Two keylines writing the same pixel at equal distance: larger idx wins."""
    import rebvio_tpu.types as T

    kmax, H, W = 8, 16, 16
    em = T.empty_edge_map(kmax, H, W)
    pos = np.zeros((kmax, 2), np.float32)
    grad = np.zeros((kmax, 2), np.float32)
    pos[0] = [5.0, 5.0]
    pos[1] = [9.0, 5.0]
    grad[0] = [1.0, 0.0]   # walks horizontally
    grad[1] = [-1.0, 0.0]  # walks horizontally the other way
    gn = np.linalg.norm(grad, axis=-1).astype(np.float32)
    valid = np.zeros(kmax, bool)
    valid[:2] = True
    em = em.replace(
        pos=jnp.asarray(pos), grad=jnp.asarray(grad), grad_norm=jnp.asarray(gn),
        valid=jnp.asarray(valid), count=jnp.asarray(2, jnp.int32),
    )
    field = DF.build_distance_field(em, 4, H, W)
    ids = np.asarray(DF.field_id(field, kmax)).reshape(H, W)
    # pixel (5,7) is distance 2 from both keylines -> idx 1 wins the tie
    assert ids[5, 7] == 1
    assert ids[5, 5] == 0
    assert ids[5, 9] == 1
