import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rebvio_tpu.configs import CameraConfig, CoreConfig
from rebvio_tpu.ops import distance_field as DF, tracker
from rebvio_tpu.parallel import keyline_shard as KS
from tests.helpers import make_random_map


def test_keyline_sharded_minimize_vel_matches_single():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.RandomState(0)
    H, W, K, kmax, R = 48, 64, 100, 128, 8
    old_em, _ = make_random_map(rng, K, kmax, H, W)
    new_em, _ = make_random_map(rng, K, kmax, H, W)
    field = DF.field_id(DF.build_distance_field(new_em, R, H, W), kmax)
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig(search_range=R)

    vel_s, Rvel_s, old_s, F_s = tracker.minimize_vel(
        old_em, new_em, field, jnp.zeros(3, jnp.float32), cfg, cam
    )

    mesh = KS.make_kl_mesh(4)
    old_sh = KS.shard_edge_map(old_em, mesh, True)
    new_rep = KS.shard_edge_map(new_em, mesh, False)
    field_rep = jax.device_put(
        field, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    fn = KS.make_minimize_vel_sharded(mesh, cfg, cam)
    vel_p, Rvel_p, old_p, F_p = fn(old_sh, new_rep, field_rep)

    np.testing.assert_allclose(np.asarray(vel_p), np.asarray(vel_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(F_p), float(F_s), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(old_p.match_id_forward), np.asarray(old_s.match_id_forward)
    )


def test_keyline_sharded_minimize_vel_att_field_matches_single():
    """Sharded tracker on the PRODUCT configuration (VERDICT.md round-2
    item 6): the [N,8] attribute field replicated, single-gather tryVel per
    keyline shard — parity against the unsharded use_att path."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.RandomState(1)
    H, W, K, kmax, R, fs = 48, 64, 100, 128, 8, 2
    old_em, _ = make_random_map(rng, K, kmax, H, W)
    new_em, _ = make_random_map(rng, K, kmax, H, W)
    att = DF.build_att_field(new_em, R, H, W, fs)
    cam = CameraConfig(rows=H, cols=W, cx=W / 2, cy=H / 2, fx=100, fy=100,
                       k1=0, k2=0, k3=0, p1=0, p2=0)
    cfg = CoreConfig(search_range=R)

    vel_s, Rvel_s, old_s, F_s = tracker.minimize_vel(
        old_em, new_em, att, jnp.zeros(3, jnp.float32), cfg, cam,
        field_scale=fs, use_att=True,
    )

    mesh = KS.make_kl_mesh(4)
    old_sh = KS.shard_edge_map(old_em, mesh, True)
    new_rep = KS.shard_edge_map(new_em, mesh, False)
    att_rep = jax.device_put(
        att, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    fn = KS.make_minimize_vel_sharded(mesh, cfg, cam, field_scale=fs, use_att=True)
    vel_p, Rvel_p, old_p, F_p = fn(old_sh, new_rep, att_rep)

    np.testing.assert_allclose(np.asarray(vel_p), np.asarray(vel_s), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(F_p), float(F_s), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(old_p.match_id_forward), np.asarray(old_s.match_id_forward)
    )
