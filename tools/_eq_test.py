import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.ops.edge_detect import _join_edges
config = PipelineConfig()
H, W = config.camera.rows, config.camera.cols
kmax = config.detector.keylines_max
OFFS = [(-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)]
rng = np.random.default_rng(0)
rows = rng.integers(2, H-2, 40000); cols = rng.integers(2, W-2, 40000)
flat = np.unique(rows*W + cols)[:12000]
kl_id = np.full(H*W, -1, np.int32); kl_id[flat] = np.arange(len(flat))
kl_id_img = jnp.asarray(kl_id.reshape(H, W))
npos = len(flat)
pos = np.zeros((kmax,2), np.float32)
pos[:npos,0] = flat % W; pos[:npos,1] = flat // W
pos += rng.uniform(-0.49,0.49,(kmax,2)).astype(np.float32)
pos = jnp.asarray(pos)
grad = jnp.asarray(rng.normal(size=(kmax,2)).astype(np.float32))
valid = jnp.asarray(np.arange(kmax) < npos)

def join_new(pos, grad, valid, img):
    x = (pos[:, 0] + 0.5).astype(jnp.int32)
    y = (pos[:, 1] + 0.5).astype(jnp.int32)
    tx = -grad[:, 1]; ty = grad[:, 0]
    kl_f = img.astype(jnp.float32)
    pad = jnp.pad(kl_f, 1, constant_values=-1.0)
    nb = jnp.stack([pad[1+dy:1+dy+H, 1+dx:1+dx+W] for dy, dx in OFFS], axis=-1).reshape(H*W, 8)
    yy = jnp.clip(y, 0, H-1); xx = jnp.clip(x, 0, W-1)
    row = nb[yy*W + xx]
    sx = jnp.where(tx > 0, 1.0, -1.0)
    sx_neg = jnp.where(tx < 0, -1.0, 1.0)
    px = jnp.where(ty > 0, sx, sx_neg)
    py = jnp.where(ty > 0, 1.0, -1.0)
    c1 = jnp.where(px > 0, row[:,4], row[:,3])
    c2 = jnp.where(py > 0, row[:,6], row[:,1])
    c3 = jnp.where(py > 0, jnp.where(px > 0, row[:,7], row[:,5]),
                   jnp.where(px > 0, row[:,2], row[:,0]))
    nxf = jnp.where(c1 >= 0, c1, jnp.where(c2 >= 0, c2, c3))
    id_next = jnp.where(valid, nxf.astype(jnp.int32), -1)
    tgt = jnp.where(valid & (id_next >= 0), id_next, kmax)
    id_prev = jnp.full((kmax,), -1, jnp.int32).at[tgt].max(
        jnp.arange(kmax, dtype=jnp.int32), mode="drop")
    return id_next, id_prev

no, po = jax.jit(_join_edges)(pos, grad, valid, kl_id_img)
nn_, pn_ = jax.jit(join_new)(pos, grad, valid, kl_id_img)
no, po, nn_, pn_ = map(np.asarray, (no, po, nn_, pn_))
print("id_next equal:", np.array_equal(no, nn_))
print("id_prev equal:", np.array_equal(po, pn_), "ndiff:", int((po!=pn_).sum()))
d = np.nonzero(po != pn_)[0][:6]
print("diffs (idx, old_prev, new_prev):", [(int(i), int(po[i]), int(pn_[i])) for i in d])
for i in d[:3]:
    i = int(i)
    if pn_[i] >= 0:
        print("  claimant", int(pn_[i]), "id_next ->", int(no[int(pn_[i])]))
