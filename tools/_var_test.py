import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from rebvio_tpu.configs import PipelineConfig
from rebvio_tpu.data import synthetic
from rebvio_tpu.pipeline import frontend_matrices
from rebvio_tpu.ops.scale_space import build_scale_space

config = PipelineConfig()
cam = config.camera
cfg = config.detector
mats = frontend_matrices(config)
seq = synthetic.generate(cam, n_frames=2, seed=0)
image = jnp.asarray(seq.images[0] * config.image_gain)
H, W = cam.rows, cam.cols
kmax = cfg.keylines_max

# build a realistic candidate mask once
@jax.jit
def make_cand(img):
    s0, dog, mag = build_scale_space(img, mats)
    thr = jnp.float32(0.01)
    m = mag >= (thr*cfg.max_image_value)**2
    rr = jnp.arange(H)[:,None]; cc = jnp.arange(W)[None,:]
    interior = (rr>=2)&(rr<H-2)&(cc>=2)&(cc<W-2)
    return m & interior & (dog > 0)

cand = make_cand(image)
print("n cand:", int(cand.sum()))

def bench(name, fn, *args, n=30):
    out = fn(*args); np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{name:32s} {best*1e3:8.3f} ms")
    return out

@jax.jit
def comp_searchsorted(cand):
    csum = jnp.cumsum(cand.reshape(-1).astype(jnp.float32))
    total = csum[-1]
    slots = jnp.arange(1, kmax+1, dtype=jnp.float32)
    flat_idx = jnp.searchsorted(csum, slots, side="left").astype(jnp.int32)
    valid = slots <= total
    return jnp.where(valid, flat_idx, 0).sum()

@jax.jit
def comp_rank_scatter(cand):
    cf = cand.reshape(-1)
    csum = jnp.cumsum(cf.astype(jnp.float32))
    total = csum[-1]
    tgt = jnp.where(cf & (csum <= kmax), csum - 1.0, kmax).astype(jnp.int32)
    flat = jnp.arange(H*W, dtype=jnp.int32)
    flat_idx = jnp.zeros((kmax,), jnp.int32).at[tgt].set(flat, mode="drop")
    slots = jnp.arange(1, kmax+1, dtype=jnp.float32)
    valid = slots <= total
    return jnp.where(valid, flat_idx, 0).sum()

a = bench("searchsorted", comp_searchsorted, cand)
b = bench("rank_scatter", comp_rank_scatter, cand)
print("equal:", int(a) == int(b))

# --- join edges variants on synthetic ids ---
rng = np.random.default_rng(0)
kl_id = np.full(H*W, -1, np.int32)
npos = 12000
sel = rng.choice(H*W, npos, replace=False)
sel.sort()
kl_id[sel] = np.arange(npos)
kl_id_img = jnp.asarray(kl_id.reshape(H, W))
pos = np.zeros((kmax,2), np.float32)
pos[:npos,0] = sel % W; pos[:npos,1] = sel // W
pos = jnp.asarray(pos + rng.uniform(-0.49,0.49,(kmax,2)).astype(np.float32))
grad = jnp.asarray(rng.normal(size=(kmax,2)).astype(np.float32))
valid = jnp.asarray(np.arange(kmax) < npos)

from rebvio_tpu.ops.edge_detect import _join_edges
@jax.jit
def join_old(pos, grad, valid, img):
    nx, pv = _join_edges(pos, grad, valid, img)
    return nx.sum() + pv.sum() * 7

OFFS = [(-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)]
@jax.jit
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
    return id_next.sum() + id_prev.sum() * 7

o = bench("join_old", join_old, pos, grad, valid, kl_id_img)
nw = bench("join_new", join_new, pos, grad, valid, kl_id_img)
print("join sums old/new:", int(o), int(nw))

# --- check id_next equality separately ---
@jax.jit
def join_old_parts(pos, grad, valid, img):
    return _join_edges(pos, grad, valid, img)

@jax.jit
def join_new_parts(pos, grad, valid, img):
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

no, po = join_old_parts(pos, grad, valid, kl_id_img)
nn_, pn_ = join_new_parts(pos, grad, valid, kl_id_img)
no, po, nn_, pn_ = map(np.asarray, (no, po, nn_, pn_))
print("id_next equal:", np.array_equal(no, nn_))
print("id_prev equal:", np.array_equal(po, pn_), " ndiff:", int((po != pn_).sum()))
d = np.nonzero(po != pn_)[0][:5]
print("sample diffs (idx, old, new):", [(int(i), int(po[i]), int(pn_[i])) for i in d])

# --- top_k compaction ---
@jax.jit
def comp_topk(cand):
    cf = cand.reshape(-1)
    val = jnp.where(cf, -jnp.arange(H*W, dtype=jnp.float32), -jnp.float32(1e30))
    v, idx = jax.lax.top_k(val, kmax)
    valid = v > -1e29
    total = cf.sum()
    return jnp.where(valid, idx, 0).sum()

c = bench("topk", comp_topk, cand)
print("topk equal:", int(c) == int(a))
