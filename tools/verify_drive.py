"""End-to-end CPU drive of the package boundary (the /verify recipe).

Checks: reference config loads verbatim; an analytic spherical-shell scene
renders at the right depth through the public ops; miss/empty/bad-config
probes behave; a tiny synthetic training run decreases the loss; a
checkpoint round-trips through save/load.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import virus_nerf_tpu as vn

cfg = vn.load_config('/root/reference/args/ethz_usstof_not_optimized_gpu.json')
print('config ok:', cfg.model.grid_type, cfg.training.batch_size)

from virus_nerf_tpu.ops import ray_aabb_intersect, march_rays_train, composite_rays
gs = 128
ax = (np.arange(gs) + 0.5) / gs - 0.5
X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
r = np.sqrt(X**2 + Y**2 + Z**2)
shell = ((r > 0.30) & (r < 0.34)).reshape(1, -1)
n = 360
th = np.linspace(0, 2*np.pi, n, endpoint=False)
o = np.zeros((n,3), np.float32)
d = np.stack([np.cos(th), np.sin(th), np.zeros(n)],1).astype(np.float32)
hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), 0.5)
m = march_rays_train(jnp.asarray(o), jnp.asarray(d), hits, jnp.asarray(shell),
    jnp.zeros(n), cascades=1, grid_size=gs, scale=0.5, exp_step_factor=0.0,
    max_samples=128, n_candidates=1024)
sig = jnp.where(m.valid, 800.0, 0.0)
out = composite_rays(sig, jnp.ones(m.xyzs.shape), m.deltas, m.ts, m.valid,
                     T_threshold=1e-4)
dep = np.asarray(out.depth); op = np.asarray(out.opacity)
print(f'shell: depth mean={dep.mean():.4f} std={dep.std():.4f} op_min={op.min():.4f}')
assert abs(dep.mean() - 0.31) < 0.02 and dep.std() < 0.01 and op.min() > 0.99

# multi-cascade / exponential-stepping shell (per-cascade grid extents)
sc = 1.0; rr = 0.45
def shell_grid(bound):
    axb = (np.arange(gs) + 0.5) / gs * 2 * bound - bound
    Xb, Yb, Zb = np.meshgrid(axb, axb, axb, indexing='ij')
    rb = np.sqrt(Xb**2 + Yb**2 + Zb**2)
    return (np.abs(rb - rr) < 2.0 * 2 * bound / gs).reshape(-1)
occ_mc = jnp.asarray(np.stack([shell_grid(0.5), shell_grid(1.0)]))
hits_mc = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), sc)
m_mc = march_rays_train(jnp.asarray(o), jnp.asarray(d), hits_mc, occ_mc,
    jnp.zeros(n), cascades=2, grid_size=gs, scale=sc, exp_step_factor=1/256,
    max_samples=256, n_candidates=1024)
sig_mc = jnp.where(m_mc.valid, 800.0, 0.0)
out_mc = composite_rays(sig_mc, jnp.ones(m_mc.xyzs.shape), m_mc.deltas,
                        m_mc.ts, m_mc.valid, T_threshold=1e-4)
dep_mc = np.asarray(out_mc.depth)
print(f'mc shell: depth mean={dep_mc.mean():.4f} std={dep_mc.std():.4f}')
assert abs(dep_mc.mean() - rr) < 0.05 and dep_mc.std() < 0.03

o2 = np.full((4,3), 2.0, np.float32)
h2 = np.asarray(ray_aabb_intersect(jnp.asarray(o2), jnp.asarray(d[:4]), 0.5))
assert (h2 == -1).all(), h2
m0 = march_rays_train(jnp.asarray(o), jnp.asarray(d), hits,
    jnp.zeros_like(jnp.asarray(shell)), jnp.zeros(n), cascades=1, grid_size=gs,
    scale=0.5, exp_step_factor=0.0, max_samples=128, n_candidates=1024)
assert int(m0.total_samples) == 0
try:
    vn.load_config('/nonexistent.json'); raise SystemExit('expected error')
except FileNotFoundError: pass

from virus_nerf_tpu.data import make_synthetic_dataset
from virus_nerf_tpu.training import Trainer
from virus_nerf_tpu.configs.config import Config
c = Config(); c.model.grid_size = 32; c.model.hash_levels = 8
c.model.hash_log2_T = 15; c.model.hash_max_res = 128
c.training.batch_size = 256; c.training.max_samples_per_ray = 32
c.training.march_candidates = 128
c.training.sampling_strategy = {'imgs':'all','pixs':{'valid_uss':0.3,'valid_tof':0.3}}
c.training.sensors = ['USS','ToF']; c.occ_grid.batch_size = 64
ds, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32,24))
tr = Trainer(c, ds, scene=scene)
st = tr.init_state()
chunk = tr._make_train_chunk(10)
st, met = chunk(st, ds, jnp.float32(0.0))
l0 = float(met['loss'][0])
for _ in range(4): st, met = chunk(st, ds, jnp.float32(0.0))
l1 = float(met['loss'][-1])
print(f'train: loss {l0:.4f} -> {l1:.4f}')
assert np.isfinite(l1) and l1 < l0

import tempfile, os
with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, 'ckpt.npz')
    tr.save_checkpoint(st, p)
    st2 = tr.load_checkpoint(p, tr.init_state())
    np.testing.assert_array_equal(np.asarray(st2.params.pos_table),
                                  np.asarray(st.params.pos_table))
print('VERIFY OK')
