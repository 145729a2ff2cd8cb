"""Per-stage timing breakdown of the training step on the live backend.

Each stage runs as a lax.scan of ITERS iterations inside ONE jitted
dispatch (remote-tunnel dispatch latency would otherwise swamp the
measurement).  A data dependence on the carry keeps XLA from hoisting the
work out of the loop.  Prints ms/iter per stage; stages overlap (e.g.
"full step" includes all others), so read them as a waterfall.

Usage: python tools/perf_breakdown.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data import make_synthetic_dataset
from virus_nerf_tpu.data.dataset import sample_batch
from virus_nerf_tpu.models.renderer import render_rays
from virus_nerf_tpu.ops.composite import composite_rays
from virus_nerf_tpu.ops.hash_encoder import hash_encode
from virus_nerf_tpu.ops.intersection import ray_aabb_intersect
from virus_nerf_tpu.ops.ray_march import march_rays_train
from virus_nerf_tpu.training import Trainer

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)  # compile
    jax.block_until_ready(out)
    tic = time.perf_counter()
    out = fn_j(*args)
    jax.block_until_ready(out)
    toc = time.perf_counter()
    ms = (toc - tic) / ITERS * 1e3
    print(f"{name:<40s} {ms:8.2f} ms/iter", flush=True)
    return ms


def scan_loop(body):
    """Wrap a per-iteration body (key -> array) into an ITERS-long scan."""

    def run(key):
        def step(carry, i):
            k = jax.random.fold_in(key, i)
            out = body(k, carry)
            return out, ()

        carry, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.arange(ITERS)
        )
        return carry

    return run


def main():
    cfg = Config()
    cfg.model.grid_type = "occ"
    cfg.training.batch_size = 4096
    cfg.training.max_samples_per_ray = 128
    cfg.training.march_candidates = 1024
    cfg.training.sample_budget = 4096 * 32
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.training.sensors = ["USS", "ToF"]
    cfg.occ_grid.batch_size = 1024
    cfg.occ_grid.update_interval = 8

    dataset, scene, _ = make_synthetic_dataset(n_images=16, img_wh=(160, 120))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.init_state()
    model = trainer.model

    # settle the grid with 100 real steps so sparsity is steady-state
    chunk = trainer._make_train_chunk(50)
    for _ in range(2):
        state, _ = chunk(state, dataset, jnp.float32(0.0))
    jax.block_until_ready(state.params)

    occ_bool = state.grid.occ_bool
    params = state.params
    key0 = jax.random.PRNGKey(0)

    B = cfg.training.batch_size
    S = cfg.training.max_samples_per_ray
    K = cfg.training.march_candidates
    BUD = cfg.training.sample_budget
    esf = cfg.exp_step_factor

    strategy = cfg.training.sampling_strategy

    # --- stage bodies (carry: float32 scalar mixed into inputs) ----------
    def body_sample(k, c):
        b = sample_batch(dataset, k, B, strategy)
        return c + jnp.sum(b.rays_o) * 1e-9 + jnp.sum(b.rays_d) * 1e-9

    batch = jax.jit(
        lambda k: sample_batch(dataset, k, B, strategy)
    )(key0)
    jax.block_until_ready(batch.rays_o)
    rays_o, rays_d = batch.rays_o, batch.rays_d

    def march(k, c):
        ro = rays_o + c * 1e-20
        hits_t = ray_aabb_intersect(ro, rays_d, model.scale)
        noise = jax.random.uniform(k, (B,))
        m = march_rays_train(
            ro, rays_d, hits_t, occ_bool, noise,
            cascades=model.cascades, grid_size=model.grid_size,
            scale=model.scale, exp_step_factor=esf,
            max_samples=S, n_candidates=K,
        )
        return c + jnp.sum(m.ts) * 1e-9 + m.total_samples.astype(jnp.float32)

    def body_march(k, c):
        return march(k, c)

    # fixed march output for downstream stages
    hits_t = ray_aabb_intersect(rays_o, rays_d, model.scale)
    m0 = jax.jit(
        lambda k: march_rays_train(
            rays_o, rays_d, hits_t, occ_bool,
            jax.random.uniform(k, (B,)),
            cascades=model.cascades, grid_size=model.grid_size,
            scale=model.scale, exp_step_factor=esf,
            max_samples=S, n_candidates=K,
        )
    )(key0)
    jax.block_until_ready(m0.ts)

    def body_compact(k, c):
        flat_valid = m0.valid.reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)
        sel = order[:BUD]
        pts = m0.xyzs.reshape(-1, 3)[sel] + c * 1e-20
        return c + jnp.sum(pts) * 1e-9

    # compacted points for model stages
    flat_valid = m0.valid.reshape(-1)
    order = jnp.argsort(~flat_valid, stable=True)
    sel = order[:BUD]
    pts = jnp.asarray(m0.xyzs.reshape(-1, 3)[sel])
    drs = jnp.asarray(m0.dirs.reshape(-1, 3)[sel])
    jax.block_until_ready(pts)

    def body_model_fwd(k, c):
        sig, rgb = model.forward(params, pts + c * 1e-20, drs)
        return c + jnp.sum(sig) * 1e-9 + jnp.sum(rgb) * 1e-9

    def body_hash_fwd(k, c):
        x = (pts + c * 1e-20) * 0.5 + 0.5
        h = hash_encode(params.pos_table, x, model.hash_spec)
        return c + jnp.sum(h) * 1e-9

    def body_hash_fwdbwd(k, c):
        x = (pts + c * 1e-20) * 0.5 + 0.5

        def f(tbl):
            return jnp.sum(hash_encode(tbl, x, model.hash_spec))

        g = jax.grad(f)(params.pos_table)
        return c + jnp.sum(g).astype(jnp.float32) * 1e-9

    def body_model_fwdbwd(k, c):
        def f(p):
            sig, rgb = model.forward(p, pts + c * 1e-20, drs)
            return jnp.sum(sig) * 1e-6 + jnp.sum(rgb) * 1e-6

        l, g = jax.value_and_grad(f)(params)
        return c + l

    train_body = trainer._make_train_body()

    def body_full(k, c):
        st = state._replace(key=k)
        st2, met = train_body(st, dataset, jnp.float32(0.0))
        return c + met["loss"]

    occ_body = trainer._make_occ_body()

    def body_occ(k, c):
        st = state._replace(key=k)
        st2 = occ_body(st, dataset, jnp.float32(0.0))
        return c + jnp.sum(st2.grid.prob) * 1e-9

    def body_adam(k, c):
        g = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, c * 1e-20), params
        )
        upd, _ = trainer.optimizer.update(g, state.opt_state)
        p2 = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
        return c + jnp.sum(p2.pos_table).astype(jnp.float32) * 1e-9

    def body_render_fwd(k, c):
        res = render_rays(
            model, params, occ_bool, rays_o + c * 1e-20, rays_d, k,
            exp_step_factor=esf, max_samples=S, n_candidates=K,
            sample_budget=BUD,
        )
        return (
            c + jnp.sum(res["rgb"]) * 1e-9 + jnp.sum(res["depth"]) * 1e-9
            + jnp.sum(res["opacity"]) * 1e-9
        )

    print(f"backend={jax.default_backend()}  iters={ITERS}", flush=True)
    print(f"B={B} S={S} K={K} budget={BUD}", flush=True)
    stages = {
        "sample_batch": body_sample,
        "aabb+march": body_march,
        "compaction argsort+gather": body_compact,
        "model fwd (hash+mlp+sh)": body_model_fwd,
        "hash_encode fwd": body_hash_fwd,
        "hash_encode fwd+bwd": body_hash_fwdbwd,
        "model fwd+bwd": body_model_fwdbwd,
        "render fwd (march+model+composite)": body_render_fwd,
        "adam update (table+mlps)": body_adam,
        "occ grid update": body_occ,
        "FULL train step": body_full,
    }
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, body in stages.items():
        if only is None or any(o in name for o in only):
            timed(name, scan_loop(body), key0)


if __name__ == "__main__":
    main()
