"""Benchmark: steady-state training throughput (rays/sec) on one chip.

Mirrors the reference's headline budget: ETHZ camera+USS+ToF config
(batch 4096 rays, VIRUS occupancy grid updated every 8 steps, full-size
model — /root/reference/args/ethz_usstof_not_optimized_gpu.json), whose
500 steps / 45 s cap implies ~45.5k rays/s on the reference's CUDA GPU
(BASELINE.md).  Grid updates are included in the timing — this is the real
train-loop throughput, not a kernel microbenchmark.

The loop is scan-fused: CHUNK train steps (with their grid updates folded
in as lax.cond) execute as ONE device program per dispatch, so host/tunnel
round-trip latency is amortized out.  Timing forces a scalar fetch per
chunk — on remote backends `block_until_ready` may not actually block, but
a host transfer of the result does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the scan-fused chunk is a large program
# (several minutes of XLA time over the remote-compile tunnel); cache the
# serialized executable across bench invocations
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

# implied reference throughput: 500 steps x 4096 rays / 45 s (BASELINE.md)
BASELINE_RAYS_PER_SEC = 500 * 4096 / 45.0

CHUNK = 24  # train steps fused into one dispatch: long enough to amortize
# the ~67 ms tunnel dispatch (<1% at 24 x ~110 ms), short enough to keep
# XLA compile of the fused program in single-digit minutes, and a whole
# number of grid-update intervals (3 x 8) so the trainer compiles the
# cond-free grouped chunk body


def check_kernels() -> bool:
    """On-TPU parity checks of the Pallas kernels against their jnp
    oracles — the only TPU-side kernel CI (tests run on CPU where the
    Mosaic path never compiles).  Piggybacks on the bench process to
    respect the one-TPU-process rule."""
    import numpy as np

    from virus_nerf_tpu.ops.fused_adam import (
        _adam_leaf_jnp,
        _adam_leaf_pallas,
    )
    from virus_nerf_tpu.ops.segment_sum_pallas import (
        _windowed_segment_sum_jnp,
    )

    from virus_nerf_tpu.ops import segment_sum_pallas as _ssp

    ok = True
    key = jax.random.PRNGKey(0)

    def _seg_oracle(sv_g, sk_g, rows, hilo):
        """Mode-matched oracle: the kernel streams bf16 values (hi/lo split
        when hilo, plain bf16-rounded when not) with f32 accumulation —
        round the oracle's inputs the same way so the 1e-3 gate checks the
        KERNEL, not the configured stream precision."""
        if hilo:
            hi = sv_g.astype(jnp.bfloat16).astype(jnp.float32)
            sv_r = hi + (sv_g - hi).astype(jnp.bfloat16).astype(jnp.float32)
        else:
            sv_r = sv_g.astype(jnp.bfloat16).astype(jnp.float32)
        return np.asarray(_windowed_segment_sum_jnp(sv_r, sk_g, rows)).T

    def _run_seg(sv, sk, rows, ts, hilo):
        """Run the (G, K, F) case through the requested kernel + stream
        mode; the ts variant consumes the TRANSPOSED (G, F, K) stream."""
        old = _ssp._HILO
        _ssp._HILO = hilo
        try:
            if ts:
                fn = jax.jit(
                    lambda a, b: _ssp._sorted_group_segment_sum_ts_tpu(
                        a, b, rows
                    )
                )
                return np.asarray(fn(sv.transpose(0, 2, 1), sk))
            fn = jax.jit(
                lambda a, b: _ssp._sorted_group_segment_sum_t_tpu(a, b, rows)
            )
            return np.asarray(fn(sv, sk))
        finally:
            _ssp._HILO = old

    def _check_seg(name, sv, sk, rows, ts, hilo):
        nonlocal ok
        got = _run_seg(sv, sk, rows, ts, hilo)
        want = np.stack(
            [_seg_oracle(sv[g], sk[g], rows, hilo) for g in range(sv.shape[0])]
        )
        err = np.max(np.abs(got - want))
        if err > 1e-3:
            print(f"# segment_sum {name} mismatch: {err:.3e}")
            ok = False

    def _check_fused(name, wgt, sk, rows, feat):
        """Fused factor-stream kernel vs the f-major outer-product oracle
        (bf16-rounded factors, exact windowed sum)."""
        nonlocal ok
        got = np.asarray(
            jax.jit(
                lambda a, b: _ssp._sorted_group_segment_sum_tsf_tpu(
                    a, b, rows, feat
                )
            )(wgt, sk)
        )
        wr = np.asarray(wgt.astype(jnp.bfloat16).astype(jnp.float32))
        V = np.concatenate(
            [wr[:, :8] * wr[:, 8 + f: 9 + f] for f in range(feat)], axis=1
        )
        want = np.stack(
            [
                _seg_oracle(
                    jnp.asarray(V[g].T), sk[g], rows, False
                )
                for g in range(wgt.shape[0])
            ]
        )
        err = np.max(np.abs(got - want))
        if err > 1e-3:
            print(f"# segment_sum fused {name} mismatch: {err:.3e}")
            ok = False

    # windowed segment sum, BOTH kernel layouts x BOTH stream modes
    # (incl. a skewed level — exercises empty blocks + the prefetch guard)
    G, K, R, F = 2, 8192, 2**14, 16
    sk = jnp.sort(jax.random.randint(key, (G, K), 0, R, jnp.int32), axis=1)
    sk = sk.at[1].set(jnp.sort(
        jax.random.randint(key, (K,), 1000, 1900, jnp.int32)))
    sv = jax.random.normal(jax.random.PRNGKey(1), (G, K, F), jnp.float32)
    for ts in (False, True):
        for hilo in (False, True):
            _check_seg(f"ts={ts} hilo={hilo}", sv, sk, R, ts, hilo)
    wgt = jax.random.normal(jax.random.PRNGKey(21), (G, 10, K), jnp.float32)
    _check_fused("skewed", wgt, sk, R, 2)

    # non-block-aligned rows (a dense hash level size): internal padding;
    # both layouts in the production stream mode
    R2, K2 = 9264, 4096
    sk2 = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(4), (1, K2), 0, R2, jnp.int32),
        axis=1,
    )
    sv2 = jax.random.normal(jax.random.PRNGKey(5), (1, K2, F), jnp.float32)
    for ts in (False, True):
        _check_seg(f"padded-rows ts={ts}", sv2, sk2, R2, ts, _ssp._HILO)
    wgt2 = jax.random.normal(jax.random.PRNGKey(22), (1, 10, K2), jnp.float32)
    _check_fused("padded-rows", wgt2, sk2, R2, 2)

    # ODD n_blocks with G > 1 and dense multi-chunk blocks: a group's last
    # block and the next group's block 0 run on consecutive linearized
    # steps — the b-parity slot pairing raced exactly here (ADVICE r3)
    R3, K3 = 3 * _ssp._B, 16384
    sk3 = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(8), (3, K3), 0, R3, jnp.int32),
        axis=1,
    )
    sv3 = jax.random.normal(jax.random.PRNGKey(9), (3, K3, F), jnp.float32)
    for ts in (False, True):
        _check_seg(f"odd-blocks ts={ts}", sv3, sk3, R3, ts, _ssp._HILO)
    wgt3 = jax.random.normal(jax.random.PRNGKey(23), (3, 10, K3), jnp.float32)
    _check_fused("odd-blocks", wgt3, sk3, R3, 2)

    # merged multi-size concatenated stream (mirrors _emit_merged in the
    # hash backward: per-segment sorted keys offset by ascending bases form
    # ONE globally sorted stream over the concatenated output rows)
    seg_sizes = (1000, 4096, 9264)
    seg_ks = (512, 2048, 4096)
    parts_k, base = [], 0
    for ssize, kk in zip(seg_sizes, seg_ks):
        kseg = jnp.sort(
            jax.random.randint(
                jax.random.PRNGKey(10 + ssize), (kk,), 0, ssize, jnp.int32
            )
        )
        parts_k.append(kseg + base)
        base += ssize
    sk4 = jnp.concatenate(parts_k)[None]
    sv4 = jax.random.normal(
        jax.random.PRNGKey(11), (1, sk4.shape[1], F), jnp.float32
    )
    for ts in (False, True):
        _check_seg(f"merged ts={ts}", sv4, sk4, base, ts, _ssp._HILO)
    wgt4 = jax.random.normal(
        jax.random.PRNGKey(24), (1, 10, sk4.shape[1]), jnp.float32
    )
    _check_fused("merged", wgt4, sk4, base, 2)

    # packed bf16 forward gather vs the plain row gather on a big slab
    # (the packed path engages only for slabs >= 2^17 rows, which CPU
    # tests never build)
    from virus_nerf_tpu.ops.hash_encoder import (
        _gather_rows_packed_bf16,
        _packable,
    )

    s_rows = 1 << 17
    slab = jax.random.normal(
        jax.random.PRNGKey(6), (s_rows, 16), jnp.float32
    )
    rl = jax.random.randint(
        jax.random.PRNGKey(7), (4096,), 0, s_rows, jnp.int32
    )
    assert _packable(slab, s_rows, 2)
    got_p = np.asarray(
        jax.jit(_gather_rows_packed_bf16)(slab, rl).astype(jnp.float32)
    )
    want_p = np.asarray(jnp.take(slab, rl, axis=0).astype(jnp.bfloat16))
    err_p = np.max(np.abs(got_p - want_p))
    if err_p > 0:
        print(f"# packed gather mismatch: {err_p:.3e}")
        ok = False

    # widen-pack kernel (env-gated experiment, VNERF_PACK_KERNEL=1):
    # packed_slabs_group output must match the roll-built wide slab
    # scattered through packed_ci_rows — bit-exact, per the layout
    # contract in widen_pack_pallas.py (same oracle construction as the
    # CPU-side test_packed_ci_gather_matches_wide_gather, but running the
    # real Mosaic kernel)
    from virus_nerf_tpu.ops.widen_pack_pallas import (
        packed_ci_rows,
        packed_slabs_group,
    )

    wp_size, wp_g = 2 * 8192, 2
    wp_offs = (0, 1, 37, 38, 1369, 1370, 1406, 1407)  # static corner rows
    wp_tab = jax.random.normal(
        jax.random.PRNGKey(12), (64 + wp_g * wp_size + 16, 2), jnp.float32
    )
    got_wp = np.asarray(
        jax.jit(
            lambda t: packed_slabs_group(t, 64, wp_size, wp_g, wp_offs)
        )(wp_tab).astype(jnp.float32)
    )
    tab_bf = np.asarray(wp_tab.astype(jnp.bfloat16).astype(jnp.float32))
    qs, js = (
        np.asarray(x)
        for x in packed_ci_rows(
            jnp.arange(wp_size, dtype=jnp.int32), wp_size // 8
        )
    )
    base_r = np.arange(wp_size)
    err_wp = 0.0
    for g_ in range(wp_g):
        ci = np.zeros((wp_size // 8, 128), np.float32)
        for c, o in enumerate(wp_offs):
            src = tab_bf[64 + g_ * wp_size + (base_r + o) % wp_size]
            for f in range(2):
                ci[qs, 16 * c + 2 * js + f] = src[:, f]
        err_wp = max(err_wp, float(np.max(np.abs(got_wp[g_] - ci))))
    if err_wp > 0:
        print(f"# widen-pack slab mismatch: {err_wp:.3e}")
        ok = False

    # fused adam: pallas vs jnp, one big flat leaf
    n = 1 << 21
    g = jax.random.normal(key, (n,), jnp.float32)
    mu = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.1
    nu = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (n,))) * 0.01
    scal = jnp.asarray([1e-2, 0.1, 0.001], jnp.float32)
    args = (g, mu, nu, scal, 0.9, 0.999, 1e-15)
    outs_p = jax.jit(_adam_leaf_pallas, static_argnums=(4, 5, 6))(*args)
    outs_j = jax.jit(_adam_leaf_jnp, static_argnums=(4, 5, 6))(*args)
    for a, b, name in zip(outs_p, outs_j, ("delta", "mu", "nu")):
        e = float(jnp.max(jnp.abs(a - b)))
        if e > 1e-6:
            print(f"# fused_adam {name} mismatch: {e:.3e}")
            ok = False
    return ok


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """Retry backend init through transient tunnel outages: the remote
    TPU endpoint drops occasionally ('Unable to initialize backend:
    UNAVAILABLE', observed 2026-08-17) and the driver runs this script
    unattended."""
    import time as _t

    deadline = _t.monotonic() + max_wait_s
    while True:
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if _t.monotonic() > deadline:
                raise
            print(f"# backend unavailable, retrying: {e}", flush=True)
            _t.sleep(30.0)


def main():
    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data import make_synthetic_dataset
    from virus_nerf_tpu.training import Trainer

    _wait_for_backend()
    kernels_ok = check_kernels() if jax.default_backend() == "tpu" else None

    import os

    cfg = Config()
    cfg.model.grid_type = "occ"
    cfg.model.grid_size = 128
    # RH2 config-family bench (scale > 0.5 -> cascades >= 2, exponential
    # stepping, multi-cascade payload march): VNERF_BENCH_SCALE=1.0
    cfg.model.scale = float(os.environ.get("VNERF_BENCH_SCALE", "0.5"))
    # TPU-native hash layout (roofline route 1): 8 levels x F=4 halves the
    # per-sample gather count vs the reference's 16 x F=2 at the same
    # embedding width.  Measured r5: 176.4k vs 117.3k rays/s (+50%), with
    # converged quality statistically indistinguishable over 5 paired
    # seeds (0.230 +- 0.018 vs 0.239 +- 0.024 mean NND z3 — BASELINE.md).
    # Override with VNERF_BENCH_LEVELS/FEATS=16/2 for the reference layout.
    cfg.model.hash_levels = int(os.environ.get("VNERF_BENCH_LEVELS", "8"))
    cfg.model.hash_features_per_level = int(
        os.environ.get("VNERF_BENCH_FEATS", "4")
    )
    cfg.model.hash_log2_T = 19
    cfg.model.hash_max_res = 1024
    cfg.training.batch_size = 4096
    cfg.training.max_samples_per_ray = 128
    cfg.training.march_candidates = 1024
    # compaction: model runs on <=28 samples/ray on average (the converged
    # occupancy grid leaves most of the 128-sample layout empty; steady
    # state rm ~118k = 28.8/ray).  Validated 2026-08-19: a 2000-step
    # converged quality run at spr=28 matches spr=32 (NeRF nn_mean z3
    # 0.216 vs 0.232, median/coverage slightly better, PSNR identical —
    # /tmp/q_r3_spr{28,32}.json protocol of tools/quality_run.py) while
    # the ~3% overflowing samples cost -4.3 ms/step
    cfg.training.sample_budget = 4096 * 28
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

    train_chunk = trainer._make_train_chunk(CHUNK)
    t0 = jnp.float32(0.0)

    # warmup: compile + converge the occupancy grid to steady-state sparsity
    # (measured: the VIRUS grid reaches its ~2.5% occupied steady state
    # around step 200-250 and per-ray sample counts keep falling until
    # then; warm up past 250 so the timed window measures sustained
    # steady-state throughput, not the transient dense phase)
    for _ in range(288 // CHUNK):
        state, metrics = train_chunk(state, dataset, t0)
    float(metrics["loss"][-1])  # force completion

    # timed run: 200 steps, grid updates included
    n_chunks = 200 // CHUNK
    tic = time.perf_counter()
    for _ in range(n_chunks):
        state, metrics = train_chunk(state, dataset, t0)
    loss = float(metrics["loss"][-1])  # forces the whole chain
    toc = time.perf_counter()

    n_steps = n_chunks * CHUNK
    rays_per_sec = n_steps * cfg.training.batch_size / (toc - tic)
    assert loss == loss, "non-finite loss"
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
                "kernels_ok": kernels_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
