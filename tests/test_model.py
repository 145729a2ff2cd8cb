"""Model + renderer tests: shapes, gradients, and an overfit sanity check."""

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.models import NGPModel, render_rays
from virus_nerf_tpu.ops.triplane import TriPlaneSpec, triplane_encode


def _small_model(**kw):
    defaults = dict(
        scale=0.5, levels=4, log2_T=12, base_res=4, max_res=32, grid_size=16
    )
    defaults.update(kw)
    return NGPModel(**defaults)


def test_forward_shapes():
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    sigma, rgb = model.forward(params, x, d)
    assert sigma.shape == (64,)
    assert rgb.shape == (64, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))
    # batched (N, S, 3) layout also works
    sigma2, rgb2 = model.forward(params, x.reshape(8, 8, 3), d.reshape(8, 8, 3))
    assert sigma2.shape == (8, 8)
    assert rgb2.shape == (8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(sigma2.reshape(-1)), np.asarray(sigma), rtol=1e-5
    )


def test_mixed_precision_mode():
    """'mixed' = f32 params, bf16 compute (reference fp16-autocast parity,
    training/trainer.py:104): params/grads stay f32, outputs close to f32
    mode within bf16 tolerance."""
    m32 = _small_model(compute_dtype="float32")
    mmx = _small_model(compute_dtype="mixed")
    params = m32.init(jax.random.PRNGKey(0))
    assert params.pos_table.dtype == jnp.float32
    assert mmx.init(jax.random.PRNGKey(0)).pos_table.dtype == jnp.float32

    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    s32, c32 = m32.forward(params, x, d)
    smx, cmx = mmx.forward(params, x, d)
    assert smx.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(smx), np.asarray(s32), rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(cmx), np.asarray(c32), atol=0.05)

    g = jax.grad(lambda p: jnp.mean(mmx.density(p, x)))(params)
    assert g.pos_table.dtype == jnp.float32
    assert float(jnp.sum(jnp.abs(g.pos_table))) > 0


def test_density_grad_flows():
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.4, maxval=0.4)

    def loss(p):
        return jnp.mean(model.density(p, x))

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g.pos_table))) > 0
    assert float(jnp.sum(jnp.abs(g.xyz_w[0]))) > 0
    # rgb net unused by density
    assert float(jnp.sum(jnp.abs(g.rgb_w[0]))) == 0


def test_triplane_encoder(rng):
    spec = TriPlaneSpec.create(base_res=4, max_res=32, levels=4, feat_dim=2)
    planes = jnp.asarray(rng.random(spec.total_params).astype(np.float32))
    xyz = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    out = triplane_encode(planes, xyz, spec)
    assert out.shape == (16, spec.out_dim)
    # product structure: all-ones planes -> all-ones output
    ones = jnp.ones(spec.total_params)
    np.testing.assert_allclose(
        np.asarray(triplane_encode(ones, xyz, spec)), 1.0, rtol=1e-5
    )
    # gradient flows
    g = jax.grad(lambda p: jnp.sum(triplane_encode(p, xyz, spec)))(planes)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_triplane_model_variant():
    model = _small_model(pos_encoder_type="triplane", max_res=32)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    sigma, rgb = model.forward(params, x, d)
    assert sigma.shape == (16,)


def test_render_rays_end_to_end():
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.cascades, model.grid_size**3), jnp.bool_)
    n = 32
    key = jax.random.PRNGKey(3)
    o = jnp.zeros((n, 3))
    th = jnp.linspace(0, 2 * jnp.pi, n)
    d = jnp.stack([jnp.cos(th), jnp.sin(th), jnp.zeros(n)], 1)

    out = render_rays(
        model, params, occ, o, d, key, max_samples=64, n_candidates=256
    )
    assert out["rgb"].shape == (n, 3)
    assert out["depth"].shape == (n,)
    assert int(out["rm_samples"]) > 0
    assert np.all(np.isfinite(np.asarray(out["rgb"])))

    # gradient through the whole render path
    def loss(p):
        r = render_rays(
            model, p, occ, o, d, key, max_samples=64, n_candidates=256
        )
        return jnp.mean(r["rgb"] ** 2) + jnp.mean(r["depth"] ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jnp.sum(jnp.abs(g.pos_table))))
    assert float(jnp.sum(jnp.abs(g.rgb_w[0]))) > 0


def test_overfit_single_color():
    """The model + renderer must be able to overfit a constant target —
    the minimal 'learning works' check."""
    import optax

    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    occ = jnp.ones((model.cascades, model.grid_size**3), jnp.bool_)
    n = 64
    o = jnp.zeros((n, 3))
    key = jax.random.PRNGKey(4)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    target = jnp.tile(jnp.array([[0.2, 0.7, 0.4]]), (n, 1))

    opt = optax.adam(1e-2, eps=1e-15)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            r = render_rays(
                model, p, occ, o, d, key, max_samples=32, n_candidates=128
            )
            return jnp.mean((r["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[::10]
