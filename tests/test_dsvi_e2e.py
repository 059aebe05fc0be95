"""End-to-end DSVI: short training on the shipped reference fixture.

Uses the reference's own simulation pickle as a fixed fixture
(SURVEY.md §4: shipped pickles as fixtures).  Full parity (2000 epochs,
10 seeds) runs in scripts/sim_parity.py; here a short run checks the
training loop plumbing: loss decreases, ELBO improves, prediction APIs
produce sane output, checkpoint round-trips.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
    apply_hyperpars,
    inference,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import cnmgp
from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.predict import (
    predict_Y,
    sample_FY,
    sample_Y,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import (
    load_sim_pickle,
)

PICKLE = "/root/reference/data/simulation/sim_illustration_low_freq.pickle"
HYPERPARS = {
    "sigma2_L0_log": 0,
    "length_scales_L0_log": 2,
    "sigma2_L1_log": 0,
    "length_scales_L1_log": 2,
    "sigma2_tildeell_log": 0,
    "length_scales_tildeell_log": 0,
    "sigma2_err_log": -2,
}


@pytest.fixture(scope="module")
def trained():
    X_list, Y_list, Xt_list, Yt_list = load_sim_pickle(PICKLE)
    z = np.linspace(0, 1, 10)
    res = inference(
        X_list,
        Y_list,
        z,
        batch_size=0,
        dim_outputs=2,
        lr=0.01,
        itnum=150,
        hyperpars=HYPERPARS,
        fix_hyperpars=True,
        seed=0,
        show_ELBO=True,
        elbo_every=50,
        elbo_samples=30,
    )
    return res, (X_list, Y_list, Xt_list, Yt_list)


def test_loss_decreases(trained):
    res, _ = trained
    losses = np.asarray(res.loss_list)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_elbo_improves(trained):
    res, _ = trained
    assert res.elbo_trace[-1] > res.elbo_trace[0]


def test_hyperpars_applied_and_frozen(trained):
    res, _ = trained
    # frozen length scales keep their override values exactly
    assert float(res.params.length_scales_L0_log) == 2.0
    assert float(res.params.length_scales_tildeell_log) == 0.0
    # non-frozen hyperparameters moved
    assert float(res.params.sigma2_err_log) != -2.0


def test_sample_Y_shapes_and_quality(trained):
    res, (X_list, Y_list, Xt_list, Yt_list) = trained
    ys, ls, gs, tes = sample_Y(res.params, res.Z, Xt_list, n_sample=50, seed=0)
    n_test = sum(len(np.asarray(x).reshape(-1)) for x in Xt_list)
    assert ys.shape == (50, n_test)
    assert ls.shape == (50, n_test, 2)
    assert gs.shape == (50, 2, n_test)
    assert tes.shape == (50, n_test)
    # posterior-mean RMSE should beat the trivial predictor after 150 epochs
    y_test = np.concatenate([np.asarray(y).reshape(-1) for y in Yt_list])
    rmse = np.sqrt(np.mean((ys.mean(0) - y_test) ** 2))
    assert rmse < np.std(y_test)


def test_sample_FY_correlations_valid(trained):
    res, _ = trained
    grid = np.linspace(0, 1, 20)
    tes, ys, corrs = sample_FY(res.params, res.Z, grid, n_sample=20, seed=0)
    assert corrs.shape == (20, 20, 2, 2)
    d = np.diagonal(corrs, axis1=-2, axis2=-1)
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    assert np.all(np.abs(corrs) <= 1.0 + 1e-6)


def test_predict_Y_matches_sample_mean(trained):
    res, (X_list, Y_list, Xt_list, Yt_list) = trained
    est = predict_Y(res.params, res.Z, Xt_list)
    ys, _, _, _ = sample_Y(res.params, res.Z, Xt_list, n_sample=400, seed=1)
    # plug-in mean and posterior-mean-of-draws agree loosely (nonlinearities
    # in exp(L_ii) make them differ at second order)
    corr = np.corrcoef(est, ys.mean(0))[0, 1]
    assert corr > 0.9


def test_checkpoint_roundtrip(tmp_path, trained):
    res, (X_list, Y_list, *_ ) = trained
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import (
        checkpoint as ckpt,
    )

    path = os.path.join(tmp_path, "model.ckpt")
    import optax

    opt_state = optax.adam(0.01).init(res.params)
    ckpt.save_train_state(path, res.params, opt_state, epoch=150, loss=1.0)
    p2, o2 = ckpt.load_train_state(path, res.params, opt_state)
    for a, b in zip(jax.tree_util.tree_leaves(res.params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_bf16_moments_roundtrip(tmp_path, trained):
    """save_train_state(moments_dtype=bf16) must halve the stored moment
    bytes, keep params bit-exact, and load_train_state must restore the
    optimizer state to the f32 dtypes of `opt_state_like` with values
    within bf16 quantization (docs/DESIGN.md §17.3 checkpoint-IO fix)."""
    res, _ = trained
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import (
        checkpoint as ckpt,
    )
    import optax

    opt = optax.adam(0.01)
    opt_state = opt.init(res.params)
    # make the moments nonzero so quantization is actually exercised
    grads = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 0.321), res.params
    )
    _, opt_state = opt.update(grads, opt_state, res.params)

    p_f32 = os.path.join(tmp_path, "f32.ckpt")
    p_bf16 = os.path.join(tmp_path, "bf16.ckpt")
    ckpt.save_train_state(p_f32, res.params, opt_state)
    ckpt.save_train_state(
        p_bf16, res.params, opt_state, moments_dtype=jnp.bfloat16
    )
    assert os.path.getsize(p_bf16) < 0.75 * os.path.getsize(p_f32)

    p2, o2 = ckpt.load_train_state(p_bf16, res.params, opt_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(res.params), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype  # restored to the like tree's dtype
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=2 ** -8, atol=1e-12)


def test_apply_hyperpars_intended_semantics():
    """The reference writes sigma2_L1_log into sigma2_L0_log
    (nmgp_dsvi.py:784-785, copy-paste bug); we implement the intent."""
    params = cnmgp.init_params(jax.random.PRNGKey(0), 2, 4, dtype=jnp.float64)
    out = apply_hyperpars(params, {"sigma2_L1_log": 3.0})
    assert float(out.sigma2_L1_log) == 3.0
    assert float(out.sigma2_L0_log) == float(params.sigma2_L0_log)


def test_inference_resume_from_checkpoint(tmp_path):
    """continuous_training=True resumes params+optimizer from PATH
    (reference nmgp_dsvi.py:789-792)."""
    X_list, Y_list, _, _ = load_sim_pickle(PICKLE)
    z = np.linspace(0, 1, 6)
    path = os.path.join(tmp_path, "ckpt.pkl")
    res1 = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=20,
        hyperpars=HYPERPARS, seed=0, show_ELBO=False, PATH=path, save_model=True,
    )
    res2 = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=10,
        hyperpars=HYPERPARS, seed=0, show_ELBO=False, PATH=path,
        continuous_training=True,
    )
    # resumed run must start near the saved loss, far below a fresh start
    fresh_first = res1.loss_list[0]
    resumed_first = res2.loss_list[0]
    assert resumed_first < 0.7 * fresh_first


def test_chunked_dispatch_rng_invariance():
    """The dispatch-budget driver chunks epochs across dispatches at
    timing-dependent boundaries; training must be bit-identical however the
    epochs are chunked (pre-stacked per-epoch keys, infer/dsvi.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        freeze_mask,
        make_scan_epochs,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import cnmgp

    D, M, N, B = 2, 4, 20, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.random(N)))
    y = jnp.sin(5 * x)
    idx = jnp.asarray(rng.integers(0, D, N).astype(np.int32))
    Z = jnp.linspace(0.0, 1.0, M, dtype=x.dtype)
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, M, dtype=x.dtype)
    opt = optax.adam(0.01)
    st = opt.init(params)
    mask = freeze_mask(params, True)
    nb = -(-N // B)
    run = make_scan_epochs(opt, float(N), 1e-4, nb, B)

    keys = jax.random.split(jax.random.PRNGKey(9), 6)

    # monolithic: all 6 epochs in one dispatch
    p1, s1, l1 = run(params, st, mask, Z, x, y, idx, keys, 6)
    # chunked 1 + 2 + 3
    p2, s2 = params, st
    losses = []
    for lo, hi in [(0, 1), (1, 3), (3, 6)]:
        p2, s2, l = run(p2, s2, mask, Z, x, y, idx, keys[lo:hi], hi - lo)
        losses.append(np.asarray(l))
    np.testing.assert_array_equal(np.asarray(l1), np.concatenate(losses))
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # single-key API unchanged: splitting inside run == passing the stack
    p3, _, l3 = run(params, st, mask, Z, x, y, idx, jax.random.PRNGKey(9), 6)
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(l1))


def test_small_elbo_every_no_duplicate_epochs(capsys):
    """elbo_every < calibration length must not re-train epochs or compute
    negative chunks (ADVICE r3: chunk = next_probe - epoch could go
    negative after the calibration dispatches, double-applying an Adam
    update with the same RNG key)."""
    X_list, Y_list, _, _ = load_sim_pickle(PICKLE)
    z = np.linspace(0, 1, 6)
    res = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=8,
        hyperpars=HYPERPARS, seed=0, show_ELBO=True, elbo_every=1,
        elbo_samples=5,
    )
    # each epoch trained exactly once
    assert len(res.loss_list) == 8
    # one probe per epoch boundary
    assert len(res.elbo_trace) == 8
    # and the trajectory matches an elbo_every=100 run (same RNG stream;
    # tolerance only for XLA fusion differences across scan lengths — a
    # double-applied Adam update would diverge by orders more)
    res2 = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=8,
        hyperpars=HYPERPARS, seed=0, show_ELBO=True, elbo_every=100,
        elbo_samples=5,
    )
    np.testing.assert_allclose(
        np.asarray(res.loss_list), np.asarray(res2.loss_list), rtol=1e-4
    )


def test_checkpoint_legacy_dense_U_migration(tmp_path):
    """Checkpoints from before the packed-U layout hold dense (D, D, M[,M])
    mu_U/sqrt_U; load_train_state must auto-pack them (ADVICE r3)."""
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import (
        checkpoint as ckpt,
    )

    D, M = 3, 5
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, M, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    dense_mu = rng.standard_normal((D, D, M))
    dense_sqrt = rng.standard_normal((D, D, M, M))
    legacy = params._replace(
        mu_U=jnp.asarray(dense_mu), sqrt_U=jnp.asarray(dense_sqrt)
    )
    legacy_opt = optax.adam(0.01).init(legacy)
    path = os.path.join(tmp_path, "legacy.ckpt")
    ckpt.save_train_state(path, legacy, legacy_opt, epoch=1, loss=0.0)

    opt_state = optax.adam(0.01).init(params)
    p2, o2 = ckpt.load_train_state(path, params, opt_state)
    np.testing.assert_allclose(
        np.asarray(p2.mu_U), np.asarray(cnmgp.pack_U(dense_mu))
    )
    np.testing.assert_allclose(
        np.asarray(p2.sqrt_U), np.asarray(cnmgp.pack_U(dense_sqrt))
    )
    # optimizer moments migrated to the packed shapes too
    for leaf, ref_leaf in zip(
        jax.tree_util.tree_leaves(o2), jax.tree_util.tree_leaves(opt_state)
    ):
        assert np.shape(leaf) == np.shape(ref_leaf)

    # a mismatched legacy layout that is NOT the dense-U pattern raises
    bad = params._replace(mu_v=jnp.zeros(M + 1))
    bad_opt = optax.adam(0.01).init(bad)
    path2 = os.path.join(tmp_path, "bad.ckpt")
    ckpt.save_train_state(path2, bad, bad_opt)
    with pytest.raises(ValueError, match="legacy checkpoint layout"):
        ckpt.load_train_state(path2, params, opt_state)


def test_grad_clip_option_wires_through():
    """inference(grad_clip_norm=...) trains finitely and differs from the
    unclipped run only when clipping is active (tiny threshold here)."""
    X_list, Y_list, _, _ = load_sim_pickle(PICKLE)
    z = np.linspace(0, 1, 6)
    res_clip = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=6,
        hyperpars=HYPERPARS, seed=0, show_ELBO=False, grad_clip_norm=1.0,
    )
    res_free = inference(
        X_list, Y_list, z, batch_size=0, dim_outputs=2, lr=0.01, itnum=6,
        hyperpars=HYPERPARS, seed=0, show_ELBO=False,
    )
    a = np.asarray(res_clip.loss_list)
    b = np.asarray(res_free.loss_list)
    assert np.all(np.isfinite(a))
    # initial gradients are far above norm 1, so the clipped trajectory
    # must actually differ
    assert not np.allclose(a, b)


def test_adam_bf16_moments_tracks_f32_adam():
    """adam_bf16_moments (bf16 moment STORAGE, f32 compute) must follow
    optax.adam closely on a quadratic — the storage rounding adds noise far
    below the stochastic-ELBO gradient noise it is deployed under
    (infer/optimizers.py; the ECoG Adam-HBM lever of docs/DESIGN.md §14)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.optimizers import (
        adam_bf16_moments,
    )

    def loss(p):
        return jnp.sum((p["a"] - 1.5) ** 2) + jnp.sum((p["b"] + 0.5) ** 2)

    p0 = {"a": jnp.zeros(16, jnp.float32), "b": jnp.ones(8, jnp.float32)}

    def run(opt):
        p = p0
        st = opt.init(p)
        for _ in range(60):
            g = jax.grad(loss)(p)
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
        return p

    p_ref = run(optax.adam(0.05))
    p_bf = run(adam_bf16_moments(0.05))
    for k in p0:
        np.testing.assert_allclose(
            np.asarray(p_bf[k]), np.asarray(p_ref[k]), atol=5e-2
        )
    # moments really are stored in bf16
    opt = adam_bf16_moments(0.05)
    st = opt.init(p0)
    assert st[0].mu["a"].dtype == jnp.bfloat16
    assert st[0].nu["b"].dtype == jnp.bfloat16


def test_divergence_rollback_recovers_and_is_inert_when_healthy():
    """inference(divergence_rollback=True): a diverging run (absurd lr)
    triggers rollbacks with the injected lr halving each time; a healthy
    run takes zero rollbacks and its trajectory is bit-compatible with the
    unguarded path (the guard only observes)."""
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import (
        load_sim_pickle,
    )

    X_list, Y_list, _, _ = load_sim_pickle(
        "/root/reference/data/simulation/sim_illustration_low_freq.pickle"
    )
    z = np.linspace(0, 1, 8)

    bad = inference(X_list, Y_list, z, batch_size=64, dim_outputs=2,
                    itnum=8, lr=30.0, show_ELBO=False,
                    divergence_rollback=True, max_rollbacks=4)
    assert bad.rollbacks >= 1
    assert np.all(np.isfinite(np.asarray(bad.loss_list)))

    ok_g = inference(X_list, Y_list, z, batch_size=64, dim_outputs=2,
                     itnum=6, lr=0.01, show_ELBO=False,
                     divergence_rollback=True)
    ok_u = inference(X_list, Y_list, z, batch_size=64, dim_outputs=2,
                     itnum=6, lr=0.01, show_ELBO=False)
    assert ok_g.rollbacks == 0
    np.testing.assert_allclose(
        np.asarray(ok_g.loss_list), np.asarray(ok_u.loss_list), rtol=1e-5
    )

    # incompatible-with-schedule guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divergence_rollback"):
        inference(X_list, Y_list, z, batch_size=64, dim_outputs=2,
                  itnum=4, lr=0.01, lr_decay=0.99, show_ELBO=False,
                  divergence_rollback=True)


def test_inference_accepts_optax_schedule_lr():
    """`lr` may be any optax schedule (warmup/cosine/...) — optax.adam
    consumes callables natively, so schedules beyond the lr_decay knob are
    first-class."""
    import numpy as np
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import (
        load_sim_pickle,
    )

    X_list, Y_list, _, _ = load_sim_pickle(
        "/root/reference/data/simulation/sim_illustration_low_freq.pickle"
    )
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=0.02, warmup_steps=5, decay_steps=30
    )
    res = inference(X_list, Y_list, np.linspace(0, 1, 8), batch_size=64,
                    dim_outputs=2, itnum=6, lr=sched, show_ELBO=False)
    assert np.all(np.isfinite(np.asarray(res.loss_list)))
