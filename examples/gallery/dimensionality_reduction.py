"""Dimensionality-reduction gallery — mirrors
GPy/GPy/examples/dimensionality_reduction.py (the GPLVM family).

Latent-variable demos over GPLVM / BayesianGPLVM / sparse GPLVM / back-
constrained GPLVM / spike-and-slab GPLVM / MRD, with the reference's simulated
high-dimensional outputs re-created locally. Dataset demos (oil flow, CMU
mocap sticks, brendan/olivetti faces, swiss roll from sklearn) use synthetic
stand-ins of the same shape — downloads are unavailable (zero egress); the
MODEL exercise is identical. `stick_play`/face-animation demos are viewers,
not models, and are out of scope (no display).
"""
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gplvm import (
    BayesianGPLVM, fit_gplvm, make_gplvm)


def _simulate_sincos(N=40, D1=6, D2=5, D3=4, seed=0):
    """The reference's _simulate_sincos (dimensionality_reduction.py:257):
    three output views driven by shared sin/cos latents plus private signals."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, N)
    s1, s2, s3 = np.sin(t), np.cos(t), np.sin(2 * t)
    S1 = np.stack([s1, s2], 1) @ rng.standard_normal((2, D1))
    S2 = np.stack([s1, s3], 1) @ rng.standard_normal((2, D2))
    S3 = np.stack([s2], 1) @ rng.standard_normal((1, D3))
    noise = 0.05
    Ys = [S + noise * rng.standard_normal(S.shape) for S in (S1, S2, S3)]
    return [Y - Y.mean(0) for Y in Ys]


def _oil_like(N=60, D=12, seed=1):
    """Oil-flow stand-in: 3 latent classes in D dims + labels."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((3, D)) * 2.0
    labels = rng.integers(0, 3, N)
    Y = centers[labels] + 0.3 * rng.standard_normal((N, D))
    return Y - Y.mean(0), labels


def bgplvm_test_model(optimize=False, verbose=0, plot=False, output_dim=20,
                      nan=False):
    """dimensionality_reduction.py:8 — construct a BayesianGPLVM on simulated
    data and check the bound is finite (the reference's smoke model)."""
    Ys = _simulate_sincos(N=30, D1=output_dim, D2=4, D3=4)
    m = BayesianGPLVM.create(Ys[0], input_dim=3, num_inducing=8)
    assert np.isfinite(float(m.log_marginal_likelihood()))
    if optimize:
        m = _fit_bgplvm(m, maxiter=60)
    return m


def _fit_bgplvm(m, maxiter):
    import jax

    from gaussian_process_optimization_tpu.models import fit as fit_mod

    fitted, _ = fit_mod.fit(m, num_restarts=1, maxiter=maxiter,
                            key=jax.random.PRNGKey(0))
    return fitted


def gplvm_oil_100(optimize=True, verbose=0, plot=False, max_iters=80):
    """dimensionality_reduction.py:71 — point-estimate GPLVM on the oil data
    (synthetic stand-in; latent classes should separate)."""
    Y, labels = _oil_like(N=50)
    m = make_gplvm(Y, input_dim=2, kernel=kern.RBF.create(2, ARD=True))
    if optimize:
        m, _ = fit_gplvm(m, maxiter=max_iters)
    return m


def sparse_gplvm_oil(optimize=True, verbose=0, plot=False, N=50, Q=2,
                     num_inducing=10, max_iters=50):
    """dimensionality_reduction.py:84 — sparse GPLVM (inducing points)."""
    from gaussian_process_optimization_tpu.models.zoo import fit_sparse_gplvm

    Y, _ = _oil_like(N=N)
    m, _ = fit_sparse_gplvm(Y, input_dim=Q, num_inducing=num_inducing,
                            maxiter=max_iters if optimize else 0)
    return m


def swiss_roll(optimize=True, verbose=0, plot=False, N=80, num_inducing=12,
               Q=3, sigma=0.2, max_iters=60):
    """dimensionality_reduction.py:104 — BGPLVM on a swiss roll (generated
    locally, not sklearn's)."""
    rng = np.random.default_rng(3)
    t = 1.5 * np.pi * (1 + 2 * rng.uniform(size=N))
    h = 21 * rng.uniform(size=N)
    Y = np.stack([t * np.cos(t), h, t * np.sin(t)], 1)
    Y = (Y - Y.mean(0)) / Y.std(0) + sigma * rng.standard_normal((N, 3))
    m = BayesianGPLVM.create(Y, input_dim=Q, num_inducing=num_inducing)
    if optimize:
        m = _fit_bgplvm(m, maxiter=max_iters)
    return m


def bgplvm_oil(optimize=True, verbose=0, plot=False, N=50, Q=3,
               num_inducing=10, max_iters=60, **k):
    """dimensionality_reduction.py:161 — Bayesian GPLVM with ARD on the oil
    stand-in; ARD weights should concentrate on few latents."""
    Y, _ = _oil_like(N=N)
    m = BayesianGPLVM.create(Y, input_dim=Q, num_inducing=num_inducing,
                             kernel=kern.RBF.create(Q, ARD=True))
    if optimize:
        m = _fit_bgplvm(m, maxiter=max_iters)
    return m


def ssgplvm_oil(optimize=True, verbose=0, plot=False, N=40, Q=3,
                num_inducing=8, max_iters=60, **k):
    """dimensionality_reduction.py:191 — spike-and-slab GPLVM (IBP-style
    posterior over active latent dims)."""
    from gaussian_process_optimization_tpu.models.ss_gplvm import (
        SSGPLVM, fit_ssgplvm)

    Y, _ = _oil_like(N=N)
    m = SSGPLVM.create(Y, input_dim=Q, num_inducing=num_inducing)
    if optimize:
        m, _ = fit_ssgplvm(m, maxiter=max_iters)
    return m


def bgplvm_simulation(optimize=True, verbose=0, plot=False, plot_sim=False,
                      max_iters=60):
    """dimensionality_reduction.py:321 — BGPLVM on the simulated sincos
    views."""
    Ys = _simulate_sincos()
    m = BayesianGPLVM.create(Ys[0], input_dim=4, num_inducing=10,
                             kernel=kern.RBF.create(4, ARD=True))
    if optimize:
        m = _fit_bgplvm(m, maxiter=max_iters)
    return m


def gplvm_simulation(optimize=True, verbose=0, plot=False, plot_sim=False,
                     max_iters=80):
    """dimensionality_reduction.py:346 — point GPLVM on the same simulation."""
    Ys = _simulate_sincos()
    m = make_gplvm(Ys[0], input_dim=2, kernel=kern.RBF.create(2, ARD=True))
    if optimize:
        m, _ = fit_gplvm(m, maxiter=max_iters)
    return m


def ssgplvm_simulation(optimize=True, verbose=0, plot=False, plot_sim=False,
                       max_iters=50):
    """dimensionality_reduction.py:369 — spike-and-slab GPLVM, simulation."""
    from gaussian_process_optimization_tpu.models.ss_gplvm import (
        SSGPLVM, fit_ssgplvm)

    Ys = _simulate_sincos(N=30)
    m = SSGPLVM.create(Ys[0], input_dim=3, num_inducing=8)
    if optimize:
        m, _ = fit_ssgplvm(m, maxiter=max_iters)
    return m


def ssgplvm_simulation_linear(max_iters=40, optimize=True, plot=False):
    """dimensionality_reduction.py:702 — SS-GPLVM with a linear kernel on
    linearly-generated data."""
    from gaussian_process_optimization_tpu.models.ss_gplvm import (
        SSGPLVM, fit_ssgplvm)

    rng = np.random.default_rng(4)
    X = rng.standard_normal((30, 2))
    W = rng.standard_normal((2, 8))
    Y = X @ W + 0.05 * rng.standard_normal((30, 8))
    m = SSGPLVM.create(Y - Y.mean(0), input_dim=3, num_inducing=8)
    if optimize:
        m, _ = fit_ssgplvm(m, maxiter=max_iters)
    return m


def bgplvm_simulation_missing_data(optimize=True, verbose=0, plot=False,
                                   max_iters=50, percent_missing=0.3):
    """dimensionality_reduction.py:394 — the missing-data bound: entries of Y
    absent per (point, output) pair, marginalized by the per-output VarDTC
    missing-data bound (GPy's missing_data=True path; here
    SparseGPRegression.missing_data_lml on PCA latents — the same
    vardtc-missing-data machinery GPy's BGPLVM uses)."""
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.models.sparse import (
        SparseGPRegression)

    Ys = _simulate_sincos(N=30)
    Y = Ys[0]
    rng = np.random.default_rng(5)
    mask = (rng.uniform(size=Y.shape) > percent_missing).astype(float)
    # PCA latents as fixed inputs (the point-estimate limit of the demo)
    Yc = Y - Y.mean(0)
    _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
    X0 = Yc @ Vt[:3].T
    m = SparseGPRegression.create(X0, np.where(mask > 0, Y, 0.0),
                                  kernel=kern.RBF.create(3, ARD=True),
                                  num_inducing=8, noise_var=0.1)
    bound = float(m.missing_data_lml(jnp.asarray(mask)))
    assert np.isfinite(bound)
    if optimize:
        from gaussian_process_optimization_tpu.models.parameters import (
            make_packer)
        from gaussian_process_optimization_tpu.ops import lbfgs

        packer = make_packer(m)
        mask_j = jnp.asarray(mask)

        def obj(u, model=m, packer=packer):
            return -packer.unpack(u, reference=model).missing_data_lml(mask_j)

        res = lbfgs.minimize(obj, packer.pack(m), maxiter=max_iters)
        m = packer.unpack(res.x, reference=m)
    return m


def bgplvm_simulation_missing_data_stochastics(optimize=True, verbose=0,
                                               plot=False, max_iters=40,
                                               batch=16):
    """dimensionality_reduction.py:424 — the minibatch (SVI) variant; the
    reference's climin step-rate schedules are replaced by Adam
    (COMPONENTS.md documented substitution)."""
    import jax

    from gaussian_process_optimization_tpu.models.bgplvm_svi import BGPLVM_SVI
    from gaussian_process_optimization_tpu.models.parameters import make_packer

    Ys = _simulate_sincos(N=32)
    m = BGPLVM_SVI.create(Ys[0], input_dim=3, num_inducing=8)
    if optimize:
        import optax

        from gaussian_process_optimization_tpu.models import fit as fit_mod

        packer = make_packer(m, fix=("num_data",))
        opt = optax.adam(1e-2)
        u = packer.pack(m)
        state = opt.init(u)

        @jax.jit
        def step(u, state, idx):
            def loss(u):
                mm = packer.unpack(u, reference=m)
                return -mm.elbo_minibatch(idx)

            val, g = jax.value_and_grad(loss)(u)
            upd, state2 = opt.update(g, state, u)
            return optax.apply_updates(u, upd), state2, val

        rng = np.random.default_rng(0)
        for _ in range(max_iters):
            idx = rng.choice(32, size=batch, replace=False)
            u, state, _ = step(u, state, np.sort(idx))
        m = packer.unpack(u, reference=m)
    return m


def mrd_simulation(optimize=True, verbose=0, plot=False, plot_sim=False,
                   max_iters=60, **kw):
    """dimensionality_reduction.py:455 — Manifold Relevance Determination:
    multiple views share a latent space; per-view ARD separates shared vs
    private latents."""
    from gaussian_process_optimization_tpu.models.mrd import MRD, fit_mrd

    Ys = _simulate_sincos(N=30)
    m = MRD.create(Ys, input_dim=4, num_inducing=8)
    if optimize:
        m, _ = fit_mrd(m, maxiter=max_iters)
    return m


def mrd_simulation_missing_data(optimize=True, verbose=0, plot=False,
                                plot_sim=False, max_iters=40, **kw):
    """dimensionality_reduction.py:475 — MRD with one view's entries knocked
    out (handled by each view's missing-data bound)."""
    from gaussian_process_optimization_tpu.models.mrd import MRD, fit_mrd

    Ys = _simulate_sincos(N=24)
    rng = np.random.default_rng(6)
    # knock out 20% of view 0 by replacing with its column means (the
    # mean-imputation route; full per-entry marginalization lives in
    # BayesianGPLVMMD — see bgplvm_simulation_missing_data)
    mask = rng.uniform(size=Ys[0].shape) < 0.2
    Y0 = np.where(mask, Ys[0].mean(0, keepdims=True), Ys[0])
    m = MRD.create([Y0] + Ys[1:], input_dim=4, num_inducing=8)
    if optimize:
        m, _ = fit_mrd(m, maxiter=max_iters)
    return m


def stick_bgplvm(model=None, optimize=True, verbose=0, plot=False,
                 max_iters=50):
    """dimensionality_reduction.py:640 — BGPLVM on motion-capture-like
    trajectories (synthetic stick-figure stand-in: smooth joint-angle
    curves)."""
    rng = np.random.default_rng(7)
    t = np.linspace(0, 2 * np.pi, 40)
    joints = np.stack([np.sin(2 * t + p) for p in rng.uniform(0, np.pi, 12)], 1)
    Y = joints + 0.03 * rng.standard_normal(joints.shape)
    m = BayesianGPLVM.create(Y, input_dim=2, num_inducing=10,
                             kernel=kern.RBF.create(2, ARD=True))
    if optimize:
        m = _fit_bgplvm(m, maxiter=max_iters)
    return m


def bcgplvm_linear_stick(kernel=None, optimize=True, verbose=0, plot=False,
                         max_iters=50):
    """dimensionality_reduction.py:585 — back-constrained GPLVM with a linear
    back-mapping X = Y A."""
    from gaussian_process_optimization_tpu.models.zoo import fit_bcgplvm

    rng = np.random.default_rng(8)
    t = np.linspace(0, 2 * np.pi, 36)
    Y = np.stack([np.sin(2 * t + p) for p in rng.uniform(0, np.pi, 8)], 1)
    m, _, _ = fit_bcgplvm(Y, input_dim=2,
                          maxiter=max_iters if optimize else 0)
    return m


def bcgplvm_stick(kernel=None, optimize=True, verbose=0, plot=False,
                  max_iters=50):
    """dimensionality_reduction.py:605 — back-constrained GPLVM with a KERNEL
    back-mapping X = K(Y, Y) A."""
    from gaussian_process_optimization_tpu.models.mean_functions import (
        KernelMapping)
    from gaussian_process_optimization_tpu.models.zoo import fit_bcgplvm

    rng = np.random.default_rng(9)
    t = np.linspace(0, 2 * np.pi, 36)
    Y = np.stack([np.sin(2 * t + p) for p in rng.uniform(0, np.pi, 8)], 1)
    mapping = KernelMapping.create(Y.shape[1], 2, Z=Y,
                                   kernel=kern.RBF.create(Y.shape[1]))
    m, _, _ = fit_bcgplvm(Y, input_dim=2, mapping=mapping,
                          maxiter=max_iters if optimize else 0)
    return m


def robot_wireless(optimize=True, verbose=0, plot=False, max_iters=60):
    """dimensionality_reduction.py:626 — GPLVM recovers the robot's 1-D path
    from WiFi signal strengths (synthetic stand-in as in regression)."""
    rng = np.random.default_rng(10)
    path = np.linspace(0, 2 * np.pi, 50)
    pos = np.stack([np.cos(path), np.sin(path)], 1)
    aps = rng.uniform(-1.5, 1.5, (6, 2))
    d = np.linalg.norm(pos[:, None, :] - aps[None], axis=-1)
    Y = -30 - 20 * np.log10(d + 0.1) + 0.5 * rng.standard_normal(d.shape)
    Y = (Y - Y.mean(0)) / Y.std(0)
    m = make_gplvm(Y, input_dim=2, kernel=kern.RBF.create(2, ARD=True))
    if optimize:
        m, _ = fit_gplvm(m, maxiter=max_iters)
    return m
