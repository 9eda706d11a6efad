"""Round-2 feature tour: EP classification (dense + sparse), entropy-search
acquisitions, periodic state-space GPs, and MRD latent discovery.

Run: python examples/classification_and_latents.py
"""
import numpy as np


def classification_demo(n=40, seed=0, plot=False, out=None):
    """Probit EP classification, dense vs sparse (EPDTC)."""
    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models.classification import (
        GPClassification,
        SparseGPClassification,
    )

    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.uniform(-2, -0.3, n // 2),
                        rng.uniform(0.3, 2, n // 2)])[:, None]
    y = (X[:, 0] > 0).astype(float)
    dense = GPClassification.create(X, y, kernel=kern.RBF.create(1, variance=3.0))
    sparse = SparseGPClassification.create(X, y, num_inducing=8,
                                           kernel=kern.RBF.create(1, variance=3.0))
    Xs = np.linspace(-2, 2, 101)[:, None]
    p_dense = np.asarray(dense.predict(Xs))
    p_sparse = np.asarray(sparse.predict(Xs))
    if plot and out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(7, 4))
        plt.plot(Xs, p_dense, label="dense EP")
        plt.plot(Xs, p_sparse, "--", label="sparse EPDTC (m=8)")
        plt.scatter(X[:, 0], y, c="k", marker="x", label="labels")
        plt.legend()
        plt.savefig(out, bbox_inches="tight")
    return p_dense, p_sparse


def periodic_state_space_demo(n=60, seed=0):
    """Linear-time periodic GP vs its dense equivalent."""
    import jax.numpy as jnp

    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.models.state_space import from_kernel

    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 6, n))[:, None]
    y = np.sin(2 * np.pi * t[:, 0] / 1.5) + 0.1 * rng.standard_normal(n)
    k = kern.StandardPeriodic.create(1, variance=1.0, period=1.5, lengthscale=1.0)
    ss = from_kernel(k, t, y, noise_var=0.05, order=8)
    dense = GPRegression.create(t, y[:, None], kernel=k, noise_var=0.05)
    lml_ss = float(ss.log_marginal_likelihood())
    lml_dense = float(dense.log_marginal_likelihood())
    return lml_ss, lml_dense


def mrd_demo(n=40, seed=0):
    """Two-view MRD: shared + private latent structure via ARD relevance."""
    from gaussian_process_optimization_tpu.models.mrd import MRD, fit_mrd

    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n)
    shared, p1, p2 = np.sin(t), np.cos(3 * t), np.sin(5 * t)
    W1 = rng.standard_normal((2, 5))
    W2 = rng.standard_normal((2, 5))
    Y1 = np.stack([shared, p1], 1) @ W1 + 0.05 * rng.standard_normal((n, 5))
    Y2 = np.stack([shared, p2], 1) @ W2 + 0.05 * rng.standard_normal((n, 5))
    m = MRD.create([Y1, Y2], input_dim=4, num_inducing=10, seed=seed)
    fitted, _ = fit_mrd(m, maxiter=120)
    return np.asarray(fitted.relevance())


def main(plot=False, out=None):
    p_dense, p_sparse = classification_demo(plot=plot, out=out)
    print(f"classification: p(y=1|x=-1.5) dense={p_dense[12]:.3f} "
          f"sparse={p_sparse[12]:.3f}")
    lml_ss, lml_dense = periodic_state_space_demo()
    print(f"periodic state-space LML {lml_ss:.3f} vs dense {lml_dense:.3f} "
          f"(diff {abs(lml_ss - lml_dense):.2e})")
    rel = mrd_demo()
    print("MRD relevance (views x latents):")
    print(np.round(rel / rel.max(axis=1, keepdims=True), 3))
    return lml_ss, lml_dense


if __name__ == "__main__":
    main(plot=True, out="classification.png")
