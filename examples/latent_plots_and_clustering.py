"""Latent-space visualization + offset-GP clustering tour.

1. Fit a Bayesian GPLVM on three noisy views of a 1-D latent walk, then render
   the full latent plot family (GPy gpy_plot/latent_plots.py parity):
   ``plot_latent`` (magnification background + scatter + inducing markers),
   ``plot_steepest_gradient_map`` (which output changes fastest where), and
   the kernel's ``plot_ARD`` relevances.
2. Decode new latent points back to data space with ``BayesianGPLVM.predict``
   and locate new observations with ``infer_newX``.
3. Cluster time series that are shifted copies of two distinct curves with the
   greedy offset-GP ``cluster`` (GPy util/cluster_with_offset.py parity) —
   every candidate join in a round is one vmapped padded fit.
"""
import numpy as np


def main(plot=True, outdir=".", seed=0, maxiter=150):
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gplvm import BayesianGPLVM
    from gaussian_process_optimization_tpu.models.inference_x import infer_newX
    from gaussian_process_optimization_tpu.models.parameters import make_packer
    from gaussian_process_optimization_tpu.ops import lbfgs
    from gaussian_process_optimization_tpu.utils.cluster import cluster
    from gaussian_process_optimization_tpu.utils.plotting_library import (
        inject_plotting,
    )

    inject_plotting()
    rng = np.random.default_rng(seed)

    # ---- 1. BGPLVM on three views of one latent walk -----------------------
    t = np.sort(rng.uniform(-2, 2, 30))
    Y = np.stack([np.sin(t), np.cos(t), 0.5 * t], axis=1)
    Y += 0.05 * rng.standard_normal(Y.shape)

    m = BayesianGPLVM.create(Y, input_dim=2, num_inducing=10, seed=seed)
    packer = make_packer(m)
    obj = fit_mod.make_objective(packer)
    res = lbfgs.minimize(lambda u: obj(u, m), packer.pack(m), maxiter=maxiter)
    m = packer.unpack(res.x, reference=m)
    print(f"BGPLVM ELBO after fit: {float(m.elbo()):.2f}")

    if plot:
        m.plot_latent(labels=(t > 0).astype(int),
                      filename=f"{outdir}/latent.png", resolution=25)
        m.plot_steepest_gradient_map(
            resolution=10, output_labels=["sin", "cos", "lin"],
            filename=f"{outdir}/steepest.png")
        m.kern.plot_ARD(filename=f"{outdir}/ard.png")

    # ---- 2. decode + locate new observations -------------------------------
    mu, var = m.predict(m.q_mu[:5])
    rec = float(np.sqrt(np.mean((np.asarray(mu) - np.asarray(m.Y[:5])) ** 2)))
    print(f"decode reconstruction rmse (5 training rows): {rec:.3f}")

    q, _info = infer_newX(m, m.Y[:5], optimize=True, maxiter=100)
    loc_err = float(np.abs(np.asarray(q.mean) - np.asarray(m.q_mu[:5])).max())
    print(f"infer_newX max |X* - X_train| on training rows: {loc_err:.3f}")

    # ---- 3. offset-GP clustering -------------------------------------------
    tt = np.linspace(0, 3, 10)[:, None]
    curves = [np.sin(2 * tt), np.sin(2 * (tt - 0.4)),
              2.0 - 2.0 * tt, 2.0 - 2.0 * (tt - 0.4)]
    data = [c.T + 0.01 * rng.standard_normal((1, 10)) for c in curves]
    inputs = [tt.copy() for _ in curves]
    groups = cluster(data, inputs, maxiter=60)
    print("clusters found:", [sorted(g) for g in groups])
    return m, rec, loc_err, groups


if __name__ == "__main__":
    main()
