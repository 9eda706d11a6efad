"""Smoke-run the examples gallery (the reference's examples_tests.py genre)."""
import os
import sys

import numpy as np

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_forrester_gp_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import forrester_gp

    model = forrester_gp.main(n=12, plot=True, out=str(tmp_path / "f.png"))
    assert (tmp_path / "f.png").exists()
    assert float(model.kern.lengthscale) > 0


def test_classification_and_latents_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import classification_and_latents

    lml_ss, lml_dense = classification_and_latents.main(
        plot=True, out=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()
    assert abs(lml_ss - lml_dense) < 1e-3 * max(1.0, abs(lml_dense))


def test_branin_bo_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import branin_bo

    bo = branin_bo.main(max_iter=3, plot=False)
    assert bo.Y.shape[0] == 8


def test_mixed_design_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import mixed_design_batch

    X, Y = mixed_design_batch.main(iterations=1, batch=2,
                                   state_file=str(tmp_path / "st.npz"))
    assert X.shape[0] == 14  # 12 init + 2 batch
    # resume path
    X2, Y2 = mixed_design_batch.main(iterations=1, batch=2,
                                     state_file=str(tmp_path / "st.npz"))
    assert X2.shape[0] >= 14


def test_multichip_bo_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import multichip_bo

    bo = multichip_bo.main(max_iter=3, seed=0)
    assert bo.Y.shape[0] == 8 and np.isfinite(bo.fx_opt)


def test_latent_inference_example(tmp_path, monkeypatch):
    import examples.latent_inference as ex

    rmse = ex.infer_newx_demo(n=30, maxiter=150)
    assert rmse < 0.3
    m_mh, m_hmc, rate = ex.mcmc_tail_demo(num_samples=800)
    assert 0.05 < rate < 0.95
    assert abs(m_mh[0] - 1.0) < 0.5 and abs(m_hmc[0] - 1.0) < 0.5


def test_latent_plots_and_clustering_example(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from examples import latent_plots_and_clustering

    m, rec, loc_err, groups = latent_plots_and_clustering.main(
        plot=True, outdir=str(tmp_path), maxiter=80)
    for f in ("latent.png", "steepest.png", "ard.png"):
        assert (tmp_path / f).exists(), f
    assert np.isfinite(rec) and np.isfinite(loc_err)
    assert sorted(sorted(g) for g in groups) == [[0, 1], [2, 3]]


@pytest.mark.slow
def test_uncertainty_quantification_example():
    from examples import uncertainty_quantification

    m, mt, mw, sv = uncertainty_quantification.main()
    Xs = np.linspace(-2, 2, 5)[:, None]
    lo, hi = m.predict_quantiles(Xs)
    tlo, thi = mt.predict_quantiles(Xs)
    # the TP's t-ppf bands are strictly wider than the GP's Gaussian bands
    # at matched moments (White kernel matches the noise floor)
    assert np.all(np.asarray(thi - tlo) > np.asarray(hi - lo))
