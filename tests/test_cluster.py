"""Greedy offset-GP time-series clustering (GPy util/cluster_with_offset.py:1)
— the padded vmapped multi-fit must recover the generating group structure and
agree with the GPOffsetRegression model class it batches."""
import numpy as np

from gaussian_process_optimization_tpu.utils.cluster import (
    cluster,
    get_log_likelihood,
    get_log_likelihood_offset,
)


def _two_groups():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 3, 10)[:, None]
    f = lambda x: np.sin(2.0 * x)
    g = lambda x: 2.0 - 2.0 * x
    data, inputs = [], []
    for d, fn in ((0.0, f), (0.4, f), (0.0, g), (0.4, g)):
        data.append(fn(t - d).T + 0.01 * rng.standard_normal((1, 10)))
        inputs.append(t.copy())
    return data, inputs


def test_cluster_recovers_groups():
    """Two shifted copies each of two very different curves: the greedy loop
    must join within groups only (cluster_with_offset.py cluster:92)."""
    data, inputs = _two_groups()
    out = cluster([d.copy() for d in data], [x.copy() for x in inputs],
                  maxiter=60)
    assert sorted(sorted(c) for c in out) == [[0, 1], [2, 3]]


def test_pair_likelihood_and_offset():
    """Same-shape pair: the fitted offset recovers the generating 0.4 input
    shift and its LL beats both the cross-shape pair and the no-offset fit
    (get_log_likelihood_offset:47 / get_log_likelihood:8)."""
    data, inputs = _two_groups()
    ll_same, off = get_log_likelihood_offset(inputs, data, [0, 1], maxiter=60)
    ll_cross, _ = get_log_likelihood_offset(inputs, data, [0, 2], maxiter=60)
    assert abs(abs(off) - 0.4) < 0.05
    assert ll_same > ll_cross + 10
    ll_plain, off0 = get_log_likelihood(inputs, data, [0, 1], maxiter=60)
    assert off0 == 0.0
    assert ll_same > ll_plain  # the offset explains the shift


def test_padded_batch_matches_model_class():
    """The padded vmapped pair fit must agree with fitting the
    GPOffsetRegression model class directly on the unpadded data."""
    from gaussian_process_optimization_tpu.models.zoo import GPOffsetRegression

    data, inputs = _two_groups()
    ll_batch, off_batch = get_log_likelihood_offset(inputs, data, [0, 1],
                                                    maxiter=120)
    X = np.vstack([
        np.hstack([inputs[0], np.zeros((10, 1))]),
        np.hstack([inputs[1], np.ones((10, 1))]),
    ])
    Y = np.vstack([data[0].T, data[1].T])
    m = GPOffsetRegression.create(X, Y, noise_var=1.0)
    m, _ = m.optimize(maxiter=120)
    ll_model = float(m.log_marginal_likelihood())
    # same optimum up to optimizer wiggle (the model class has no offset
    # prior, worth << 1 nat at |offset| ~ 0.4 with std 20)
    assert abs(ll_batch - ll_model) < 1.0
    assert abs(abs(off_batch) - abs(float(m.offset[0]))) < 0.05


def test_merge_alignment_sign():
    """Regression: the greedy merge must apply the fitted offset with the SAME
    sign convention as the pair fit (offset ADDED to cluster j's rows), so the
    merged cluster's offset-free LL equals the pair fit's LL. A flipped sign
    misaligns merged inputs by 2x the shift and corrupts later rounds."""
    data, inputs = _two_groups()
    ll_pair, off = get_log_likelihood_offset(inputs, data, [0, 1], maxiter=60)
    merged_x = [np.vstack([inputs[0], inputs[1] + off])]
    merged_y = [np.hstack([data[0], data[1]])]
    ll_merged, _ = get_log_likelihood(merged_x, merged_y, [0], maxiter=60)
    assert abs(ll_merged - ll_pair) < 1.0
    # and the WRONG sign is catastrophically worse
    wrong_x = [np.vstack([inputs[0], inputs[1] - off])]
    ll_wrong, _ = get_log_likelihood(wrong_x, merged_y, [0], maxiter=60)
    assert ll_wrong < ll_pair - 20
