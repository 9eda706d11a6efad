"""Mixed continuous/discrete design space with the Gower kernel, local-penalization
batches, constraint checks, pool-restricted selection and resumable ask-tell —
every capability of the reference application layer (run.py / test.py) end-to-end:

- mixed 4-discrete + 2-continuous space (run.py define_variables:166-190 shape)
- latin_mixed initial design (the reference author's latin_mixed_design.py)
- pre-check constraints producing penalized objective values
  (run.py pre_check_constraints:266)
- ask-tell with LP batches (test.py:439-508) and finite-pool selection
  (run.py get_configurations:1234-1267)
- state save/resume (run.py spreadsheet persistence, here .npz)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from gaussian_process_optimization_tpu.bo import BayesianOptimization
from gaussian_process_optimization_tpu.bo.designs import initial_design
from gaussian_process_optimization_tpu.bo.pool import metamodel_rmse, suggest_from_pool
from gaussian_process_optimization_tpu.utils import serialization as ser

DOMAIN = [
    {"name": "motor", "type": "discrete", "domain": (0, 1, 2, 3)},
    {"name": "prop", "type": "discrete", "domain": (0, 1, 2, 3, 4)},
    {"name": "battery", "type": "discrete", "domain": (0, 1, 2)},
    {"name": "esc", "type": "discrete", "domain": (0, 1)},
    {"name": "span", "type": "continuous", "domain": (0.5, 2.0)},
    {"name": "chord", "type": "continuous", "domain": (0.05, 0.4)},
]

PENALTY = 50.0


def objective(X):
    """Synthetic stand-in for the drone-configuration objective with a feasibility
    pre-check producing penalized values (run.py pre/post_check_constraints)."""
    X = np.atleast_2d(X)
    motor, prop, battery, esc, span, chord = X.T
    aspect = span / np.maximum(chord, 1e-6)
    drag = 0.1 * chord * span + 0.02 * (prop - 2) ** 2
    weight = 0.3 * motor + 0.2 * battery + 2.0 * chord * span
    efficiency = -np.cos(aspect / 4.0) + 0.05 * (motor - battery) ** 2
    f = drag + 0.3 * weight + efficiency
    infeasible = (aspect > 20) | (esc < motor / 3.0)  # pre-check
    return np.where(infeasible, f + PENALTY, f)[:, None]


def main(iterations=4, batch=3, seed=0, state_file="mixed_bo_state.npz"):
    # f=None (ask-tell) requires X and Y at construction — build the design (or
    # resume it) FIRST, exactly as the reference demands
    from gaussian_process_optimization_tpu.bo.space import DesignSpace

    if Path(state_file).exists():
        X, Y, _ = ser.load_bo_state(state_file)
        print(f"resumed {len(X)} evaluations from {state_file}")
    else:
        X = initial_design("latin_mixed", DesignSpace(DOMAIN), 12, seed=seed)
        Y = objective(X)

    bo = BayesianOptimization(
        f=None,
        domain=DOMAIN,
        X=X,
        Y=Y,
        model_type="GP",
        acquisition_type="EI",
        evaluator_type="local_penalization",
        batch_size=batch,
        Gower=True,
        noise_var=1e-4,
        de_duplication=True,
        seed=seed,
    )

    for it in range(iterations):
        bo.X, bo.Y = X, Y
        batch_X = bo.suggest_next_locations()
        batch_Y = objective(batch_X)
        X = np.vstack([X, batch_X])
        Y = np.vstack([Y, batch_Y])
        print(f"iter {it}: batch =\n{batch_X}\n  best so far: {Y.min():.4f}")
        ser.save_bo_state(bo, state_file)

    # finite-pool selection over the full discrete grid x a continuous slice
    grid = bo.space.get_discrete_grid()
    pool = np.hstack([
        grid,
        np.full((len(grid), 1), 1.2),
        np.full((len(grid), 1), 0.2),
    ])
    idx, picks = suggest_from_pool(bo.evaluator.acquisition, pool, bo.space,
                                   batch_size=3)
    print(f"pool picks (from {len(pool)} configurations):\n{picks}")

    # the BO surrogate is trained on 'stats'-normalized Y — score in those units
    from gaussian_process_optimization_tpu.utils.normalizer import normalize_stats

    rmse = metamodel_rmse(bo.model, X, np.asarray(normalize_stats(Y)))
    print(f"surrogate RMSE on evaluated points (normalized units): {rmse:.4f}")
    print(f"best configuration: {X[np.argmin(Y[:, 0])]}, f = {Y.min():.4f}")
    return X, Y


if __name__ == "__main__":
    main()
