"""Design space (GPyOpt/GPyOpt/core/task/space.py:13 `Design_space`).

Holds the mixed continuous/discrete/categorical/bandit domain with the model-space vs
objective-space duality (one-hot categorical expansion, :133), zip/unzip transforms
(:220-236), bounds (:263), per-variable rounding (:328), indicator constraints (:303),
plus the reference author's additions: has_discrete:280, lengthscales:352 (continuous
value ranges for the Gower kernel), zeroStart_shifted_bounds:364, get_discrete_values:460,
get_discrete_grid:473.

Constraints are Python callables c(x_2d) -> (n,) with the convention c(x) <= 0 feasible;
string expressions in x (e.g. "x[:,0]+x[:,1]-1") are also accepted for config-file parity
with the reference (which exec's them, space.py:303) — evaluated with numpy only.
"""
from __future__ import annotations

import itertools

import numpy as np

from .variables import (
    BanditVariable,
    CategoricalVariable,
    ContinuousVariable,
    DiscreteVariable,
    InvalidConfigError,
    Variable,
    create_variable,
)


class DesignSpace:
    def __init__(self, space, constraints=None):
        """space: list of GPyOpt-style dicts (name/type/domain/dimensionality) or
        Variable objects. constraints: list of dicts {'name','constraint'} where
        constraint is a callable or a numpy string expression in x."""
        self.config_space = space
        vars_in = [v if isinstance(v, Variable) else create_variable(v) for v in space]
        # expand dimensionality>1 (space.py:193)
        self.space = vars_in
        self.space_expanded: list[Variable] = []
        for v in vars_in:
            self.space_expanded.extend(v.expand())
        names = [v.name for v in self.space_expanded]
        if len(set(names)) != len(names):
            raise InvalidConfigError(f"duplicate variable names in {names}")
        self.constraints = list(constraints) if constraints else []

        # objective-space dimensionality and model-space dimensionality
        # (bandit variables occupy several objective columns; others one each)
        self.objective_dimensionality = sum(
            v.dimensionality if v.is_bandit else 1 for v in self.space_expanded
        )
        self.model_dimensionality = sum(
            v.dimensionality_in_model for v in self.space_expanded
        )
        # per-variable index ranges in model space (space.py:133) and objective space
        self._model_slices = []
        self._objective_slices = []
        midx = oidx = 0
        for v in self.space_expanded:
            self._model_slices.append(slice(midx, midx + v.dimensionality_in_model))
            midx += v.dimensionality_in_model
            owidth = v.dimensionality if v.is_bandit else 1
            self._objective_slices.append(slice(oidx, oidx + owidth))
            oidx += owidth

    # ------------------------------------------------------------------ queries
    def has_types(self):
        return {
            t: any(v.type == t for v in self.space_expanded)
            for t in ("continuous", "discrete", "categorical", "bandit")
        }

    def has_continuous(self):
        return any(v.is_continuous for v in self.space_expanded)

    def has_discrete(self):
        """Author's addition (space.py:280)."""
        return any(v.is_discrete for v in self.space_expanded)

    def has_constraints(self):
        return len(self.constraints) > 0

    def get_continuous_dims(self):
        """Objective-space column indices of continuous variables."""
        return [
            self._objective_slices[i].start
            for i, v in enumerate(self.space_expanded)
            if v.is_continuous
        ]

    def get_discrete_dims(self):
        return [
            self._objective_slices[i].start
            for i, v in enumerate(self.space_expanded)
            if v.is_discrete
        ]

    def get_categorical_dims(self):
        return [
            self._objective_slices[i].start
            for i, v in enumerate(self.space_expanded)
            if v.is_categorical
        ]

    def get_continuous_space(self):
        return [v for v in self.space_expanded if v.is_continuous]

    def get_discrete_space(self):
        return [v for v in self.space_expanded if v.is_discrete]

    # ------------------------------------------------------------------ bounds
    def get_bounds(self):
        """Model-space bounds (space.py:263)."""
        bounds = []
        for v in self.space_expanded:
            bounds.extend(v.get_bounds())
        return bounds

    def get_continuous_bounds(self):
        return [v.get_bounds()[0] for v in self.space_expanded if v.is_continuous]

    def lengthscales(self):
        """Continuous value ranges — the Gower kernel normalizers (author's addition,
        space.py:352)."""
        return [
            v.domain[-1] - v.domain[0] for v in self.space_expanded if v.is_continuous
        ]

    def zeroStart_shifted_bounds(self):
        """Author's addition (space.py:364)."""
        return [(0, v.domain[-1] - v.domain[0]) for v in self.space_expanded]

    def fit_to_zeroStart_shifted_bounds(self, X):
        shifts = np.asarray([v.domain[0] for v in self.space_expanded], dtype=float)
        return np.asarray(X, dtype=float) - shifts

    def revert_from_zeroStart_shifted_bounds(self, X):
        shifts = np.asarray([v.domain[0] for v in self.space_expanded], dtype=float)
        return np.asarray(X, dtype=float) + shifts

    def get_discrete_values(self):
        """Allowed values per discrete variable (author's addition, space.py:460)."""
        return [list(v.domain) for v in self.space_expanded if v.is_discrete]

    def get_discrete_grid(self):
        """Cartesian product over discrete variables (space.py:473)."""
        discrete = self.get_discrete_values()
        return np.asarray(list(itertools.product(*discrete)), dtype=float)

    # ------------------------------------------------------------------ transforms
    def objective_to_model(self, x_obj):
        """One row, objective -> model coordinates (one-hot expand categoricals)."""
        out = []
        x_obj = np.asarray(x_obj)
        for v, osl in zip(self.space_expanded, self._objective_slices):
            val = x_obj[osl] if v.is_bandit else x_obj[osl][0]
            out.extend(v.objective_to_model(val))
        return out

    def model_to_objective(self, x_model):
        out = []
        for v, sl in zip(self.space_expanded, self._model_slices):
            val = v.model_to_objective(list(np.asarray(x_model)[sl]))
            if v.is_bandit:
                out.extend(val)
            else:
                out.append(val)
        return out

    def unzip_inputs(self, X):
        """(n, objective_dim) -> (n, model_dim) one-hot expansion (space.py:220)."""
        X = np.atleast_2d(np.asarray(X, dtype=float))
        return np.asarray([self.objective_to_model(row) for row in X], dtype=float)

    def zip_inputs(self, X):
        """(n, model_dim) -> (n, objective_dim) (space.py:228)."""
        X = np.atleast_2d(np.asarray(X, dtype=float))
        return np.asarray(
            [self.model_to_objective(row) for row in X], dtype=float
        )

    def round_optimum(self, x):
        """Round a model-space point variable-by-variable (space.py:328)."""
        x = np.asarray(x, dtype=float).ravel()
        out = []
        for v, sl in zip(self.space_expanded, self._model_slices):
            out.extend(v.round(x[sl]))
        return np.atleast_2d(np.asarray(out, dtype=float))

    # ------------------------------------------------------------------ constraints
    def indicator_constraints(self, x):
        """{0,1} feasibility per row, c(x)<=0 convention (space.py:303). Accepts
        callables or numpy string expressions (the reference exec's strings)."""
        x = np.atleast_2d(np.asarray(x, dtype=float))
        ind = np.ones((x.shape[0], 1))
        for c in self.constraints:
            expr = c["constraint"] if isinstance(c, dict) else c
            if callable(expr):
                vals = np.asarray(expr(x), dtype=float).reshape(x.shape[0], -1)
                fail = np.any(vals > 0, axis=1)
            else:
                vals = eval(expr, {"np": np, "numpy": np, "x": x})  # noqa: S307
                fail = np.asarray(vals, dtype=float).reshape(x.shape[0], -1)
                fail = np.any(fail > 0, axis=1)
            ind[fail, :] = 0.0
        return ind

    # ------------------------------------------------------------------ sampling
    def sample_uniform(self, n, rng):
        """Uniform feasible-agnostic samples in model space via per-variable draws,
        returned in OBJECTIVE space."""
        cols = []
        for v in self.space_expanded:
            if v.is_continuous:
                lo, hi = v.domain[0], v.domain[-1]
                cols.append(rng.uniform(lo, hi, size=n))
            elif v.is_bandit:
                idx = rng.integers(0, v.domain.shape[0], size=n)
                for d in range(v.domain.shape[1]):
                    cols.append(v.domain[idx, d])
                continue
            else:
                vals = np.asarray(v.domain, dtype=float)
                cols.append(vals[rng.integers(0, len(vals), size=n)])
        return np.stack(cols, axis=1)

    def input_dim(self):
        return self.objective_dimensionality


def bounds_to_space(bounds):
    """Legacy [(lo,hi),...] -> space dicts (space.py:519)."""
    return [
        {"name": f"var_{i + 1}", "type": "continuous", "domain": b, "dimensionality": 1}
        for i, b in enumerate(bounds)
    ]
