"""Flatten/unflatten model parameter pytrees to unconstrained optimizer vectors.

Plays the role of paramz's `optimizer_array` (the unconstrained view the L-BFGS driver
sees, cf. SURVEY call stack 3.4): `pack` applies per-leaf inverse transforms and ravels
free leaves into one vector; `unpack` reconstructs the constrained pytree, reinstating
fixed leaves from the template (GPy "fixes" parameters, e.g. the Gaussian noise under
exact_feval, GPyOpt/GPyOpt/models/gpmodel.py:72-76).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .transforms import IDENTITY, Transform


class Packer:
    """Bidirectional map: constrained parameter pytree <-> flat unconstrained vector.

    transforms: pytree matching `template` (prefix trees allowed via broadcast), each
        leaf a Transform or None (identity).
    fixed: pytree of bools (leaf granularity); fixed leaves are excluded from the vector.
    """

    def __init__(self, template: Any, transforms: Any = None, fixed: Any = None):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        self._treedef = treedef
        self._template_leaves = [jnp.asarray(l) for l in leaves]
        self._shapes = [l.shape for l in self._template_leaves]
        self._sizes = [int(l.size) for l in self._template_leaves]
        self._dtype = jnp.result_type(*self._template_leaves) if leaves else jnp.float32

        def _broadcast(spec, default):
            if spec is None:
                return [default] * len(leaves)
            # None IS a valid per-leaf value (identity) — is_leaf must admit it
            # or tree_leaves silently drops the node and the count check
            # rejects the documented 'Transform or None' usage
            spec_leaves = jax.tree_util.tree_leaves(
                spec, is_leaf=lambda x: x is None or isinstance(x, Transform)
            )
            if len(spec_leaves) == len(leaves):
                return [default if l is None else l for l in spec_leaves]
            raise ValueError(
                f"spec has {len(spec_leaves)} leaves, template has {len(leaves)}"
            )

        self._transforms = _broadcast(transforms, IDENTITY)
        if fixed is None:
            self._fixed = [False] * len(leaves)
        else:
            fixed_leaves = jax.tree_util.tree_leaves(
                fixed, is_leaf=lambda x: x is None or isinstance(x, bool)
            )
            if len(fixed_leaves) != len(leaves):
                # zip would silently TRUNCATE the packed vector otherwise,
                # quietly excluding parameters from optimization
                raise ValueError(
                    f"fixed spec has {len(fixed_leaves)} leaves, template has "
                    f"{len(leaves)}")
            self._fixed = [bool(f) for f in fixed_leaves]
        self.num_free = sum(s for s, f in zip(self._sizes, self._fixed) if not f)

    @property
    def transforms(self):
        """Per-leaf transforms, in template tree_leaves order."""
        return tuple(self._transforms)

    @property
    def fixed(self):
        """Per-leaf fixed flags, in template tree_leaves order."""
        return tuple(self._fixed)

    def pack(self, params: Any) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(params)
        if len(leaves) != len(self._transforms):
            # zip would silently truncate — quietly excluding parameters from
            # optimization (same hazard the fixed-spec constructor guards)
            raise ValueError(
                f"params has {len(leaves)} leaves, packer template has "
                f"{len(self._transforms)} — structure mismatch")
        parts = []
        for leaf, t, fx in zip(leaves, self._transforms, self._fixed):
            if fx:
                continue
            parts.append(jnp.ravel(t.inverse(jnp.asarray(leaf))))
        if not parts:
            return jnp.zeros((0,), dtype=self._dtype)
        return jnp.concatenate(parts)

    def unpack(self, u: jnp.ndarray, reference: Any = None) -> Any:
        """Reconstruct the constrained pytree from `u`.

        Fixed leaves are taken from `reference` (same structure) when given, else from
        the template captured at construction. Passing the live model as `reference`
        inside a jitted function keeps data leaves (X, Y, ...) traced instead of baked
        in as constants.
        """
        if reference is None:
            ref_leaves = self._template_leaves
        else:
            ref_leaves = jax.tree_util.tree_leaves(reference)
        out = []
        idx = 0
        for ref, shape, size, t, fx in zip(
            ref_leaves, self._shapes, self._sizes, self._transforms, self._fixed
        ):
            if fx:
                out.append(ref)
            else:
                seg = jax.lax.dynamic_slice_in_dim(u, idx, size, axis=0)
                out.append(t.forward(seg.reshape(shape).astype(jnp.asarray(ref).dtype)))
                idx += size
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def map_restart(self, z: jnp.ndarray) -> jnp.ndarray:
        """Map a flat standard-normal vector to unconstrained restart coordinates,
        routing each free leaf through its transform's `random_restart` (so
        bounded parameters restart at sane constrained magnitudes instead of
        mid-range — see Transform.random_restart)."""
        parts = []
        idx = 0
        for shape, size, t, fx in zip(
            self._shapes, self._sizes, self._transforms, self._fixed
        ):
            if fx:
                continue
            seg = jax.lax.dynamic_slice_in_dim(z, idx, size, axis=0)
            parts.append(jnp.ravel(t.random_restart(seg.reshape(shape))))
            idx += size
        if not parts:
            return jnp.zeros((0,), dtype=self._dtype)
        return jnp.concatenate(parts)

    def map_constrained(self, fn: Callable, params: Any) -> list:
        """Apply fn(leaf_value, is_fixed) over constrained leaves (for priors)."""
        leaves = jax.tree_util.tree_leaves(params)
        return [fn(l, fx) for l, fx in zip(leaves, self._fixed)]
