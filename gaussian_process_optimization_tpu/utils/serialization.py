"""Model / BO-state serialization.

Reference behaviors covered (SURVEY §5 'Checkpoint / resume'):
- GPy models serialize to (gzipped) JSON via to_dict/from_dict (GPy core/model.py:60-88,
  core/gp.py:112) and support pickling -> `to_dict`/`from_dict`/`save_model`/`load_model`
  here (pytree dataclasses make this mechanical: leaves + class path + static fields).
- GPyOpt persists report/evaluations/models TSV (bo.py:301-392) -> BO.save_* methods.
- The application layer resumes from (X, Y) history re-loaded from spreadsheets
  (run.py:833-914) -> `save_bo_state`/`load_bo_state` (.npz): BO state is (X, Y) +
  hyperparameters, nothing else.
"""
from __future__ import annotations

import dataclasses
import gzip
import importlib
import json

import jax
import numpy as np


def to_dict(obj):
    """Pytree-dataclass -> JSON-able dict (class path + fields; arrays as lists)."""
    if obj is None:
        return None
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        fields = {}
        for f in dataclasses.fields(obj):
            fields[f.name] = to_dict(getattr(obj, f.name))
        return {
            "__class__": f"{type(obj).__module__}.{type(obj).__qualname__}",
            "fields": fields,
        }
    if isinstance(obj, (list, tuple)):
        return {"__seq__": type(obj).__name__, "items": [to_dict(x) for x in obj]}
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):  # array
        return {
            "__array__": True,
            "dtype": str(np.asarray(obj).dtype),
            "data": np.asarray(obj).tolist(),
        }
    return obj


def from_dict(d):
    if d is None:
        return None
    if isinstance(d, dict) and "__class__" in d:
        mod_name, _, cls_name = d["__class__"].rpartition(".")
        # Security: a checkpoint names classes to instantiate with its own kwargs.
        # Restrict resolution to this package so an untrusted file can't be used
        # as a gadget-instantiation vector (ADVICE round 1).
        _pkg = "gaussian_process_optimization_tpu"
        # exact-or-dotted-prefix: bare startswith admits any module whose name
        # merely begins with the package name (e.g. <pkg>_evil on sys.path)
        if not (mod_name == _pkg or mod_name.startswith(_pkg + ".")):
            raise ValueError(
                f"refusing to instantiate {d['__class__']!r}: only classes under "
                "gaussian_process_optimization_tpu.* may appear in checkpoints"
            )
        mod = importlib.import_module(mod_name)
        cls = mod
        for part in cls_name.split("."):
            cls = getattr(cls, part)
        fields = {k: from_dict(v) for k, v in d["fields"].items()}
        return cls(**fields)
    if isinstance(d, dict) and "__seq__" in d:
        items = [from_dict(x) for x in d["items"]]
        return tuple(items) if d["__seq__"] == "tuple" else items
    if isinstance(d, dict) and d.get("__array__"):
        import jax.numpy as jnp

        return jnp.asarray(np.asarray(d["data"], dtype=d["dtype"]))
    return d


def save_model(model, path, compress=True):
    """JSON(.gz) save, mirroring GPy Model._save_model (core/model.py:60)."""
    payload = json.dumps(to_dict(model)).encode()
    if compress or str(path).endswith(".gz"):
        with gzip.open(path, "wb") as fh:
            fh.write(payload)
    else:
        with open(path, "wb") as fh:
            fh.write(payload)


def load_model(path):
    try:
        with gzip.open(path, "rb") as fh:
            payload = fh.read()
    except (OSError, gzip.BadGzipFile):
        with open(path, "rb") as fh:
            payload = fh.read()
    return from_dict(json.loads(payload.decode()))


def save_bo_state(bo, path):
    """Resumable BO state = (X, Y) history + surrogate hyperparameters
    (the reference's spreadsheet persistence, run.py:749-914)."""
    params = None
    if getattr(bo, "model", None) is not None and getattr(bo.model, "model", None) is not None:
        params = bo.model.get_model_parameters()[0]
    np.savez(
        path,
        X=np.asarray(bo.X),
        Y=np.asarray(bo.Y),
        params=params if params is not None else np.zeros(0),
    )


def load_bo_state(path):
    """Returns (X, Y, params). Re-create the BO object with X=X, Y=Y to resume
    (ask-tell), exactly like the reference's spreadsheet reload."""
    d = np.load(path)
    return d["X"], d["Y"], d["params"]
