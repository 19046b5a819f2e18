"""Flat-file checkpointing for parameter/optimizer pytrees.

Semantics mirror the reference single-file checkpoint
(train/trainer.py:186-193): one file holding
{step, best_para, params, opt_state}, saved every save_interval and
auto-resumed if present. Storage is a single .npz with slash-joined
pytree paths — no torch, no pickle of code objects, safe across refactors.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "|"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                keys.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                keys.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                keys.append(str(p.name))
            else:
                keys.append(str(p))
        flat[_SEP.join(keys)] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, step: int, best_para: float, params, opt_state=None):
    blob = {"__step__": np.asarray(step, np.int64),
            "__best_para__": np.asarray(best_para, np.float64)}
    for k, v in _flatten(params).items():
        blob["P" + _SEP + k] = v
    if opt_state is not None:
        for k, v in _flatten(opt_state).items():
            blob["O" + _SEP + k] = v
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Returns (step, best_para, params, opt_state). Templates give structure/dtypes."""
    with np.load(path, allow_pickle=False) as data:
        step = int(data["__step__"])
        best_para = float(data["__best_para__"])
        pflat = {k[2:]: data[k] for k in data.files if k.startswith("P" + _SEP)}
        oflat = {k[2:]: data[k] for k in data.files if k.startswith("O" + _SEP)}

    def rebuild(template, flat):
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for path_keys, leaf in leaves_with_path:
            keys = []
            for p in path_keys:
                if isinstance(p, jax.tree_util.DictKey):
                    keys.append(str(p.key))
                elif isinstance(p, jax.tree_util.SequenceKey):
                    keys.append(str(p.idx))
                elif isinstance(p, jax.tree_util.GetAttrKey):
                    keys.append(str(p.name))
                else:
                    keys.append(str(p))
            k = _SEP.join(keys)
            if k not in flat:
                raise KeyError(f"checkpoint missing leaf {k}")
            arr = flat[k]
            if hasattr(leaf, "dtype"):
                new_leaves.append(jnp.asarray(arr.astype(leaf.dtype)))
            else:
                new_leaves.append(type(leaf)(arr))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = rebuild(params_template, pflat)
    opt_state = rebuild(opt_state_template, oflat) if opt_state_template is not None and oflat else None
    return step, best_para, params, opt_state
