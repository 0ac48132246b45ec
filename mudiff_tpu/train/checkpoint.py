"""Checkpointing: full training state ("content") + generator-only
inference weights.

Reference artifact kinds (engine/train.py:1107-1140):
  * content.pth — full resume state {epoch, global_step, args, 3x model,
    3x optimizer, 3x scheduler}, every save_content_every epochs.
  * gen_diffusive_{1,2}.pth — generator-only weights for inference,
    every save_ckpt_every epochs, EMA-swapped when EMA is on.

Here both are orbax directory checkpoints of plain pytrees; there is no
DDP "module." prefix to strip and the optimizer/schedule state rides in
the same pytree (reference test.py:209-211 prefix games are gone).

Multi-host discipline (reference rank-0 guards, engine/train.py:469,
624-639, 1085-1140): every process CALLS these functions — the host
gather is a collective (``process_allgather``) and orbax's own
primary-host logic serializes the actual writes + commit barrier — so
none of them may be wrapped in a ``process_index() == 0`` guard by the
caller.  The exp dir must be a filesystem every process can reach
(shared FS on pods; plain /tmp on one host).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding

from mudiff_tpu.train.state import MutualTrainState

PyTree = Any


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def _to_host(tree: PyTree) -> PyTree:
    """Fetch a pytree to host numpy, multi-host-safe.

    ``np.asarray`` raises on arrays whose shards live partly on other
    processes (replicated params on a 2-process mesh, fsdp-sharded opt
    state); those leaves are gathered with ``process_allgather`` — a
    COLLECTIVE, which is why checkpoint saves must be called by every
    process.
    """
    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _norm_path(path) -> Tuple[str, ...]:
    """Normalize a jax key path to plain strings so template paths
    (GetAttrKey for NamedTuple fields, SequenceKey for tuples) align
    with orbax-restored dict paths (DictKey with the field name / the
    stringified index)."""
    out = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            out.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            out.append(k.name)
        elif isinstance(k, jax.tree_util.SequenceKey):
            out.append(str(k.idx))
        elif isinstance(k, jax.tree_util.FlattenedIndexKey):
            out.append(str(k.key))
        else:  # pragma: no cover - future key kinds
            out.append(str(k))
    return tuple(out)


def _restore_like(template: PyTree, saved: PyTree) -> PyTree:
    """Rebuild ``template``'s pytree from an orbax-restored ``saved``
    tree, matching leaves BY KEY PATH, not flattened order.  Order-based
    unflattening only works while every container's field order happens
    to match sorted dict-key order; an optax state whose fields sort
    differently (e.g. a NamedTuple (count, nu, mu)) would silently swap
    same-shaped leaves and corrupt the resumed run."""
    if template is None or saved is None:
        return template
    s_items, _ = jax.tree_util.tree_flatten_with_path(saved)
    s_map = {_norm_path(p): v for p, v in s_items}
    t_items, treedef = jax.tree_util.tree_flatten_with_path(template)
    assert len(t_items) == len(s_map), (
        f"checkpoint structure mismatch: {len(s_map)} saved leaves vs "
        f"{len(t_items)} in template"
    )
    leaves = []
    for p, t in t_items:
        key = _norm_path(p)
        if key not in s_map:
            raise KeyError(
                f"checkpoint has no leaf at {'/'.join(key)}; "
                f"example saved paths: "
                f"{['/'.join(k) for k in sorted(s_map)[:4]]}"
            )
        val = jax.numpy.asarray(s_map[key], dtype=t.dtype).reshape(t.shape)
        # Re-establish the template leaf's mesh layout.  Restored leaves
        # are host-local; on a multi-process mesh a later pjit step would
        # reject them (all operands must be global arrays), and even
        # single-host fsdp layouts are better restored explicitly than
        # re-inferred by the next jit.
        if (
            isinstance(t, jax.Array)
            and isinstance(getattr(t, "sharding", None), NamedSharding)
        ):
            val = jax.device_put(val, t.sharding)
        leaves.append(val)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_content(
    exp_dir: str,
    state: MutualTrainState,
    epoch: int,
    global_step: int,
) -> str:
    """Full training state for resume."""
    path = os.path.join(os.path.abspath(exp_dir), "content")
    payload = {
        "epoch": np.asarray(epoch),
        "global_step": np.asarray(global_step),
        "step": _to_host(state.step),
        "params_g1": _to_host(state.params_g1),
        "params_g2": _to_host(state.params_g2),
        "params_d": _to_host(state.params_d),
        "opt_g1": _to_host(state.opt_g1),
        "opt_g2": _to_host(state.opt_g2),
        "opt_d": _to_host(state.opt_d),
        "ema_g1": _to_host(state.ema_g1) if state.ema_g1 is not None else None,
        "ema_g2": _to_host(state.ema_g2) if state.ema_g2 is not None else None,
        "att_conv": _to_host(state.att_conv),
    }
    ckptr = _ckptr()
    ckptr.save(path, payload, force=True)
    return path


def restore_content(
    exp_dir: str, state: MutualTrainState
) -> Tuple[MutualTrainState, int, int]:
    """Restore a content checkpoint into an existing (template) state."""
    path = os.path.join(os.path.abspath(exp_dir), "content")
    restored = _ckptr().restore(path)
    like = _restore_like

    state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params_g1=like(state.params_g1, restored["params_g1"]),
        params_g2=like(state.params_g2, restored["params_g2"]),
        params_d=like(state.params_d, restored["params_d"]),
        opt_g1=like(state.opt_g1, restored["opt_g1"]),
        opt_g2=like(state.opt_g2, restored["opt_g2"]),
        opt_d=like(state.opt_d, restored["opt_d"]),
        ema_g1=like(state.ema_g1, restored.get("ema_g1")),
        ema_g2=like(state.ema_g2, restored.get("ema_g2")),
        att_conv=like(state.att_conv, restored["att_conv"]),
    )
    return state, int(restored["epoch"]), int(restored["global_step"])


def save_generators(
    exp_dir: str,
    state: MutualTrainState,
    epoch: Optional[int] = None,
    use_ema_weights: bool = True,
) -> Tuple[str, str]:
    """Generator-only inference weights (EMA-swapped when enabled),
    written as gen_diffusive_1/ and gen_diffusive_2/ (+ epoch-tagged
    copies like the reference's gen_diffusive_1_{epoch}.pth)."""
    p1, p2 = state.generator_params(use_ema_weights=use_ema_weights)
    ckptr = _ckptr()
    base = os.path.abspath(exp_dir)
    names = ["gen_diffusive_1", "gen_diffusive_2"]
    paths = []
    for name, params in zip(names, (p1, p2)):
        path = os.path.join(base, name)
        ckptr.save(path, _to_host(params), force=True)
        paths.append(path)
        if epoch is not None:
            ckptr.save(
                os.path.join(base, f"{name}_{epoch}"),
                _to_host(params),
                force=True,
            )
    return tuple(paths)


def load_generator_params(
    ckpt_dir: str,
    name: str,
    template: PyTree,
    fallback_dir: Optional[str] = None,
) -> PyTree:
    """Load generator weights with a fallback directory (reference
    test.py:215-232)."""
    for base in filter(None, [ckpt_dir, fallback_dir]):
        path = os.path.join(os.path.abspath(base), name)
        if os.path.isdir(path):
            return _restore_like(template, _ckptr().restore(path))
    raise FileNotFoundError(
        f"no checkpoint {name} under {ckpt_dir} or {fallback_dir}"
    )
