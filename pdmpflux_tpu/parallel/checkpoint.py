"""Checkpoint / resume for long pod-scale runs.

The reference's only persistence is keeping the final state on the sampler
object (``sample.jl:281``); SURVEY.md §5 calls for real checkpointing since
pod runs need preemption tolerance.  ``PDMPState`` and ``Skeleton`` are pure
pytrees of arrays, so a checkpoint is a flat ``.npz`` plus a tiny manifest.
Determinism comes from the counter-based PRNG keys stored in the state:
resuming reproduces exactly the run that would have happened.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from ..core.types import PDMPState, Skeleton


def _flatten(prefix: str, tree) -> dict:
    out = {}
    for name in tree._fields:
        val = getattr(tree, name)
        if name == "key":
            # typed PRNG keys serialize via their raw uint32 data
            val = jax.random.key_data(val)
        out[f"{prefix}.{name}"] = np.asarray(val)
    return out


def save_checkpoint(path: str, state: PDMPState,
                    skeleton: Optional[Skeleton] = None,
                    meta: Optional[dict] = None) -> None:
    """Atomically write state (+ optional partial skeleton) to ``path``."""
    arrays = _flatten("state", jax.device_get(state))
    if skeleton is not None:
        arrays.update(_flatten("skel", jax.device_get(skeleton)))
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns ``(state, skeleton_or_None, meta)``."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        fields = {f: z[f"state.{f}"] for f in PDMPState._fields}
        fields["key"] = jax.random.wrap_key_data(jax.numpy.asarray(fields["key"]))
        state = PDMPState(**fields)
        skel = None
        if any(k.startswith("skel.") for k in z.files):
            skel = Skeleton(*[z[f"skel.{f}"] for f in Skeleton._fields])
    return state, skel, meta
