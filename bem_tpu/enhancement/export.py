"""Serving-artifact export: serialize the compiled inference pipeline.

Production deployment path the reference lacks (its serving is a python
loop over torch modules, Enhancement/eval.py): `jax.export` captures the
jitted pipeline as a versioned StableHLO artifact that a serving binary
can load and run WITHOUT the model-building python code — weights are
baked as constants (or left as arguments when passed through example
args). Artifacts are portable across hosts and, with ``platforms=
("tpu",)``, can be produced on a CPU-only build machine for TPU serving.

Usage:
    from bem_tpu.enhancement.export import export_pipeline, load_pipeline
    export_pipeline(fn, example_args, "/path/pipe.jaxexport")
    g = load_pipeline("/path/pipe.jaxexport")   # callable, jit-compatible
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
from jax import export as _export


def export_pipeline(
    fn: Callable,
    example_args: Sequence,
    path: str,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Serialize ``jit(fn)(*example_args)`` to ``path``.

    platforms: lowering targets (e.g. ("tpu",)); defaults to the current
    backend. The artifact records input shapes/dtypes and fails loudly on
    mismatch at call time.
    """
    exp = _export.export(jax.jit(fn), platforms=platforms)(*example_args)
    blob = exp.serialize()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_pipeline(path: str) -> Callable:
    """Deserialize an exported pipeline; returns a callable usable under
    jit (the artifact's own platforms/shape checks apply)."""
    with open(path, "rb") as f:
        blob = f.read()
    exp = _export.deserialize(bytearray(blob))
    return exp.call
