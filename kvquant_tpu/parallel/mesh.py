"""Device mesh construction.

The reference's only multi-device strategy is a naive layer-split pipeline
(deployment modeling_llama.py:2428-2453, SURVEY.md §2.3). TPU-native
replacement: a 2D (dp, tp) ICI mesh — batch replicated/sharded over ``dp``,
attention heads + MLP hidden sharded over ``tp`` — with XLA inserting the
collectives (one psum per attention/MLP block on the row-sharded output
projections). Multi-host scales the same mesh over DCN by enlarging ``dp``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    tp: int = 1


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. With ``tp=None``, all remaining devices go to
    tensor parallelism."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if tp is None:
        assert n % dp == 0, (n, dp)
        tp = n // dp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
